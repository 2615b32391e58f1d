package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.core.{Committer, StaleWriteException}

/** Cross-process probe for the generation-CAS kernel: a bare JVM (no
  * SparkSession) that races other processes on one table directory
  * through [[Committer.commitGen]]. Each probe loops read-gen →
  * claim-gen+1 until it lands `perWriter` commits, printing one
  * `WIN <gen>` line per won generation and one `STALE` line per lost
  * round. CasCommitSpec forks two of these as REAL separate JVMs —
  * the create-if-absent marker file is the only thing excluding them
  * (the in-JVM KeyedLocks mutex cannot reach across processes), which
  * is exactly the two-drivers-on-two-machines scenario the CAS exists
  * for. Args: <dstPath> <perWriter> <goFile>. The probe spins until
  * `goFile` exists so the spec can line both processes up on the same
  * start barrier and force real contention. */
object CasProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: CasProbe <dst> <perWriter> <goFile>")
    val dst = new Path(args(0))
    val perWriter = args(1).toInt
    val go = new java.io.File(args(2))
    val fs = dst.getFileSystem(new Configuration())
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (!go.exists()) {
      if (System.nanoTime() > deadline) sys.error("go barrier never rose")
      Thread.sleep(2)
    }
    var committed = 0
    while (committed < perWriter) {
      if (System.nanoTime() > deadline) sys.error("probe timed out")
      val g = Committer.currentGen(fs, dst)
      try {
        Committer.commitGen(fs, dst, g)
        println(s"WIN ${g + 1}")
        committed += 1
      } catch {
        case _: StaleWriteException => println("STALE")
      }
    }
  }
}
