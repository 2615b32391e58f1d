package graft

import org.apache.spark.sql.functions._

import graft.operators.Eval
import graft.streaming.BootstrapStream

/** Streaming Poisson bootstrap: additive partials must make the
  * streamed CI bitwise equal to the batch operator over the union,
  * under any batching, with replayed batches as no-ops. */
class BootstrapStreamSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(23)
  private val rows = (1 to 600).map(i =>
    (s"g${i % 3}", i.toLong, rnd.nextInt(2000).toLong - 500))

  private def df(rs: Seq[(String, Long, Long)]) = rs.toDF("g", "id", "x")

  test("multi-batch commits assemble the exact batch CI") {
    val dir = java.nio.file.Files
      .createTempDirectory("bootstream").toString
    // adversarial batching: uneven sizes, groups interleaved
    val batches = Seq(rows.take(7), rows.slice(7, 350), rows.drop(350))
    batches.zipWithIndex.foreach { case (b, i) =>
      BootstrapStream.commitBatch(df(b), dir, i.toLong, "g", "id", "x")
    }
    val got = BootstrapStream.ci(spark, dir, "g")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val want = Eval.poissonBootstrap(df(rows), "g", "id", col("x"))
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("a replayed micro-batch is a no-op") {
    val dir = java.nio.file.Files
      .createTempDirectory("bootreplay").toString
    BootstrapStream.commitBatch(df(rows.take(100)), dir, 0L, "g", "id", "x")
    BootstrapStream.commitBatch(df(rows.drop(100)), dir, 1L, "g", "id", "x")
    val before = BootstrapStream.ci(spark, dir, "g")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    BootstrapStream.commitBatch(df(rows.drop(100)), dir, 1L, "g", "id", "x")
    val after = BootstrapStream.ci(spark, dir, "g")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(before.toSeq == after.toSeq)
  }

  test("run() drives the state from a real stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("bootrun").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("bootckpt").toString
    val ms = MemoryStream[BootstrapStreamSpec.Obs]
    val q = BootstrapStream.run(ms.toDS().toDF("g", "id", "x"), dir,
      "g", "id", "x", ckpt)
    try {
      ms.addData(rows.take(200).map((BootstrapStreamSpec.Obs.apply _)
        .tupled): _*)
      q.processAllAvailable()
      ms.addData(rows.drop(200).map((BootstrapStreamSpec.Obs.apply _)
        .tupled): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = BootstrapStream.ci(spark, dir, "g")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val want = Eval.poissonBootstrap(df(rows), "g", "id", col("x"))
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }
}

object BootstrapStreamSpec {
  case class Obs(g: String, id: Long, x: Long)
}
