package graft

import org.apache.spark.sql.functions._

import graft.operators.Eval
import graft.streaming.ConformalStream

/** Streaming conformal calibration: summed per-batch tallies must make
  * the streamed thresholds bitwise equal to the batch operator over
  * the union, with the guarantee intact as the set grows. */
class ConformalStreamSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(37)
  private val rows = (1 to 900).map(_ =>
    (s"m${rnd.nextInt(3)}", rnd.nextInt(5000).toLong))

  private def df(rs: Seq[(String, Long)]) = rs.toDF("g", "s")

  private def collect(d: org.apache.spark.sql.DataFrame) =
    d.as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("streamed thresholds are bitwise the batch conformal") {
    val dir = java.nio.file.Files
      .createTempDirectory("confstream").toString
    // uneven batches, duplicate scores across batches
    val batches = Seq(rows.take(13), rows.slice(13, 500), rows.drop(500))
    batches.zipWithIndex.foreach { case (b, i) =>
      ConformalStream.commitBatch(df(b), dir, i.toLong, "g", "s")
    }
    for (alpha <- Seq(500L, 1000L, 2500L)) {
      val got = collect(
        ConformalStream.thresholds(spark, dir, "g", alpha))
      val want = collect(Eval.conformal(df(rows), "g", "s", alpha))
      assert(got == want, s"alpha $alpha")
    }
    // the threshold tightens as calibration grows: prefix state
    val dir2 = java.nio.file.Files
      .createTempDirectory("confprefix").toString
    ConformalStream.commitBatch(df(rows.take(13)), dir2, 0L, "g", "s")
    val early = collect(ConformalStream.thresholds(spark, dir2, "g"))
    val late = collect(ConformalStream.thresholds(spark, dir, "g"))
    assert(early.map(_._2).sum < late.map(_._2).sum) // n grew
  }

  test("replayed batches are no-ops") {
    val dir = java.nio.file.Files
      .createTempDirectory("confreplay").toString
    ConformalStream.commitBatch(df(rows.take(400)), dir, 0L, "g", "s")
    ConformalStream.commitBatch(df(rows.drop(400)), dir, 1L, "g", "s")
    val before = collect(ConformalStream.thresholds(spark, dir, "g"))
    ConformalStream.commitBatch(df(rows.drop(400)), dir, 1L, "g", "s")
    assert(collect(ConformalStream.thresholds(spark, dir, "g"))
      == before)
  }

  test("run() drives the state from a real stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("confrun").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("confckpt").toString
    val ms = MemoryStream[ConformalStreamSpec.Cal]
    val q = ConformalStream.run(ms.toDS().toDF("g", "s"), dir, "g",
      "s", ckpt)
    try {
      ms.addData(rows.take(450).map(r =>
        ConformalStreamSpec.Cal(r._1, r._2)): _*)
      q.processAllAvailable()
      ms.addData(rows.drop(450).map(r =>
        ConformalStreamSpec.Cal(r._1, r._2)): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(collect(ConformalStream.thresholds(spark, dir, "g"))
      == collect(Eval.conformal(df(rows), "g", "s")))
  }
}

object ConformalStreamSpec {
  case class Cal(g: String, s: Long)
}
