package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.CorpusSim
import graft.streaming.SketchStream

/** Streaming windowed bottom-k corpus sketches: the closed-window
  * sketch must EQUAL the batch sketch of the same rows regardless of
  * batch boundaries or arrival order, and consecutive-window drift
  * must fall out of pairJaccard on the collected rows. */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")

  test("closed-window sketches are bit-equal to the batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, String, java.sql.Timestamp)]
    val q = SketchStream.windowedSketches(
        ms.toDF.toDF("doc_id", "text", "src", "ts"),
        "src", "text", "ts", "1 hour", "0 seconds", n = 2, k = 16)
      .writeStream.format("memory").queryName("sketchwin")
      .outputMode("complete").start()
    try {
      // window 0: two sources; window 1: src A drifts (half-new text)
      val w0 = Seq(
        (1L, "alpha beta gamma delta epsilon zeta", "A", ts(0)),
        (2L, "alpha beta gamma delta eta theta", "B", ts(0)))
      val w1 = Seq(
        (3L, "alpha beta gamma NEW words appear here", "A", ts(1)))
      ms.addData(w0)
      q.processAllAvailable()
      // second batch arrives separately — state must merge, not rebuild
      ms.addData(w1)
      q.processAllAvailable()
      val got = spark.table("sketchwin")
        .select(col("window_start").cast("string"), col("src"),
          col("sketch"))
        .as[(String, String, Seq[Long])].collect()
        .map(t => (t._1, t._2) -> t._3).toMap

      // batch truth per (window, src) on the same rows
      val all = (w0 ++ w1).toDF("doc_id", "text", "src", "ts")
        .withColumn("w", window(col("ts"), "1 hour")
          .getField("start").cast("string"))
      val truth = all.select(col("w"), col("src"), col("text"))
        .collect().groupBy(r => (r.getString(0), r.getString(1)))
        .map { case (key, rows) =>
          val df = rows.map(r => (0L, r.getString(2))).toSeq
            .toDF("doc_id", "text")
          key -> CorpusSim.bottomKSketches(
              df.withColumn("g", lit("x")), "g", "text", n = 2, k = 16)
            .head.getSeq[Long](1)
        }
      assert(got.keySet == truth.keySet)
      truth.foreach { case (key, sk) =>
        assert(got(key) == sk, s"sketch mismatch at $key")
      }

      // drift: A's window-0 vs window-1 sketches overlap partially
      val a0 = got.find(k => k._1._2 == "A" && k._1._1.contains("00:00"))
        .get._2.toSet
      val a1 = got.find(k => k._1._2 == "A" && k._1._1.contains("01:00"))
        .get._2.toSet
      val (size, both, bp) = CorpusSim.pairJaccard(a0, a1, 16)
      assert(size > 0 && both > 0 && both < size,
        s"expected partial drift, got size=$size both=$both bp=$bp")
    } finally q.stop()
  }

  test("streaming digests equal the batch contentDigest across batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long, String)]
    val q = graft.streaming.DigestStream.digests(
        ms.toDF.toDF("g", "id", "v"), "g", Seq("id", "v"))
      .writeStream.format("memory").queryName("digeststream")
      .outputMode("complete").start()
    try {
      val b1 = Seq(("g", 1L, "x"), ("h", 3L, "z"))
      val b2 = Seq(("g", 2L, "y"))
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      val got = spark.table("digeststream")
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val truth = graft.operators.Profile.contentDigest(
          (b1 ++ b2).toDF("g", "id", "v"), "g", Seq("id", "v"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === truth)
    } finally q.stop()
  }
}
