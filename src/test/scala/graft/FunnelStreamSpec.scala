package graft

import org.apache.spark.sql.functions._

import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.{FunnelOut, StepEvent}

/** Cross-batch parity of the streaming windowFunnel twin with the
  * batch operator under OUT-OF-ORDER delivery — including a LATE
  * earlier step-2 event that must retroactively improve t2 and
  * re-chain t3 before the freeze, which a naive forward-only fold
  * would get wrong. */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private val WindowUs = 10L * 60 * 1000000 // 10 minutes
  private val Steps = Seq("view", "click", "purchase")

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

  // (user, minute, step)
  private val rows: Seq[(Long, Long, String)] = Seq(
    // full funnel
    (1L, 10, "view"), (1L, 15, "click"), (1L, 18, "purchase"),
    // click outside the window -> stage 1
    (2L, 10, "view"), (2L, 40, "click"),
    // no first step -> absent from both outputs
    (3L, 10, "click"), (3L, 12, "purchase"),
    // the late-improvement case: click@14 arrives in a LATER batch
    // than click@16; purchase@21 chains from 14 (within 10 min of
    // either, but t2 must settle to the MIN = 14)
    (4L, 10, "view"), (4L, 16, "click"), (4L, 14, "click"),
    (4L, 21, "purchase"),
    // skipping a step does not chain
    (5L, 10, "view"), (5L, 12, "purchase"),
    // t1 is the min of several first-step events
    (6L, 20, "view"), (6L, 11, "view"), (6L, 13, "click"))

  private val sentinel = (999L, 600L, "view")

  test("windowFunnelStream matches Funnels.windowFunnel cross-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[StepEvent]
    val q = FunnelStream.windowFunnelStream(ms.toDS(),
        watermark = "30 minutes", Steps, WindowUs)
      .writeStream.format("memory").queryName("funnelstream")
      .outputMode("append").start()
    try {
      val ev = rows.map { case (u, m, s) => StepEvent(u, ts(m), s) }
      val late = ev.find(e => e.user == 4L &&
        e.ts.getTime == ts(14).getTime).get
      // batch 1: everything through minute 16 (incl. user-4 click@16)
      // except the user-4 click@14, which arrives a batch later
      val b1 = ev.filter(e => e.ts.getTime <= ts(16).getTime && e != late)
      // batch 2: the rest + the LATE click@14 (within the 30-min
      // watermark horizon of the max seen so far)
      val b2 = ev.filterNot(b1.contains).filterNot(_ == late) :+ late
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
      // sentinel advances the watermark far past every freeze point
      ms.addData(StepEvent(sentinel._1, ts(sentinel._2), sentinel._3))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("funnelstream").as[FunnelOut].collect()
      .map(o => (o.user, o.times, o.stage)).toSet
    val batch = graft.operators.Funnels.windowFunnel(
        rows.toDF("user", "min", "etype")
          .withColumn("ts_us", col("min") * 60000000L),
        "user", "ts_us", "etype", Steps, WindowUs)
      .select(col("user"), array(col("t1"), col("t2"), col("t3")),
        col("stage"))
      .as[(Long, Seq[Long], Long)].collect().toSet
    assert(got == batch, s"stream $got vs batch $batch")
    assert(!got.exists(_._1 == sentinel._1)) // sentinel never froze
    assert(got.exists(_._1 == 1L) && !got.exists(_._1 == 3L))
    // the late click settled t2 to the minute-14 minimum
    val u4 = got.find(_._1 == 4L).get
    assert(u4._2 == Seq(ts(10).getTime * 1000, ts(14).getTime * 1000,
      ts(21).getTime * 1000) && u4._3 == 3L)
  }

  test("late step-1 event below current t1 re-chains a kept later-step " +
    "event (pend must survive ts <= t1 while above the watermark)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[StepEvent]
    val q = FunnelStream.windowFunnelStream(ms.toDS(),
        watermark = "60 minutes", Steps, WindowUs)
      .writeStream.format("memory").queryName("funnelstream_late1")
      .outputMode("append").start()
    try {
      // batch 1: view@100, click@50 — click precedes the only t1 seen
      // so far, but sits ABOVE the watermark (wm = 100 − 60 = 40 after
      // this batch), so a later, earlier view can still chain it
      ms.addData(StepEvent(7L, ts(100), "view"),
        StepEvent(7L, ts(50), "click"))
      q.processAllAvailable()
      // batch 2: view@45 (≥ wm=40 ⇒ admitted) lowers t1 to 45; the
      // kept click@50 now chains (gap 5 min ≤ 10-min window)
      ms.addData(StepEvent(7L, ts(45), "view"))
      q.processAllAvailable()
      ms.addData(StepEvent(sentinel._1, ts(sentinel._2), sentinel._3))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("funnelstream_late1").as[FunnelOut].collect()
      .map(o => (o.user, o.times, o.stage)).toSet
    val batch = graft.operators.Funnels.windowFunnel(
        Seq((7L, 100L, "view"), (7L, 50L, "click"), (7L, 45L, "view"))
          .toDF("user", "min", "etype")
          .withColumn("ts_us", col("min") * 60000000L),
        "user", "ts_us", "etype", Steps, WindowUs)
      .select(col("user"), array(col("t1"), col("t2"), col("t3")),
        col("stage"))
      .as[(Long, Seq[Long], Long)].collect().toSet
    assert(got.filterNot(_._1 == sentinel._1) == batch,
      s"stream $got vs batch $batch")
    val u7 = got.find(_._1 == 7L).get
    assert(u7._3 == 2L &&
      u7._2.take(2) == Seq(ts(45).getTime * 1000, ts(50).getTime * 1000))
  }
}
