package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches

/** Misra-Gries mergeable heavy-hitter sketch: the PODS'12 guarantees
  * must hold under ANY partitioning/merge order, and the summary must
  * be exact when it never overflows. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // skewed corpus: item "h0" ~ 36%, "h1" ~ 18%, "h2" ~ 12%, tail of 60
  // distinct light items sharing the rest
  private def skewed(n: Int): Seq[String] =
    (0 until n).map { i =>
      val r = i % 100
      if (r < 36) "h0" else if (r < 54) "h1" else if (r < 66) "h2"
      else s"t${i % 60}"
    }

  test("true heavy hitters survive with bounded undercount, any layout") {
    val data = skewed(5000)
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = data.size.toLong
    val k = 20
    for (parts <- Seq(1, 4, 13)) {
      val out = Sketches.approxHeavyHitters(
        data.map(("all", _)).toDF("g", "item").repartition(parts),
        "g", "item", k)
        .select("item", "estimate").as[(String, Long)].collect().toMap
      assert(out.size <= k)
      // coverage: every item with freq > n/(k+1) is present
      truth.filter(_._2 > n / (k + 1)).keys.foreach { h =>
        assert(out.contains(h), s"heavy item $h missing at parts=$parts")
      }
      out.foreach { case (item, est) =>
        val t = truth(item)
        assert(est <= t, s"$item overcounted: $est > $t")
        assert(t - est <= n / (k + 1),
          s"$item undercount ${t - est} exceeds n/(k+1)=${n / (k + 1)}")
      }
    }
  }

  test("summary is exact when distinct items never exceed k") {
    val data = Seq("a", "a", "a", "b", "b", "c")
    val out = Sketches.approxHeavyHitters(
      data.map(("g", _)).toDF("g", "item").repartition(3), "g", "item",
      k = 10)
      .select("item", "estimate").as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("per-group summaries are independent") {
    val data = Seq(("x", "p"), ("x", "p"), ("x", "q"), ("y", "r"))
    val out = Sketches.approxHeavyHitters(
      data.toDF("g", "item"), "g", "item", k = 5)
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("x", "p", 2L), ("x", "q", 1L), ("y", "r", 1L)))
  }

  test("streaming trendingTopK: per-window sketches, append on close") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int, sec: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")
    val ms = MemoryStream[(java.sql.Timestamp, String)]
    val q = graft.streaming.EventsStream.trendingTopK(
      ms.toDF().toDF("ts", "item"), "item",
      duration = "1 minute", watermark = "0 seconds", k = 10)
      .writeStream.format("memory").queryName("trending")
      .outputMode("append").start()
    try {
      // window 10:00: a×3, b×1; window 10:01: c×2
      ms.addData((ts(0, 1), "a"), (ts(0, 2), "a"), (ts(0, 10), "b"),
        (ts(0, 30), "a"), (ts(1, 5), "c"), (ts(1, 6), "c"))
      q.processAllAvailable()
      // advance the watermark past both windows so they close
      ms.addData((ts(5), "z"))
      q.processAllAvailable()
      val rows = spark.table("trending")
        .as[(java.sql.Timestamp, String, Long)].collect()
        .map(t => (t._1.toString.substring(11, 16), t._2, t._3)).toSet
      // below capacity → summaries are exact per window
      assert(rows == Set(("10:00", "a", 3L), ("10:00", "b", 1L),
        ("10:01", "c", 2L)))
    } finally q.stop()
  }

  test("ewmaStream closes days in order and matches the batch fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventsStream
    implicit val sqlCtx = spark.sqlContext
    def ts(day: Int, hour: Int) = new java.sql.Timestamp(
      day * 86400000L + hour * 3600000L)
    val ms = MemoryStream[EventsStream.EwmaEvent]
    // a REAL watermark delay (1 day): several days stay open in the
    // pending map at once, and a cross-day late event within the
    // horizon must still land in its (not-yet-closed) day
    val q = EventsStream.ewmaStream(ms.toDS(), watermark = "1 day")
      .writeStream.format("memory").queryName("ewmastream")
      .outputMode("append").start()
    try {
      ms.addData(EventsStream.EwmaEvent("a", ts(0, 5)),
        EventsStream.EwmaEvent("a", ts(0, 2)))
      q.processAllAvailable()
      ms.addData(EventsStream.EwmaEvent("a", ts(2, 3)),
        EventsStream.EwmaEvent("b", ts(2, 9)),
        EventsStream.EwmaEvent("a", ts(2, 4)))
      q.processAllAvailable() // wm ≈ day1+: days 0..2 of "a" all open
      // LATE event for day 1, behind the max seen time (day2+9h) but
      // NOT behind the watermark (day1+9h after batch 2 — Spark drops
      // input strictly older than the watermark before stateful ops):
      // must still join day 1's count
      ms.addData(EventsStream.EwmaEvent("a", ts(1, 10)),
        EventsStream.EwmaEvent("a", ts(2, 5)))
      q.processAllAvailable()
      // sentinel far in the future closes everything
      ms.addData(EventsStream.EwmaEvent("a", ts(10, 0)),
        EventsStream.EwmaEvent("b", ts(10, 0)))
      q.processAllAvailable()
      val got = spark.table("ewmastream")
        .as[EventsStream.EwmaOut].collect()
        .map(o => (o.group, o.day, o.n, o.ewma_scaled)).toSet
      // batch twin on the same rows (sentinel day 10 stays open inside
      // the 1-day horizon, so it is absent from the stream output)
      val batch = graft.operators.Rolling.ewmaDaily(
        Seq(("a", ts(0, 5)), ("a", ts(0, 2)), ("a", ts(2, 3)),
          ("b", ts(2, 9)), ("a", ts(2, 4)), ("a", ts(1, 10)),
          ("a", ts(2, 5))).toDF("g", "ts"), "g", "ts")
        .select(col("g"),
          datediff(col("date"), lit("1970-01-01")).cast("long"),
          col("n"), col("ewma_scaled"))
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got == batch)
      assert(got.map(_._2).max == 2L) // open sentinel day never emitted
      assert(got.contains(("a", 1L, 1L, // the late event made day 1
        got.collectFirst { case ("a", 1L, 1L, e) => e }.get)))
    } finally q.stop()
  }

  test("mgMerge shrink keeps at most k counters and subtracts the cut") {
    val a = Map("a" -> 10L, "b" -> 7L, "c" -> 3L)
    val b = Map("d" -> 5L, "e" -> 2L)
    val m = Sketches.mgMerge(a, b, k = 3)
    assert(m.size <= 3)
    // cut = 4th largest of (10,7,5,3,2) = 3 → a:7, b:4, d:2 survive
    assert(m == Map("a" -> 7L, "b" -> 4L, "d" -> 2L))
  }

  test("bottom-k is the exact k smallest distinct longs, any layout") {
    // duplicates by construction: 3000 draws over 997 residues
    val data: Seq[Long] = (0 until 3000).map(i => (i * 2654435761L) % 997L)
    val truth = data.distinct.sorted.take(64)
    for (parts <- Seq(1, 4, 13)) {
      val out = data.toDF("v").repartition(parts)
        .agg(Sketches.bottomK(col("v"), 64)).head.getSeq[Long](0)
      assert(out == truth, s"bottom-k diverged at parts=$parts")
    }
  }

  test("bottom-k ignores nulls and returns under-full sets as-is") {
    val out = Seq[Option[Long]](Some(5L), None, Some(3L), Some(5L), None)
      .toDF("v").agg(Sketches.bottomK(col("v"), 10))
      .head.getSeq[Long](0)
    assert(out == Seq(3L, 5L))
  }

  test("count-min: bit-parity with sequential build, any layout; " +
      "estimates never undercount") {
    val depth = 4; val width = 64
    // zipf-ish stream with nulls mixed in
    val items: Seq[String] = (1 to 400).map(i =>
      s"k${i % (i % 7 + 1)}") ++ Seq("rare1", "rare2")
    val withNulls: Seq[Option[String]] =
      items.map(Option(_)).patch(13, Seq(None, None), 0)

    // sequential plain-Scala build — merge-order independence means
    // ANY partitioning must reproduce it bit-for-bit
    val expected = new Array[Long](depth * width)
    items.foreach { a =>
      (0 until depth).foreach { r =>
        expected(r * width + Sketches.cmHash(r, a, width)) += 1L
      }
    }
    for (parts <- Seq(1, 7)) {
      val got = withNulls.toDF("v").repartition(parts)
        .agg(Sketches.countMin(col("v"), depth, width))
        .head.getSeq[Long](0)
      assert(got == expected.toSeq, s"layout $parts diverged")
    }
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong)
    truth.foreach { case (item, n) =>
      val est = Sketches.cmEstimate(expected.toSeq, depth, width, item)
      assert(est >= n, s"undercount for $item")
      assert(est <= n + (math.E / width * items.size).ceil.toLong + 1,
        s"excess beyond the eps*n bound for $item")
    }
    // absent key: bounded overestimate of zero
    assert(Sketches.cmEstimate(expected.toSeq, depth, width, "absent")
      <= (math.E / width * items.size).ceil.toLong)
  }

  test("KLL: exact under capacity, rank bound holds on any layout") {
    // exact while n < k: every quantile is the true order statistic
    val small = (1L to 100L).toSeq
    val exact = small.toDF("v")
      .agg(Sketches.kllSketch(col("v"), k = 256))
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.map(_._1).sorted == small)
    assert(exact.forall(_._2 == 1L))
    assert(Sketches.kllQuantile(exact, 5000) == 50L)
    assert(Sketches.kllQuantile(exact, 0) == 1L)
    assert(Sketches.kllQuantile(exact, 10000) == 100L)

    // big skewed corpus: rank error within the published bound under
    // every partition layout
    val rnd = new scala.util.Random(41)
    val n = 60000
    val data = (1 to n).map(_ => math.abs(rnd.nextGaussian() * 10000)
      .toLong + (if (rnd.nextInt(10) == 0) 500000L else 0L))
    val sortedData = data.sorted
    val k = 200
    val bound = Sketches.kllRankErrorBound(n.toLong, k)
    for (parts <- Seq(1, 8, 32)) {
      val sk = data.toDF("v").repartition(parts)
        .agg(Sketches.kllSketch(col("v"), k))
        .head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(sk.map(_._2).sum == n.toLong, "weights must cover n")
      for (qBp <- Seq(100L, 2500L, 5000L, 7500L, 9900L)) {
        val est = Sketches.kllQuantile(sk, qBp)
        // true rank band of the estimate vs the queried rank
        val target = math.max(1L, (qBp * n + 9999L) / 10000L)
        val lo = sortedData.indexWhere(_ >= est) + 1
        val hi = sortedData.lastIndexWhere(_ <= est) + 1
        val err = if (target < lo) lo - target
          else if (target > hi) target - hi else 0L
        assert(err <= bound,
          s"layout $parts q$qBp: rank error $err > bound $bound")
      }
    }
  }
}
