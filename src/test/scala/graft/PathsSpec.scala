package graft

import graft.streaming.Paths

class PathsSpec extends SparkSpec {
  import spark.implicits._

  test("topTrigrams counts in-session trigrams exactly, never across sessions") {
    val M = 60L * 1000000 // one minute in us
    // user A, session 1: view,view,cart,buy -> trigrams (view,view,cart),
    // (view,cart,buy); then a 2h gap; session 2: view,view,cart ->
    // (view,view,cart). user B: view,cart,buy -> (view,cart,buy).
    val events = Seq(
      ("a", 1L, 0 * M, "view"), ("a", 2L, 1 * M, "view"),
      ("a", 3L, 2 * M, "cart"), ("a", 4L, 3 * M, "buy"),
      ("a", 5L, 200 * M, "view"), ("a", 6L, 201 * M, "view"),
      ("a", 7L, 202 * M, "cart"),
      ("b", 8L, 0 * M, "view"), ("b", 9L, 5 * M, "cart"),
      ("b", 10L, 9 * M, "buy")
    ).toDF("user_id", "event_id", "ts_us", "event_type")
    val out = Paths.topTrigrams(events, "user_id", "ts_us", "event_id",
        "event_type", gapSeconds = 1800, k = 10)
      .as[(String, String, String, Long)].collect()
    val counts = out.map(t => (t._1, t._2, t._3) -> t._4).toMap
    assert(counts == Map(
      ("view", "view", "cart") -> 2L,
      ("view", "cart", "buy") -> 2L))
    // the cross-gap trigram (buy, view, view) must NOT exist: session
    // boundaries cut paths
    assert(!counts.contains(("buy", "view", "view")))
    // k cuts deterministically: k=1 keeps the lexicographically first
    // of the tied-top grams
    val top1 = Paths.topTrigrams(events, "user_id", "ts_us", "event_id",
        "event_type", gapSeconds = 1800, k = 1)
      .as[(String, String, String, Long)].collect()
    assert(top1.toSeq == Seq(("view", "cart", "buy", 2L)))
  }

  test("windowFunnel: first-match steps, window bound, stall stages") {
    val M = 60L * 1000000
    val W = 30 * M
    val events = Seq(
      // a: full funnel within windows
      ("a", 0 * M, "view"), ("a", 10 * M, "click"), ("a", 25 * M, "purchase"),
      // b: click arrives 40min after view -> stalls at stage 1, and the
      // later purchase (even though within 30min of the late click)
      // must NOT count
      ("b", 0 * M, "view"), ("b", 40 * M, "click"), ("b", 50 * M, "purchase"),
      // c: purchase BEFORE click -> stage 2 (no purchase after click)
      ("c", 0 * M, "view"), ("c", 5 * M, "purchase"), ("c", 10 * M, "click"),
      // d: no view at all -> absent from the report
      ("d", 0 * M, "click"), ("d", 5 * M, "purchase"),
      // e: first view is the anchor (first-match), second view closer
      // to the click must not re-anchor: click at 45 is >30 from view@0
      ("e", 0 * M, "view"), ("e", 20 * M, "view"), ("e", 45 * M, "click")
    ).toDF("user_id", "ts_us", "event_type")
    val out = graft.operators.Funnels.windowFunnel(events,
        "user_id", "ts_us", "event_type",
        Seq("view", "click", "purchase"), windowUs = W)
      .select("user_id", "t1", "t2", "t3", "stage")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(out("a") == ((0L, 10 * M, 25 * M, 3L)))
    assert(out("b") == ((0L, -1L, -1L, 1L)))
    assert(out("c") == ((0L, 10 * M, -1L, 2L)))
    assert(!out.contains("d"))
    assert(out("e") == ((0L, -1L, -1L, 1L)))
  }

  test("windowFunnel matches a brute-force recurrence on random event streams") {
    val rnd = new scala.util.Random(41)
    val types = Array("A", "B", "C", "x")
    val events = (1 to 600).map { _ =>
      (s"u${rnd.nextInt(25)}", rnd.nextInt(5000).toLong,
        types(rnd.nextInt(types.length)))
    }
    val W = 700L
    val steps = Seq("A", "B", "C")
    // brute force: first-match min-recurrence per user
    val expect = events.groupBy(_._1).flatMap { case (u, es) =>
      def firstAfter(tp: String, after: Long): Option[Long] = {
        val c = es.filter(e => e._3 == tp && e._2 > after &&
          e._2 - after <= W).map(_._2)
        if (c.isEmpty) None else Some(c.min)
      }
      val t1 = es.filter(_._3 == "A").map(_._2)
        .reduceOption(math.min(_, _))
      t1.map { a =>
        val b = firstAfter("B", a)
        val c = b.flatMap(firstAfter("C", _))
        u -> ((a, b.getOrElse(-1L), c.getOrElse(-1L),
          1L + b.size + c.size))
      }
    }
    val got = graft.operators.Funnels.windowFunnel(
        events.toDF("user_id", "ts_us", "event_type"),
        "user_id", "ts_us", "event_type", steps, windowUs = W)
      .select("user_id", "t1", "t2", "t3", "stage")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(got == expect)
  }

  test("transitionMatrix: in-session pairs only, floored bp rows sum sanely") {
    val M = 60L * 1000000
    // user A session 1: view->view->cart; 2h gap; session 2: view->buy
    // user B: cart->view
    val events = Seq(
      ("a", 1L, 0 * M, "view"), ("a", 2L, 1 * M, "view"),
      ("a", 3L, 2 * M, "cart"),
      ("a", 4L, 200 * M, "view"), ("a", 5L, 201 * M, "buy"),
      ("b", 6L, 0 * M, "cart"), ("b", 7L, 1 * M, "view")
    ).toDF("user_id", "event_id", "ts_us", "event_type")
    val out = Paths.transitionMatrix(events, "user_id", "ts_us",
        "event_id", "event_type", gapSeconds = 1800)
      .as[(String, String, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    // from view: view->view 1, view->cart 1, view->buy 1 (3 total,
    // 3333 bp each); from cart: cart->view 1 (10000 bp). The
    // cross-session pair cart->view for user A must NOT be counted
    // (session 1 ends at cart) — only B's contributes.
    assert(out == Map(
      ("view", "view") -> ((1L, 3333L)),
      ("view", "cart") -> ((1L, 3333L)),
      ("view", "buy") -> ((1L, 3333L)),
      ("cart", "view") -> ((1L, 10000L))))
  }

  test("cusum matches the max(0, s+d) recurrence on a drifting series") {
    val rnd = new scala.util.Random(5)
    // two series: one flat around 10, one that jumps at day 20
    val rows = for {
      g <- Seq("flat", "jump"); d <- 0 until 30
      base = if (g == "jump" && d >= 20) 25 else 10
      n = base + rnd.nextInt(3)
      i <- 0 until n
    } yield (g, java.sql.Timestamp.valueOf(
      f"2024-01-${d + 1}%02d 12:00:0${i % 10}.${i}%03d"), i)
    val df = rows.toDF("g", "ts", "i")
    val out = graft.operators.Rolling.cusum(df, "g", "ts", refDays = 7)
      .select("g", "date", "n", "s_up", "s_dn")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // driver-side recurrence per group
    val daily = rows.groupBy(r => (r._1,
        r._2.toLocalDateTime.toLocalDate.toString))
      .map { case (k, v) => k -> v.size.toLong }
    for (g <- Seq("flat", "jump")) {
      val series = daily.collect { case ((gg, d), n) if gg == g => (d, n) }
        .toSeq.sortBy(_._1)
      val (refRows, mon) = series.splitAt(7)
      val refN = refRows.size.toLong
      val refSum = refRows.map(_._2).sum
      var sUp = 0L; var sDn = 0L
      for ((d, n) <- mon) {
        val dev = refN * n - refSum
        sUp = math.max(0L, sUp + dev)
        sDn = math.max(0L, sDn - dev)
        assert(out((g, d)) == ((n, sUp, sDn)),
          s"($g, $d): got ${out((g, d))}, want ($n, $sUp, $sDn)")
      }
      // reference days are not monitored
      refRows.foreach { case (d, _) => assert(!out.contains((g, d))) }
    }
    // the jump series must actually alarm upward
    assert(out.filter(_._1._1 == "jump").values.map(_._2).max >
      out.filter(_._1._1 == "flat").values.map(_._2).max * 5)
  }

  test("temporalSplit: exact rank cut, embargo band, explicit-cut stability") {
    val S = graft.operators.Splits
    val df = (1L to 100L).map(i => (i, i * 1000L)).toDF("id", "ts_us")
    val out = S.temporalSplit(df, "ts_us", trainBp = 8000,
        embargoUs = 5000L)
      .select("id", "split").as[(Long, String)].collect().toMap
    // cut = value at rank 80 = 80000; embargo covers (80000, 85000]
    assert((1L to 80L).forall(out(_) == "train"))
    assert((81L to 85L).forall(out(_) == "embargo"))
    assert((86L to 100L).forall(out(_) == "test"))
    // explicit-cut variant labels an appended row without moving the cut
    val out2 = S.temporalSplitAt(
        (1L to 120L).map(i => (i, i * 1000L)).toDF("id", "ts_us"),
        "ts_us", cutUs = 80000L, embargoUs = 5000L)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert((1L to 100L).forall(i => out2(i) == out(i)))
    assert((101L to 120L).forall(out2(_) == "test"))
    // ties at the cut all land in train (tie-invariant boundary)
    val tied = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 20L), (5L, 30L))
      .toDF("id", "ts_us")
    val out3 = S.temporalSplit(tied, "ts_us", trainBp = 6000,
        embargoUs = 0L)
      .select("id", "split").as[(Long, String)].collect().toMap
    // rank 3 of (10,20,20,20,30) = 20 -> ids 2,3,4 all train
    assert(out3 == Map(1L -> "train", 2L -> "train", 3L -> "train",
      4L -> "train", 5L -> "test"))
  }
}
