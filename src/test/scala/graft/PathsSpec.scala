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
}
