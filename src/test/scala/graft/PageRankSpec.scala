package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side twin of the exact integer recurrence. */
  private def brute(edges: Seq[(Long, Long)], iters: Int,
                    dampBp: Long = 8500L,
                    scale: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = scale * (10000L - dampBp) / 10000L / n
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 0 until iters) {
      val contribs = edges.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        r(s) * dampBp / 10000L / out(s)
      }.sum).toMap
      r = nodes.map(v => v -> (base + contribs.getOrElse(v, 0L))).toMap
    }
    r
  }

  test("matches the integer recurrence on a cycle + star graph") {
    // 1→2→3→1 cycle; hub 9 pointed at by 4..8 (which 1 links to, so
    // the graph stays strongly reachable enough to be interesting)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L),
      (4L, 9L), (5L, 9L), (6L, 9L), (7L, 9L), (8L, 9L), (9L, 1L))
    for (iters <- Seq(0, 1, 3, 7)) {
      val got = PageRank.iterate(edges.toDF("src", "dst"), "src", "dst",
          iters)
        .as[(Long, Long)].collect().toMap
      assert(got == brute(edges, iters), s"iters=$iters")
    }
    // the in-degree-5 hub outranks every cycle node at convergence-ish
    val r7 = PageRank.iterate(edges.toDF("src", "dst"), "src", "dst", 7)
      .as[(Long, Long)].collect().toMap
    assert(Seq(2L, 3L, 5L, 6L).forall(v => r7(9L) > r7(v)))
  }

  test("mass leaks deterministically, never grows; dangling safe") {
    // node 5 is dangling (no out-edges): its mass evaporates
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 5L), (3L, 5L), (3L, 1L))
    val scale = 1000000000000L
    var prevTotal = scale
    for (iters <- 1 to 4) {
      val total = PageRank.iterate(edges.toDF("src", "dst"),
          "src", "dst", iters)
        .agg(sum(col("rank"))).as[Long].head()
      assert(total <= prevTotal, s"mass grew at iter $iters")
      prevTotal = total
    }
    // parallel edges act as weights: with 3→1 doubled, node 1 takes
    // 2/3 of 3's damped mass instead of 1/2 — and the operator still
    // matches the recurrence exactly
    val withDouble = edges ++ Seq((3L, 1L))
    val op = PageRank.iterate(withDouble.toDF("src", "dst"),
      "src", "dst", 3).as[(Long, Long)].collect().toMap
    assert(op == brute(withDouble, 3))
    assert(brute(withDouble, 1)(1L) > brute(edges, 1)(1L))
  }

  /** Driver-side twin of the personalized recurrence. */
  private def bruteSeeded(edges: Seq[(Long, Long)], seeds: Set[Long],
                          iters: Int, dampBp: Long = 8500L,
                          scale: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val s = nodes.filter(seeds).toSet
    val ns = s.size.toLong
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = scale * (10000L - dampBp) / 10000L / ns
    var r = nodes.map(v => v -> (if (s(v)) scale / ns else 0L)).toMap
    for (_ <- 0 until iters) {
      val contribs = edges.groupBy(_._2).view.mapValues(_.map { case (u, _) =>
        r(u) * dampBp / 10000L / out(u)
      }.sum).toMap
      r = nodes.map(v => v ->
        ((if (s(v)) base else 0L) + contribs.getOrElse(v, 0L))).toMap
    }
    r
  }

  test("personalized matches the seeded recurrence; rank decays from seeds") {
    // chain 1→2→3→4→5 plus back-edges keeping everything reachable
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L),
      (3L, 1L), (10L, 11L), (11L, 10L)) // {10,11}: disconnected island
    val seeds = Set(1L)
    for (iters <- Seq(0, 1, 4)) {
      val got = PageRank.personalized(edges.toDF("src", "dst"),
          "src", "dst", seeds.toSeq.toDF("id"), "id", iters)
        .as[(Long, Long)].collect().toMap
      assert(got == bruteSeeded(edges, seeds, iters), s"iters=$iters")
    }
    val r4 = PageRank.personalized(edges.toDF("src", "dst"), "src", "dst",
        seeds.toSeq.toDF("id"), "id", 4)
      .as[(Long, Long)].collect().toMap
    // trust propagates in hop order: after 2 rounds it has reached
    // {1,2,3} but not yet the 3-hop tail {4,5}...
    val r2 = PageRank.personalized(edges.toDF("src", "dst"), "src", "dst",
        seeds.toSeq.toDF("id"), "id", 2)
      .as[(Long, Long)].collect().toMap
    assert(r2(1L) > 0L && r2(2L) > 0L && r2(3L) > 0L)
    assert(r2(4L) == 0L && r2(5L) == 0L)
    // ...and the disconnected island gets exactly zero, always
    assert(r4(10L) == 0L && r4(11L) == 0L)
    // seed ids absent from the graph are ignored, present ones kept
    val withGhost = PageRank.personalized(edges.toDF("src", "dst"),
        "src", "dst", Seq(1L, 999L).toDF("id"), "id", 4)
      .as[(Long, Long)].collect().toMap
    assert(withGhost == r4)
  }

  test("resume continues exactly: resume(iterate(k), j) == iterate(k+j)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 9L),
      (5L, 9L), (9L, 1L), (3L, 5L))
    val df = edges.toDF("src", "dst")
    val full = PageRank.iterate(df, "src", "dst", 6)
      .as[(Long, Long)].collect().toMap
    val resumed = PageRank.resume(
        PageRank.iterate(df, "src", "dst", 4), df, "src", "dst", 2)
      .as[(Long, Long)].collect().toMap
    assert(resumed == full)
    // a node appearing only in the NEW edge set starts at the uniform
    // share and the continuation still matches the recurrence
    val grown = edges :+ ((4L, 99L)) :+ ((99L, 1L))
    val g = grown.toDF("src", "dst")
    val r = PageRank.resume(PageRank.iterate(df, "src", "dst", 3),
        g, "src", "dst", 2)
      .as[(Long, Long)].collect().toMap
    assert(r.contains(99L) && r.keySet ==
      (grown.map(_._1) ++ grown.map(_._2)).toSet)
  }

  test("personalized with every node seeded equals plain iterate") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 1L))
    val all = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val plain = PageRank.iterate(edges.toDF("src", "dst"), "src", "dst", 3)
      .as[(Long, Long)].collect().toMap
    val seededAll = PageRank.personalized(edges.toDF("src", "dst"),
        "src", "dst", all.toDF("id"), "id", 3)
      .as[(Long, Long)].collect().toMap
    assert(seededAll == plain)
  }

  test("iterateWeighted: unit weights equal iterate; brute-force replay") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val unit = edges.map { case (a, b) => (a, b, 1L) }
      .toDF("s", "d", "w")
    val plain = PageRank.iterate(edges.toDF("s", "d"), "s", "d", 4)
      .as[(Long, Long)].collect().toMap
    val weighted1 = PageRank.iterateWeighted(unit, "s", "d", "w", 4)
      .as[(Long, Long)].collect().toMap
    assert(weighted1 === plain)
    // genuinely weighted graph vs a driver-side replay
    val wedges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 5L),
      (3L, 1L, 2L), (4L, 2L, 7L))
    val got = PageRank.iterateWeighted(wedges.toDF("s", "d", "w"),
        "s", "d", "w", 4)
      .as[(Long, Long)].collect().toMap
    val scale = 1000000000000L
    val nodes = wedges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val outW = wedges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val base = scale * 1500L / 10000L / n
    var r = nodes.map(_ -> scale / n).toMap
    (1 to 4).foreach { _ =>
      val contribs = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      wedges.foreach { case (a, b, w) =>
        contribs(b) += (r(a) * 8500L / 10000L) * w / outW(a)
      }
      r = nodes.map(nd => nd -> (base + contribs(nd))).toMap
    }
    assert(got === r)
  }
}
