package graft

import org.apache.spark.sql.functions._

import graft.core.Intervals
import graft.operators.{Chunking, Eval, Graph, Profile, Rolling, Selection,
  Splits, Survival, TextAnalysis}

/** Round-10 operators: brute-force parity for the nonparametric trio
  * (Pettitt / Mann-Kendall+Theil-Sen / Hodges-Lehmann), hand cases for
  * Nelson-Aalen, BH-FDR, Allen relations, seeded closeness, the
  * weighted prefix-sum kernel, token-shard binarization, k-fold CV and
  * URL canonicalization — plus every REQUIRE guard trip. */
class RobustSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int) = new java.sql.Timestamp(
    day * 86400000L + hour * 3600000L)
  private def dateStr(day: Int): String =
    java.time.LocalDate.ofEpochDay(day.toLong).toString

  // ---- Pettitt ------------------------------------------------------

  test("pettitt: brute-force parity + single-day group") {
    // group a: level shift at day 3 (counts 1,1,1,5,5,5,5,2);
    // group b: single day -> NULL changepoint row
    val counts = Map(0 -> 1, 1 -> 1, 2 -> 1, 3 -> 5, 4 -> 5, 5 -> 5,
      6 -> 5, 7 -> 2)
    val rows = counts.toSeq.flatMap { case (d, n) =>
      (0 until n).map(i => ("a", ts(d, 1 + i))) } ++ Seq(("b", ts(2, 3)))
    val out = Rolling.pettitt(rows.toDF("g", "ts"), "g", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    // brute force over the day-ordered series
    val xs = counts.toSeq.sortBy(_._1).map(_._2.toLong)
    val n = xs.size
    val us = (1 until n).map { t =>
      (for (i <- 0 until t; j <- t until n)
        yield java.lang.Long.signum(xs(j) - xs(i)).toLong).sum }
    val k = us.map(math.abs).max
    val cpIdx = us.indexWhere(u => math.abs(u) == k) // earliest day wins
    val a = out("a")
    assert(a.getLong(1) == n.toLong)
    assert(a.getString(2) == dateStr(cpIdx))
    assert(a.getLong(3) == k && a.getLong(4) == us(cpIdx))
    val b = out("b")
    assert(b.getLong(1) == 1L && b.isNullAt(2) && b.isNullAt(3))
  }

  // ---- Mann-Kendall + Theil-Sen ------------------------------------

  test("mannKendall: brute-force S and lower-median slope, with gaps") {
    // irregular day gaps + a tie day; value = daily sum of v
    val daily = Seq(("a", 0, 3L), ("a", 1, 7L), ("a", 3, 7L),
      ("a", 6, 1L), ("a", 10, 9L), ("b", 2, 4L))
    val rows = daily.flatMap { case (g, d, v) =>
      Seq((g, ts(d, 1), v - 1), (g, ts(d, 2), 1L)) } // two events/day
    val out = Rolling.mannKendall(rows.toDF("g", "ts", "v"), "g", "ts",
        col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val series = daily.filter(_._1 == "a").map(t => (t._2.toLong, t._3))
    val pairs = for (i <- series.indices; j <- i + 1 until series.size)
      yield (series(j)._2 - series(i)._2, series(j)._1 - series(i)._1)
    val s = pairs.map(p => java.lang.Long.signum(p._1).toLong).sum
    val slopes = pairs.map { case (dy, dx) =>
      if (dy >= 0) dy * 1000000L / dx else -((-dy) * 1000000L / dx) }
    val med = slopes.sorted.apply(((pairs.size + 1) / 2) - 1)
    val a = out("a")
    assert(a.getLong(1) == series.size.toLong)
    assert(a.getLong(2) == pairs.size.toLong && a.getLong(3) == s)
    assert(a.getLong(4) == med)
    val b = out("b") // single day: zero pairs, NULL slope
    assert(b.getLong(2) == 0L && b.getLong(3) == 0L && b.isNullAt(4))
  }

  test("mannKendall: maxDays guard trips") {
    val rows = (0 until 10).map(d => ("a", ts(d, 1), 1L))
    val e = intercept[IllegalArgumentException] {
      Rolling.mannKendall(rows.toDF("g", "ts", "v"), "g", "ts",
        col("v"), maxDays = 5)
    }
    assert(e.getMessage.contains("mannKendall"))
  }

  // ---- Hodges-Lehmann ----------------------------------------------

  test("hodgesLehmann: brute-force Walsh-average lower median") {
    val vals = Map("a" -> Seq(1L, 1L, 2L, 5L, 9L, 9L, 9L),
      "b" -> Seq(4L), "c" -> Seq(2L, 8L))
    val rows = vals.toSeq.flatMap { case (g, vs) => vs.map((g, _)) }
    val out = Profile.hodgesLehmann(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for ((g, vs) <- vals) {
      val sums = for (i <- vs.indices; j <- i until vs.size)
        yield vs(i) + vs(j)
      val p = sums.size
      val med = sums.sorted.apply(((p + 1) / 2) - 1)
      assert(out(g) == ((vs.size.toLong, p.toLong, med, med * 500000L)),
        s"group $g")
    }
  }

  // ---- Nelson-Aalen -------------------------------------------------

  test("nelsonAalen: floored hazard cumsum, KM-consistent risk sets") {
    // t=1: 1 death of 4 at risk; t=2: 1 censor; t=3: 1 death of 2;
    // t=5: 1 death of 1
    val rows = Seq(("g", 1L, 1), ("g", 2L, 0), ("g", 3L, 1), ("g", 5L, 1))
    val out = Survival.nelsonAalen(rows.toDF("g", "t", "ev"),
        "g", "t", "ev")
      .orderBy("t").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    val h1 = 1000000L / 4; val h3 = 1000000L / 2; val h5 = 1000000L
    assert(out.toSeq == Seq(
      (1L, 4L, 1L, 0L, h1, h1),
      (2L, 3L, 0L, 1L, 0L, h1),
      (3L, 2L, 1L, 0L, h3, h1 + h3),
      (5L, 1L, 1L, 0L, h5, h1 + h3 + h5)))
    // risk sets match kaplanMeier's on the same input
    val km = Survival.kaplanMeier(rows.toDF("g", "t", "ev"), "g", "t", "ev")
      .select("t", "n_risk").as[(Long, Long)].collect().toMap
    assert(out.forall { case (t, nr, _, _, _, _) => km(t) == nr })
  }

  // ---- Benjamini-Hochberg ------------------------------------------

  test("bhFdr: hand step-up cases incl. ties, none- and all-rejected") {
    def run(ps: Seq[Long], alphaFp: Long) =
      Eval.bhFdr(ps.zipWithIndex.map(p => (p._2.toLong, p._1))
          .toDF("id", "p_fp"), "p_fp", alphaFp)
        .select("id", "p_fp", "m", "k_star", "p_threshold_fp", "rejected")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]), r.getLong(5)))
    // p = [1000, 5000, 20000, 200000, 900000], alpha = .1:
    // i=3 passes (20000*5 <= 3*100000), i=4/5 fail -> k*=3, p*=20000
    val a = run(Seq(1000L, 5000L, 20000L, 200000L, 900000L), 100000L)
    assert(a.forall(r => r._3 == 5L && r._4 == 3L && r._5 == Some(20000L)))
    assert(a.filter(_._6 == 1L).map(_._2).sorted.toSeq ==
      Seq(1000L, 5000L, 20000L))
    // tied p at the threshold: both duplicates share the LARGEST index
    // p = [10000 x3, 900000], alpha=.1, m=4: 10000*4 <= 3*100000 ✓
    val t = run(Seq(10000L, 10000L, 10000L, 900000L), 100000L)
    assert(t.forall(r => r._4 == 3L && r._5 == Some(10000L)))
    assert(t.count(_._6 == 1L) == 3)
    // nothing passes: threshold NULL, k*=0, m still populated
    val z = run(Seq(500000L, 900000L), 10000L)
    assert(z.forall(r => r._3 == 2L && r._4 == 0L && r._5.isEmpty &&
      r._6 == 0L))
    // everything passes
    val f = run(Seq(1L, 2L, 3L), 1000000L)
    assert(f.forall(r => r._4 == 3L && r._6 == 1L))
  }

  // ---- Allen relations ---------------------------------------------

  test("allenRelations: all 13 relations label correctly; guards trip") {
    def d(day: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.ofEpochDay(day.toLong))
    // (key=expected relation, a=[f1,u1) id 1, b=[f2,u2) id 2)
    val cases = Seq(
      ("equal", 0, 10, 0, 10), ("before", 0, 2, 5, 7),
      ("after", 5, 7, 0, 2), ("meets", 0, 5, 5, 8),
      ("met_by", 5, 8, 0, 5), ("overlaps", 0, 6, 4, 9),
      ("overlapped_by", 4, 9, 0, 6), ("starts", 0, 4, 0, 9),
      ("started_by", 0, 9, 0, 4), ("during", 3, 5, 0, 9),
      ("contains", 0, 9, 3, 5), ("finishes", 5, 9, 0, 9),
      ("finished_by", 0, 9, 5, 9))
    val rows = cases.flatMap { case (k, f1, u1, f2, u2) =>
      Seq((k, 1, d(f1), d(u1)), (k, 2, d(f2), d(u2))) }
    val out = Intervals.allenRelations(
        rows.toDF("k", "id", "valid_from", "valid_until"), Seq("k"), "id")
      .select("k", "id_a", "id_b", "relation")
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    cases.foreach { case (k, _, _, _, _) =>
      assert(out(k) == ((1, 2, k)), s"case $k") }
    // open-ended interval refused (raise_error may arrive wrapped in a
    // SparkException — search the cause chain)
    val e1 = intercept[Exception] {
      Intervals.allenRelations(Seq(("k", 1, d(0), null: java.sql.Date),
          ("k", 2, d(0), d(3)))
        .toDF("k", "id", "valid_from", "valid_until"), Seq("k"), "id")
        .collect()
    }
    val chain = Iterator.iterate(e1: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain.contains("open-ended"))
    // per-key pair budget
    val e2 = intercept[IllegalArgumentException] {
      Intervals.allenRelations((1 to 4).map(i => ("k", i, d(i), d(i + 1)))
        .toDF("k", "id", "valid_from", "valid_until"), Seq("k"), "id",
        maxPerKey = 3)
    }
    assert(e2.getMessage.contains("quadratic"))
  }

  // ---- seeded closeness --------------------------------------------

  test("closenessFromSeeds: hand graph; seed budget trips") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L))
    val out = Graph.closenessFromSeeds(edges.toDF("s", "d"), "s", "d",
        Seq(1L, 5L, 99L).toDF("id"), "id", maxHops = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // ghost seed 99 dropped; 5 has no out-edges (reaches only itself)
    assert(out(1L) == ((1L, 0L, 0L)))
    assert(out(2L) == ((1L, 1L, 1000000L)))
    assert(out(3L) == ((1L, 2L, 500000L)))
    assert(out(4L) == ((1L, 3L, 333333L)))
    assert(out(5L) == ((2L, 1L, 1000000L)))
    val e = intercept[IllegalArgumentException] {
      Graph.closenessFromSeeds(edges.toDF("s", "d"), "s", "d",
        (1L to 10L).toDF("id"), "id", maxHops = 1, maxSeeds = 4)
    }
    assert(e.getMessage.contains("maxSeeds"))
  }

  // ---- prefix sums --------------------------------------------------

  test("prefixSums: brute-force parity (narrow + wide range); guards") {
    val rnd = new scala.util.Random(11)
    // narrow ids (sub-bucket width 1) and wide 2^40-spread ids
    for (wide <- Seq(false, true)) {
      val rows = (0 until 400).map { i =>
        val id = if (wide) i.toLong * (1L << 32) + rnd.nextInt(1000)
          else i.toLong
        ("g" + (i % 3), id, rnd.nextInt(100).toLong)
      }.distinct
      val out = Selection.prefixSums(rows.toDF("g", "id", "w"),
          "g", "id", "w")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(3), r.getLong(4)))).toMap
      for ((g, id, _) <- rows) {
        val grp = rows.filter(_._1 == g)
        val expOff = grp.filter(_._2 < id).map(_._3).sum
        val expTot = grp.map(_._3).sum
        assert(out((g, id)) == ((expOff, expTot)), s"wide=$wide $g/$id")
      }
    }
    val eDup = intercept[IllegalArgumentException] {
      Selection.prefixSums(Seq(("g", 1L, 1L), ("g", 1L, 2L))
        .toDF("g", "id", "w"), "g", "id", "w")
    }
    assert(eDup.getMessage.contains("not unique"))
    val eNeg = intercept[IllegalArgumentException] {
      Selection.prefixSums(Seq(("g", 1L, -1L)).toDF("g", "id", "w"),
        "g", "id", "w")
    }
    assert(eNeg.getMessage.contains("negative weight"))
  }

  // ---- token-shard binarization ------------------------------------

  test("binarizeTokenShards: u16-BE payloads, offsets, range guard") {
    val rows = Seq((1L, Seq(0, 1, 65535)), (2L, Seq.empty[Int]),
      (3L, Seq(256)), (4L, Seq(16, 17)))
    val out = Chunking.binarizeTokenShards(rows.toDF("doc_id", "ids"),
        "doc_id", "ids", shards = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getString(6)))).toMap
    assert(out(1L)._6 == "00000001ffff" && out(1L)._2 == 3L &&
      out(1L)._3 == 6L)
    assert(out(2L)._6 == "" && out(2L)._3 == 0L)
    assert(out(3L)._6 == "0100")
    assert(out(4L)._6 == "00100011")
    // offsets: within each shard, ascending doc_id cumsum of bytes
    val byShard = out.toSeq.groupBy(_._2._1)
    byShard.foreach { case (_, docs) =>
      val sorted = docs.sortBy(_._1)
      var run = 0L
      sorted.foreach { case (_, (_, _, nb, off, tot, _)) =>
        assert(off == run); run += nb
        assert(tot == docs.map(_._2._3).sum)
      }
    }
    val e = intercept[IllegalArgumentException] {
      Chunking.binarizeTokenShards(Seq((1L, Seq(70000)))
        .toDF("doc_id", "ids"), "doc_id", "ids", 2)
    }
    assert(e.getMessage.contains("u16"))
    val e2 = intercept[IllegalArgumentException] {
      Chunking.binarizeTokenShards(Seq((1L, Seq(-1)))
        .toDF("doc_id", "ids"), "doc_id", "ids", 2)
    }
    assert(e2.getMessage.contains("u16"))
    // NULL ids must fail LOUDLY (array_min/max ignore nulls and
    // array_join drops them, which would silently corrupt offsets)
    val eNull = intercept[IllegalArgumentException] {
      Chunking.binarizeTokenShards(
        Seq((1L, Seq[Integer](5, null)), (2L, Seq[Integer](7)))
          .toDF("doc_id", "ids"), "doc_id", "ids", 2)
    }
    assert(eNull.getMessage.contains("NULL token ids"))
    val eNullArr = intercept[IllegalArgumentException] {
      Chunking.binarizeTokenShards(
        Seq((1L, Seq[Integer](5)), (2L, null: Seq[Integer]))
          .toDF("doc_id", "ids"), "doc_id", "ids", 2)
    }
    assert(eNullArr.getMessage.contains("NULL token ids"))
    // empty input passes straight through (sum() is NULL on empty —
    // must not NPE in the null-count guard)
    assert(Chunking.binarizeTokenShards(
      Seq.empty[(Long, Seq[Int])].toDF("doc_id", "ids"),
      "doc_id", "ids", 2).count() == 0L)
  }

  // ---- k-fold -------------------------------------------------------

  test("kfoldByGroup: group-coherent folds in range; k guard") {
    val rows = (0 until 200).map(i => (i.toLong, "s" + (i % 7)))
    val out = Splits.kfoldByGroup(rows.toDF("id", "g"), "g", k = 5)
      .select("g", "fold").as[(String, Long)].collect()
    assert(out.forall(r => r._2 >= 0 && r._2 < 5))
    assert(out.groupBy(_._1).forall(_._2.map(_._2).distinct.size == 1))
    // folds reproduce the portable recipe independently
    val expect = Splits.bucket(lit("s0|"), 5)
    val byHand = spark.range(1).select(expect.as("f"))
      .head().getLong(0)
    assert(out.find(_._1 == "s0").get._2 == byHand)
    intercept[IllegalArgumentException] {
      Splits.kfoldByGroup(rows.toDF("id", "g"), "g", k = 1)
    }
  }

  // ---- URL canonicalization ----------------------------------------

  test("canonicalUrl: hand normalization cases") {
    val cases = Seq(
      "HTTP://Ex.COM:80/A/b/?utm_source=x&q=1#f" ->
        "http://ex.com/A/b/?q=1",
      "https://h/" -> "https://h",
      "https://H:443/p?ref=a" -> "https://h/p",
      "https://h/p?a=1&fbclid=z&b=2" -> "https://h/p?a=1&b=2",
      "https://h/p?utm_a=1" -> "https://h/p",
      "https://h/P/Q" -> "https://h/P/Q",
      "https://h:8080/p" -> "https://h:8080/p")
    val out = cases.map(_._1).toDF("u")
      .select(col("u"), TextAnalysis.canonicalUrl(col("u")).as("c"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (in, want) =>
      assert(out(in) == want, s"url $in") }
  }
}
