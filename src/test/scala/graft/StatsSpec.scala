package graft

import org.apache.spark.sql.functions._

import graft.operators.{Eval, Funnels, Linkage, Profile, Rolling, Survival}

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("rocAuc matches brute-force pair counting, ties half-credited") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 400).map { i =>
      val label = rnd.nextInt(2)
      // overlapping score distributions with plenty of ties
      val score = rnd.nextInt(20) + label * rnd.nextInt(6)
      ("g" + (i % 2), score.toLong, label)
    }
    val out = Eval.rocAuc(rows.toDF("g", "score", "label"),
        "g", "score", "label")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    for (g <- Seq("g0", "g1")) {
      val grp = rows.filter(_._1 == g)
      val pos = grp.filter(_._3 == 1).map(_._2)
      val neg = grp.filter(_._3 == 0).map(_._2)
      var u2 = BigInt(0) // 2·U = 2·wins + ties
      for (p <- pos; n <- neg)
        u2 += (if (p > n) 2 else if (p == n) 1 else 0)
      val expected = (BigInt(1000000) * u2 /
        (BigInt(2) * pos.size * neg.size)).toLong
      assert(out(g) === ((pos.size.toLong, neg.size.toLong, expected)))
    }
  }

  test("rocAuc: perfect separation = scale, inverted = 0") {
    val df = Seq(("a", 10L, 1), ("a", 11L, 1), ("a", 1L, 0), ("a", 2L, 0))
      .toDF("g", "s", "l")
    assert(Eval.rocAuc(df, "g", "s", "l").select("auc_fp")
      .as[Long].head() === 1000000L)
    val inv = df.withColumn("l", lit(1) - col("l"))
    assert(Eval.rocAuc(inv, "g", "s", "l").select("auc_fp")
      .as[Long].head() === 0L)
  }

  test("bounded-series guard trips on a synthetic continuous column") {
    // 1000 distinct values in one group: legal at the default budget,
    // fails fast (driver-side require, BEFORE any window job) when the
    // caller's maxSeries contract is tighter
    val cont = (1 to 1000).map(i => ("g", i.toLong, i % 2)).toDF("g", "v", "l")
    val eRoc = intercept[IllegalArgumentException] {
      Eval.rocAuc(cont, "g", "v", "l", maxSeries = 100L)
    }
    assert(eRoc.getMessage.contains("rocAuc") &&
      eRoc.getMessage.contains("Pre-quantize"))
    val eKs = intercept[IllegalArgumentException] {
      Eval.ksTest(cont, "g", "v", col("l") === 1, maxSeries = 100L)
    }
    assert(eKs.getMessage.contains("ksTest"))
    val eLr = intercept[IllegalArgumentException] {
      Survival.logRank(cont, "g", "v", "l", maxSeries = 100L)
    }
    assert(eLr.getMessage.contains("logRank"))
    // under the budget the same input still computes
    assert(Eval.rocAuc(cont, "g", "v", "l", maxSeries = 1000L)
      .count() === 1L)
  }

  test("cohenKappa: hand-computed 2x2, negative truncation, degenerate") {
    // 20 (+,+), 5 (+,-), 10 (-,+), 15 (-,-): kappa = 0.4 exactly
    val rows =
      Seq.fill(20)(("k", 1, 1)) ++ Seq.fill(5)(("k", 1, 0)) ++
        Seq.fill(10)(("k", 0, 1)) ++ Seq.fill(15)(("k", 0, 0)) ++
        // below-chance group: n=5, a1=3, b1=3, agree=1, pe = 9+4 = 13
        // num = 5·1 − 13 = −8, den = 25 − 13 = 12 → −⌊8e6/12⌋ = −666666
        Seq(("m", 1, 0), ("m", 1, 0), ("m", 0, 1), ("m", 0, 1),
          ("m", 1, 1)) ++
        // degenerate: BOTH raters constant → pe = n² → den = 0 → NULL
        Seq(("z", 1, 1), ("z", 1, 1))
    val out = Eval.cohenKappa(rows.toDF("g", "a", "b"), "g",
        col("a") === 1, col("b") === 1)
      .select(col("g"), col("n"), col("n_agree"), col("kappa_fp"))
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out("k") === ((50L, 35L, Some(400000L))))
    assert(out("m") === ((5L, 1L, Some(-666666L))))
    assert(out("z")._3 === None)
  }

  test("kaplanMeier: hand-computed curve, deaths-before-censoring ties") {
    val df = Seq(("c", 1L, 1), ("c", 2L, 0), ("c", 3L, 1), ("c", 3L, 1),
        ("c", 5L, 0))
      .toDF("g", "dur", "ev")
    val out = Survival.kaplanMeier(df, "g", "dur", "ev")
      .orderBy("t")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("c", 1L, 5L, 1L, 0L, 800000L), // 1e6·4/5
      ("c", 2L, 4L, 0L, 1L, 800000L), // censor only: unchanged
      ("c", 3L, 3L, 2L, 0L, 266666L), // ⌊800000·1/3⌋
      ("c", 5L, 1L, 0L, 1L, 266666L)))
  }

  test("moments: exact fixed-point incl. negative means and skew sign") {
    val df = Seq(("a", -5L), ("a", -3L), ("a", -4L),
        ("b", 1L), ("b", 1L), ("b", 10L))
      .toDF("g", "v")
    val out = Profile.moments(df, "g", "v")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // a: mean −4, dev (−1,1,0): var 2/3, m3 0, m4 2/3
    assert(out("a") === ((3L, -40000L, 6666L, 0L, 6666L)))
    // b: mean 4, dev (−3,−3,6): var 18, m3 (−27−27+216)/3 = 54,
    // m4 (81+81+1296)/3 = 486
    assert(out("b") === ((3L, 40000L, 180000L, 540000L, 4860000L)))
  }

  test("kAnonymity flags combos under k") {
    val df = Seq(("x", 1), ("x", 1), ("x", 1), ("y", 1), ("y", 2))
      .toDF("seg", "code")
    val out = Profile.kAnonymity(df, Seq("seg", "code"), k = 2)
      .as[(String, Int, Long, Boolean)].collect().toSet
    assert(out === Set(("x", 1, 3L, false), ("y", 1, 1L, true),
      ("y", 2, 1L, true)))
  }

  test("benford: digit counts and an exact chi2 contribution") {
    val df = (Seq(1L, 19L, 2L, 25L, 3L) ++ Seq.fill(5)(111L))
      .map(("g", _)).toDF("g", "v")
    val out = Profile.benford(df, "g", "v")
      .as[(String, Int, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5, r._6))).toMap
    assert(out(1)._1 === 7L && out(2)._1 === 2L && out(3)._1 === 1L)
    assert(out(1)._2 === 10L)
    // digit 1: p_fp = 301030, n = 10 → chi2_fp =
    // (1e6·7 − 10·301030)² // (10·301030) // 1e6
    val num = BigInt(1000000L * 7 - 10 * 301030L)
    val expected = (num * num / BigInt(10 * 301030L) / 1000000).toLong
    assert(out(1)._4 === expected)
  }

  test("lastTouch matches brute force on a randomized stream") {
    val rnd = new scala.util.Random(7)
    val W = 2000L
    val events = (1 to 300).map { i =>
      val u = rnd.nextInt(5).toLong
      val t = rnd.nextInt(10000).toLong
      val kind = rnd.nextInt(3) // 0 = conversion, 1/2 = channels
      (u, i.toLong, t, kind)
    }
    val conv = events.filter(_._4 == 0)
      .map(e => (e._1, e._2, e._3)).toDF("u", "id", "ts")
    val tch = events.filter(_._4 != 0)
      .map(e => (e._1, e._2, e._3, "ch" + e._4))
      .toDF("u", "id", "ts", "chan")
    val got = Funnels.lastTouch(conv, tch, "u", "ts", "id", "chan", W)
      .as[(Long, Long, Long, Option[String])].collect()
      .map(r => r._2 -> r._4).toMap
    val touches = events.filter(_._4 != 0)
    for ((u, id, t, _) <- events.filter(_._4 == 0)) {
      val cands = touches.filter(e =>
        e._1 == u && e._3 < t && t - e._3 <= W)
      val expected =
        if (cands.isEmpty) None
        else {
          val best = cands.maxBy(e => (e._3, e._2))
          Some("ch" + best._4)
        }
      assert(got(id) === expected, s"conversion $id (user $u, t $t)")
    }
  }

  test("calibration: bin assignment, mean score, positive fraction") {
    val df = Seq(("g", 0L, 0), ("g", 250000L, 1), ("g", 260000L, 0),
        ("g", 999999L, 1), ("g", 1000000L, 1))
      .toDF("g", "score", "l")
    val out = Eval.calibration(df, "g", "score", "l", nBins = 10)
      .as[(String, Int, Long, Long, Long)].collect()
      .map(r => r._2 -> (r._3, r._4, r._5)).toMap
    assert(out(0) === ((1L, 0L, 0L)))
    // bin 2: scores 250000, 260000 → mean 255000, 1 of 2 positive
    assert(out(2) === ((2L, 255000L, 500000L)))
    // scores 999999 (bin 9) and 1000000 (clamped to bin 9)
    assert(out(9) === ((2L, 999999L, 1000000L)))
  }

  test("assocPhi2: perfect association = scale, independence = 0") {
    val perfect = Seq(("p", 1, 1), ("p", 1, 1), ("p", 0, 0), ("p", 0, 0))
      .toDF("g", "a", "b")
    assert(Eval.assocPhi2(perfect, "g", col("a") === 1, col("b") === 1)
      .select("phi2_fp").as[Option[Long]].head() === Some(1000000L))
    val indep = Seq(("i", 1, 1), ("i", 1, 0), ("i", 0, 1), ("i", 0, 0))
      .toDF("g", "a", "b")
    assert(Eval.assocPhi2(indep, "g", col("a") === 1, col("b") === 1)
      .select("phi2_fp").as[Option[Long]].head() === Some(0L))
    val degenerate = Seq(("d", 1, 1), ("d", 1, 0)).toDF("g", "a", "b")
    assert(Eval.assocPhi2(degenerate, "g", col("a") === 1, col("b") === 1)
      .select("phi2_fp").as[Option[Long]].head() === None)
  }

  test("goldenRecords: mode wins, ties break low, nulls excluded") {
    val recs = Seq(
      (1L, "BUILDING", "dk"), (1L, "BUILDING", null), (1L, "AUTO", "de"),
      (2L, null, null), (2L, null, "se"))
      .toDF("cluster", "seg", "country")
    val out = Linkage.goldenRecords(recs, "cluster",
        Seq("seg", "country"))
      .as[(Long, Long, Option[String], Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) === ((3L, Some("BUILDING"), Some("de")))) // dk/de tie → de
    assert(out(2L) === ((2L, None, Some("se"))))
  }

  test("logRank: hand-computed O/E; single cohort has oe = 0") {
    val df = Seq(("g1", 1L, 1), ("g1", 2L, 1), ("g2", 1L, 0), ("g2", 3L, 1))
      .toDF("g", "dur", "ev")
    val out = Survival.logRank(df, "g", "dur", "ev")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(out("g1") === ((2L, 2L, 1000000L, 1000000L)))
    assert(out("g2") === ((2L, 1L, 2000000L, -1000000L)))
    val solo = Survival.logRank(df.withColumn("g", lit("all")), "g",
      "dur", "ev").as[(String, Long, Long, Long, Long)].head()
    assert(solo._3 === 3L && solo._5 === 0L) // E = O exactly when alone
  }

  test("abcClassify: straddling item stays A, deterministic ties") {
    val df = Seq(("g", "i1", 50L), ("g", "i2", 30L), ("g", "i3", 15L),
        ("g", "i4", 5L)).toDF("g", "item", "v")
    val out = Profile.abcClassify(df, "g", "item", "v")
      .as[(String, String, Long, Int, String)].collect()
      .map(r => r._2 -> ((r._4, r._5))).toMap
    assert(out === Map("i1" -> ((1, "A")), "i2" -> ((2, "A")),
      "i3" -> ((3, "B")), "i4" -> ((4, "C"))))
  }

  test("readability: hand-computed Flesch-Kincaid fixed point") {
    val df = Seq((1L, "the cat sat. a big dog ran!")).toDF("id", "text")
    val out = graft.operators.TextAnalysis.readability(df, "id", "text")
      .as[(Long, Long, Long, Long, Long)].head()
    // 7 words, 2 sentence runs, 7 vowel groups:
    // (3900·49 + 118000·14 − 155900·14) div 14 = −339500 div 14
    assert(out === ((1L, 7L, 2L, 7L, -24250L)))
  }

  test("corrR2 matches the declared BigInt procedure; sign carried") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { _ =>
      val x = rnd.nextInt(50).toLong
      // negatively correlated with noise
      val y = 100L - x + rnd.nextInt(10)
      ("g", x, y)
    }
    val got = Profile.corrR2(rows.toDF("g", "x", "y"), "g", "x", "y")
      .as[(String, Long, Option[Long])].head()
    // mirror the declared fixed-point procedure exactly
    val ax = rows.map(_._2).min; val ay = rows.map(_._3).min
    val xs = rows.map(r => BigInt(r._2 - ax))
    val ys = rows.map(r => BigInt(r._3 - ay))
    val n = BigInt(rows.size)
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(v => v * v).sum
    val syy = ys.map(v => v * v).sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val S = BigInt(1000000)
    val cov = n * sxy - sx * sy
    def normDiv(v: BigInt): BigInt =
      if (v >= 0) (S * v) / (n * n) else -((S * -v) / (n * n))
    val covn = normDiv(cov)
    val vxn = (S * (n * sxx - sx * sx)) / (n * n)
    val vyn = (S * (n * syy - sy * sy)) / (n * n)
    val mag = (S * covn * covn) / (vxn * vyn)
    val expected = if (cov >= 0) mag else -mag
    assert(got._2 === rows.size.toLong)
    assert(got._3 === Some(expected.toLong))
    assert(expected < 0) // the construction is negatively correlated
  }

  test("cohortLtv: hand-computed cumulative per-user curve") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // two users arrive in week 2024-01-01 (Mon); one in week 01-08
    val df = Seq(
      (1L, t("2024-01-02 10:00:00"), "signup", 0.0),
      (1L, t("2024-01-03 10:00:00"), "purchase", 10.0),
      (1L, t("2024-01-10 10:00:00"), "purchase", 5.0),
      (2L, t("2024-01-04 10:00:00"), "signup", 0.0),
      (3L, t("2024-01-09 10:00:00"), "purchase", 7.0))
      .toDF("user_id", "ts", "event_type", "value")
    val out = Rolling.cohortLtv(df, "user_id", "ts",
        when(col("event_type") === "purchase",
          expr("cast(round(value*100) as bigint)")).otherwise(0L))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    // ltv = scale(10^4) · cum_cents / users
    assert(out === Set(
      ("2024-01-01", 0L, 2L, 1000L, 1000L, 5000000L),
      ("2024-01-01", 1L, 2L, 500L, 1500L, 7500000L),
      ("2024-01-08", 0L, 1L, 700L, 700L, 7000000L)))
  }

  test("weightedQuantiles: ranks address cumulative weight, not rows") {
    // values 1..4 with weights 1,1,1,7: total 10 → p50 rank 5 → value 4
    // (unweighted median would be 2)
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L),
        ("g", 4L, 7L)).toDF("g", "v", "w")
    val out = Profile.weightedQuantiles(df, "g", "v", "w",
        Seq("p50" -> 5000, "p90" -> 9000))
      .as[(String, String, Long, Long)].collect()
      .map(r => r._2 -> (r._3, r._4)).toMap
    assert(out("p50") === ((4L, 10L)))
    assert(out("p90") === ((4L, 10L)))
    // weight < 1 fails fast
    val bad = Seq(("g", 1L, 0L)).toDF("g", "v", "w")
    val e = intercept[Exception] {
      Profile.weightedQuantiles(bad, "g", "v", "w", Seq("p50" -> 5000))
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("autocorr: perfect period-2 series gives -scale at lag 1, +scale at lag 2") {
    // alternating daily counts 1,3,1,3,... (2 events vs 6 events is
    // overkill — build counts via repeated rows per day)
    def day(i: Int) = f"2024-01-${i + 1}%02d 12:00:00"
    val rows = (0 until 14).flatMap { i =>
      val n = if (i % 2 == 0) 1 else 3
      Seq.fill(n)(("s", java.sql.Timestamp.valueOf(day(i))))
    }
    val out = Rolling.autocorr(rows.toDF("g", "ts"), "g", "ts",
        lags = Seq(1, 2))
      .as[(String, Int, Long, Option[Long])].collect()
      .map(r => r._2 -> (r._3, r._4)).toMap
    assert(out(1) === ((13L, Some(-1000000L))))
    assert(out(2) === ((12L, Some(1000000L))))
  }

  test("dfDrift: share deltas, full-outer terms, deterministic top-k") {
    val a = Seq((1L, "alpha beta"), (2L, "alpha gamma"), (3L, "alpha"),
      (4L, "beta")).toDF("id", "text")
    val b = Seq((5L, "beta gamma"), (6L, "gamma")).toDF("id", "text")
    val out = graft.operators.TextIndex.dfDrift(a, b, "id", "text",
        minDf = 1, topK = 10)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // alpha: 3/4 vs 0/2 → 7500 → 0 (only-in-A term survives via outer)
    assert(out("alpha") === ((3L, 0L, 7500L, 0L, -7500L)))
    // gamma: 1/4 vs 2/2 → 2500 → 10000
    assert(out("gamma") === ((1L, 2L, 2500L, 10000L, 7500L)))
    assert(out("beta") === ((2L, 1L, 5000L, 5000L, 0L)))
    // top-1 is the largest |delta|; alpha (7500) ties gamma (7500) →
    // term asc keeps alpha
    val top1 = graft.operators.TextIndex.dfDrift(a, b, "id", "text",
      minDf = 1, topK = 1).select("term").as[String].collect().toSeq
    assert(top1 === Seq("alpha"))
  }

  test("dupProfile: multiplicity histogram with excess and share") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"), (5L, "y"),
      (6L, "z")).toDF("id", "text")
    val out = graft.operators.Dedup.dupProfile(df, "id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(3L) === ((1L, 3L, 2L, 5000L))) // 3 of 6 docs
    assert(out(2L) === ((1L, 2L, 1L, 3333L)))
    assert(out(1L) === ((1L, 1L, 0L, 1666L)))
  }

  test("spearmanR2: monotone nonlinear relation scores scale; reversal negative") {
    // y = x³ is perfectly monotone (spearman 1) but nonlinear
    val rows = (1 to 60).map(i => ("g", i.toLong, i.toLong * i * i))
    val up = Profile.spearmanR2(rows.toDF("g", "x", "y"), "g", "x", "y")
      .select("r2_fp").as[Option[Long]].head()
    assert(up === Some(1000000L))
    val down = Profile.spearmanR2(
        rows.map(r => (r._1, r._2, -r._3)).toDF("g", "x", "y"),
        "g", "x", "y")
      .select("r2_fp").as[Option[Long]].head()
    assert(down === Some(-1000000L))
    // linear corrR2 on the same data is well below spearman
    val lin = Profile.corrR2(rows.toDF("g", "x", "y"), "g", "x", "y")
      .select("r2_fp").as[Option[Long]].head().get
    assert(lin < 900000L)
  }

  test("ksTest: hand-computed D, identical slices give 0") {
    // A = {1,2}, B = {3,4}: D = 1 at v=2 → d_fp = scale
    val apart = Seq(("g", 1L, 1), ("g", 2L, 1), ("g", 3L, 0),
      ("g", 4L, 0)).toDF("g", "v", "a")
    val d1 = Eval.ksTest(apart, "g", "v", col("a") === 1)
      .as[(String, Long, Long, Long)].head()
    assert(d1 === (("g", 2L, 2L, 1000000L)))
    // A = B = {1,2,3} → D = 0
    val same = (1 to 3).flatMap(v =>
      Seq(("g", v.toLong, 1), ("g", v.toLong, 0))).toDF("g", "v", "a")
    assert(Eval.ksTest(same, "g", "v", col("a") === 1)
      .select("d_fp").as[Long].head() === 0L)
    // interleaved hand case: A={1,3}, B={2,3}: cum at v=1: (1,0)→|1·2−0·2|=2
    // v=2: (1,1)→0; v=3: (2,2)→0 → D=2/4 → 500000
    val mix = Seq(("g", 1L, 1), ("g", 3L, 1), ("g", 2L, 0), ("g", 3L, 0))
      .toDF("g", "v", "a")
    assert(Eval.ksTest(mix, "g", "v", col("a") === 1)
      .select("d_fp").as[Long].head() === 500000L)
  }

  test("bandJoin matches brute force incl. negatives and bucket edges") {
    val rnd = new scala.util.Random(5)
    val eps = 7L
    val rows = (1 to 120).map(i =>
      (i.toLong, rnd.nextInt(200).toLong - 100L, "b" + (i % 2)))
    val got = Linkage.bandJoin(rows.toDF("id", "v", "blk"),
        "id", "v", eps, blockCols = Seq("blk"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    // uniqueness: every pair appears exactly once
    assert(got.map(r => (r._2, r._3)).distinct.length === got.length)
    val expected = (for {
      a <- rows; b <- rows
      if a._3 == b._3 && a._1 < b._1 && math.abs(a._2 - b._2) <= eps
    } yield ((a._1, b._1), (a._2, b._2))).toMap
    assert(got.map(r => (r._2, r._3)).toSet === expected.keySet)
    got.foreach { r =>
      assert((r._4, r._5) === expected((r._2, r._3)),
        s"values for pair ${(r._2, r._3)}")
      assert(r._6 === r._5 - r._4)
    }
  }

  test("ndcgAtK: positional credit, ideal prefix, zero-hit query") {
    val results = Seq((1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3),
      (2L, 98L, 1)).toDF("q", "doc", "rank")
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L))
      .toDF("q", "doc")
    val out = graft.operators.Fusion.ndcgAtK(results, truth, "q", "doc",
        "rank", k = 10)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val disc = graft.operators.Fusion.ndcgDiscFp(10)
    val dcg = disc(0) + disc(2) // hits at ranks 1 and 3
    val idcg = disc.take(3).sum
    assert(out(1L) === ((3L, dcg, idcg, 1000000L * dcg / idcg)))
    assert(out(2L) === ((1L, 0L, disc(0), 0L))) // no hits → 0
  }

  test("modularity: two-triangle hand case; single community gives 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("u", "v")
    val comm2 = (1 to 6).map(n => (n.toLong, if (n <= 3) 1L else 2L))
      .toDF("node", "label")
    val q2 = graft.operators.Graph.modularity(edges, "u", "v", comm2,
      "node", "label").as[(Long, Long, Long)].head()
    // m=7, intra=6, d_c = 7 each: Q = (4·7·6 − 98)/196 = 70/196
    assert(q2 === ((7L, 6L, 1000000L * 70 / 196)))
    val comm1 = (1 to 6).map(n => (n.toLong, 1L)).toDF("node", "label")
    assert(graft.operators.Graph.modularity(edges, "u", "v", comm1,
      "node", "label").select("q_fp").as[Long].head() === 0L)
  }

  test("quantileNormalize aligns group distributions onto the global") {
    val df = (Seq(1L, 2L, 3L, 4L).map(("a", _)) ++
        Seq(10L, 10L, 30L, 40L).map(("b", _)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val out = Profile.quantileNormalize(df, "g", "v")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => (r._2, r._3) -> r._5).toMap
    // global sorted: 1,2,3,4,10,10,30,40 (N=8)
    assert(out(("a", 1L)) === 2L) // pct 2500 → rank 2
    assert(out(("a", 2L)) === 4L) // pct 5000 → rank 4
    assert(out(("a", 3L)) === 10L) // pct 7500 → rank 6
    assert(out(("a", 4L)) === 40L) // pct 10000 → rank 8
    // ties: both b=10 rows share rank 1 → pct 2500 → 2
    assert(out(("b", 10L)) === 2L)
    assert(out(("b", 30L)) === 10L) // rank 3/4 → pct 7500 → rank 6
    assert(out(("b", 40L)) === 40L)
  }

  test("crossCorrelation: identical series +scale, mirrored -scale") {
    def t(d: Int, h: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-$d%02d $h%02d:00:00")
    // series A and B identical counts per day; C mirrored (5-n)
    val rows = (1 to 6).flatMap { d =>
      val n = 1 + (d % 3) // 2,3,1,2,3,1
      Seq.fill(n)(("A", t(d, 1))) ++ Seq.fill(n)(("B", t(d, 2))) ++
        Seq.fill(4 - n)(("C", t(d, 3)))
    }
    val out = graft.operators.Rolling.crossCorrelation(
        rows.toDF("g", "ts"), "g", "ts")
      .as[(String, String, Long, Option[Long])].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(out(("A", "B")) === Some(1000000L))
    assert(out(("A", "C")) === Some(-1000000L))
    assert(out(("B", "C")) === Some(-1000000L))
  }

  test("growthAccounting: the self-auditing DAU quad") {
    def t(d: String) = java.sql.Timestamp.valueOf(s"$d 12:00:00")
    // weeks: W1=2024-01-01, W2=01-08, W3=01-15
    // u1 active W1,W2,W3; u2 active W1 then gone; u3 active W1,W3
    val df = Seq(
      (1L, t("2024-01-02")), (1L, t("2024-01-09")), (1L, t("2024-01-16")),
      (2L, t("2024-01-03")),
      (3L, t("2024-01-04")), (3L, t("2024-01-17")))
      .toDF("user_id", "ts")
    val out = graft.operators.Rolling.growthAccounting(df, "user_id", "ts")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out("2024-01-01") === ((3L, 0L, 0L, 0L, 3L)))
    // W2: u1 retained; u2,u3 churned
    assert(out("2024-01-08") === ((0L, 1L, 0L, 2L, 1L)))
    // W3: u1 retained, u3 resurrected
    assert(out("2024-01-15") === ((0L, 1L, 1L, 0L, 2L)))
    // identity: retained_w + churned_w = active_{w-1}
    assert(out("2024-01-08")._2 + out("2024-01-08")._4 ===
      out("2024-01-01")._5)
  }

  test("centroidShift: identical slices drift 0; a moved label doesn't") {
    val rnd = new scala.util.Random(13)
    def vec(shift: Float) =
      Array.fill(8)(rnd.nextFloat() * 2 - 1).map(_ + shift)
    // labels must straddle both slices (slice = id parity, label =
    // id-pair parity); label 1's odd-slice vectors are shifted far
    val rows = (1 to 200).map { i =>
      val lbl = (i / 2) % 2
      val shift = if (lbl == 1 && i % 2 == 1) 50.0f else 0.0f
      (i.toLong, vec(shift), lbl)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = graft.operators.Quantize.centroidShift(df, "vec_id",
        "embedding", "label", col("vec_id") % 2 === 0,
        graft.operators.Quantize.scaleOf(df, "embedding"))
      .as[(Int, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    // label 1's odd slice is shifted to the saturation rail: large drift
    assert(out(1) > 100 * out(0).max(1L))
  }

  test("isotonicCalibrate: PAV pooling, weights, monotone output") {
    // equal weights [1000, 3000, 2000, 4000] → pool bins 1,2 → 2500
    val df = Seq(("g", 0, 10L, 1000L), ("g", 1, 10L, 3000L),
      ("g", 2, 10L, 2000L), ("g", 3, 10L, 4000L))
      .toDF("g", "bin", "n", "frac")
    val out = graft.operators.Eval.isotonicCalibrate(df, "g", "bin",
        "n", "frac")
      .as[(String, Int, Long, Long, Long)].collect()
      .map(r => r._2 -> r._5).toMap
    assert(out === Map(0 -> 1000L, 1 -> 2500L, 2 -> 2500L, 3 -> 4000L))
    // weighted pooling: [5000(n=1), 1000(n=9)] → pooled (5000+9000)/10
    val wdf = Seq(("g", 0, 1L, 5000L), ("g", 1, 9L, 1000L))
      .toDF("g", "bin", "n", "frac")
    val wout = graft.operators.Eval.isotonicCalibrate(wdf, "g", "bin",
        "n", "frac")
      .as[(String, Int, Long, Long, Long)].collect()
      .map(r => r._2 -> r._5).toMap
    assert(wout === Map(0 -> 1400L, 1 -> 1400L))
    // property: output non-decreasing on random input
    val rnd = new scala.util.Random(3)
    val rdf = (0 until 20).map(b =>
      ("r", b, 1L + rnd.nextInt(9), rnd.nextInt(10000).toLong))
      .toDF("g", "bin", "n", "frac")
    val cal = graft.operators.Eval.isotonicCalibrate(rdf, "g", "bin",
        "n", "frac")
      .orderBy("bin").select("calibrated_fp").as[Long].collect()
    assert(cal.zip(cal.tail).forall { case (a, b) => a <= b })
  }

  test("lDiversity: a large-but-uniform group is flagged, a diverse one isn't") {
    val df = Seq(
      ("A", 1, 100), ("A", 1, 100), ("A", 1, 100), ("A", 1, 100),
      ("B", 2, 100), ("B", 2, 200), ("B", 2, 300))
      .toDF("seg", "nat", "sens")
    val out = graft.operators.Profile
      .lDiversity(df, Seq("seg", "nat"), "sens", l = 2)
      .as[(String, Int, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(out("A") === ((4L, 1L, true)))  // k-anonymous yet leaking
    assert(out("B") === ((3L, 3L, false)))
  }

  test("diffInDiff: hand quad; empty cell yields NULL did") {
    // treated: pre mean 100, post mean 400; control: 100 -> 200
    // -> did = (400-100) - (200-100) = 200 (fp x100 = 20000)
    val df = Seq(
      ("g", true, false, 100L), ("g", true, true, 400L),
      ("g", false, false, 100L), ("g", false, true, 200L),
      ("h", true, false, 50L), ("h", true, true, 70L),
      ("h", false, false, 10L)) // h has no control-post cell
      .toDF("g", "tr", "post", "v")
    val out = graft.operators.Eval
      .diffInDiff(df, "g", col("tr"), col("post"), "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").getLong(9) === 20000L)
    assert(out("g").getLong(4) === 40000L) // m_tpost_fp
    assert(out("h").isNullAt(8) && out("h").isNullAt(9))
    // negative-sum cell: truncating and flooring engines must agree
    val neg = Seq(("n", true, false, -5L), ("n", true, false, -2L),
      ("n", true, true, 0L), ("n", false, false, 0L),
      ("n", false, true, 0L)).toDF("g", "tr", "post", "v")
    val nout = graft.operators.Eval
      .diffInDiff(neg, "g", col("tr"), col("post"), "v").collect()(0)
    assert(nout.getLong(2) === -((100L * 7) / 2)) // -350, not -351
  }

  test("herfindahl: monopoly 1e8; equal split 1e8/n; skew between") {
    val df = Seq(
      ("mono", "a", 500L), ("mono", "a", 500L),
      ("eq", "a", 250L), ("eq", "b", 250L), ("eq", "c", 250L),
      ("eq", "d", 250L),
      ("skew", "a", 900L), ("skew", "b", 100L))
      .toDF("g", "e", "v")
    val out = graft.operators.Profile.herfindahl(df, "g", "e", "v")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("mono") === ((1L, 1000L, 100000000L)))
    assert(out("eq") === ((4L, 1000L, 25000000L)))
    assert(out("skew") === ((2L, 1000L, 82000000L))) // 0.81+0.01
  }

  test("positionalAttribution: U-shaped credit splits sum to 10000") {
    // conv 100 at t=1000 for u1: touches a@100 b@200 c@300 d@400 e@500
    // k=5: first 4000+rem2=4002, mids 666 each, last 4000
    val conv = Seq((1L, 1000L, 100L)).toDF("u", "ts", "id")
    val tch = Seq((1L, 100L, 1L, "a"), (1L, 200L, 2L, "b"),
      (1L, 300L, 3L, "c"), (1L, 400L, 4L, "d"), (1L, 500L, 5L, "e"),
      (2L, 100L, 6L, "zz")) // other user: never credited
      .toDF("u", "ts", "id", "ch")
    val out = graft.operators.Funnels
      .positionalAttribution(conv, tch, "u", "ts", "id", "ch", 10000L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out === Map("a" -> 4002L, "b" -> 666L, "c" -> 666L,
      "d" -> 666L, "e" -> 4000L))
    // no-touch conversion goes organic at full credit; k=2 splits even
    val conv2 = Seq((1L, 1000L, 100L), (3L, 1000L, 101L))
      .toDF("u", "ts", "id")
    val tch2 = Seq((1L, 100L, 1L, "a"), (1L, 200L, 2L, "b"))
      .toDF("u", "ts", "id", "ch")
    val out2 = graft.operators.Funnels
      .positionalAttribution(conv2, tch2, "u", "ts", "id", "ch", 10000L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // organic rows are synthetic credit carriers: n_touches must be 0
    assert(out2 === Map("a" -> ((1L, 1L, 5000L)),
      "b" -> ((1L, 1L, 5000L)), "organic" -> ((1L, 0L, 10000L))))
  }

  test("markovAttribution: hand-solvable chain removal effects") {
    // u1: a->b then converts; u2: a then drops; u3: b then converts
    // P = 2/3; remove a -> 1/3; remove b -> 0
    val tch = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 100L, "a"),
      (3L, 100L, "b")).toDF("u", "ts", "ch")
    val conv = Seq(Tuple1(1L), Tuple1(3L)).toDF("u")
    val out = graft.operators.Funnels
      .markovAttribution(tch, "u", "ts", "ch", conv)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("a") === ((5000L, 3333L)))
    assert(out("b") === ((10000L, 6666L)))

    // high-cardinality channel column fails the budget gate BEFORE the
    // transition matrix is collected (cluster-side distinct count)
    val wide = (1L to 8L).map(i => (i, 100L, s"url_$i"))
      .toDF("u", "ts", "ch")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Funnels.markovAttribution(
        wide, "u", "ts", "ch", conv, maxChannels = 5)
    }
    assert(ex.getMessage.contains("channel vocabulary 8"))
  }

  test("cmh: hand-computed two-stratum table, exact rationals") {
    // stratum 1: a=2 b=1 c=1 d=2; stratum 2: a=3 b=0 c=1 d=2
    // E = 1.5 + 2 = 3.5; V = 0.45 + 0.4 = 0.85; sumA = 5
    // CMH = 1.5^2 / 0.85 = 2.6470588... -> 2647058 fp
    // OR_MH = (4/6 + 6/6) / (1/6) = 10 -> 100000 bp
    def rows(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, true, true)) ++ Seq.fill(b)((s, true, false)) ++
        Seq.fill(c)((s, false, true)) ++ Seq.fill(d)((s, false, false))
    val df = (rows("s1", 2, 1, 1, 2) ++ rows("s2", 3, 0, 1, 2))
      .toDF("st", "e", "y")
    val out = graft.operators.Eval.cmh(df, "st", col("e"), col("y"))
      .as[(Long, Long, Option[Long], Option[Long])].collect()(0)
    assert(out._1 === 2L && out._2 === 5L)
    assert(out._3 === Some(2647058L))
    assert(out._4 === Some(100000L))
    // all-zero Σbc leaves the odds ratio undefined, not a crash
    val onlyA = rows("s1", 2, 0, 0, 2).toDF("st", "e", "y")
    val o2 = graft.operators.Eval.cmh(onlyA, "st", col("e"), col("y"))
      .as[(Long, Long, Option[Long], Option[Long])].collect()(0)
    assert(o2._4.isEmpty)

    // the engine-exact fixed-point twin tracks the rational fold: the
    // per-stratum 10^9 floors lose < 1e-9 per term, so the 10^6-scale
    // statistic agrees within a few units (and the counts exactly)
    val fp = graft.operators.Eval.cmhExactFp(df, "st", col("e"), col("y"))
      .as[(Long, Long, Option[Long], Option[Long])].collect()(0)
    assert(fp._1 === 2L && fp._2 === 5L)
    assert(math.abs(fp._3.get - 2647058L) <= 3,
      s"cmh_fp ${fp._3.get} vs rational 2647058")
    assert(math.abs(fp._4.get - 100000L) <= 1)
    val fp2 = graft.operators.Eval
      .cmhExactFp(onlyA, "st", col("e"), col("y"))
      .as[(Long, Long, Option[Long], Option[Long])].collect()(0)
    assert(fp2._4.isEmpty)
  }

  test("trimmedMean: drops tails by value bounds, tie-inclusive") {
    // 10 values 1..9 + outlier 1000; 10-90% trim:
    // lo = value at rank 1 = 1, hi = value at rank 9 = 9
    val df = ((1L to 9L) :+ 1000L).map(("g", _)).toDF("g", "v")
    val out = graft.operators.Profile
      .trimmedMean(df, "g", "v", loBp = 1000, hiBp = 9000)
      .as[(String, Long, Long, Option[Long])].collect()(0)
    assert(out._2 === 10L && out._3 === 9L)
    assert(out._4 === Some((100L * 45) / 9)) // mean of 1..9 = 5.00
    // negative values: sign-factored division
    val neg = Seq(("n", -7L), ("n", -8L)).toDF("g", "v")
    val nout = graft.operators.Profile
      .trimmedMean(neg, "g", "v", loBp = 1, hiBp = 9999)
      .as[(String, Long, Long, Option[Long])].collect()(0)
    assert(nout._4 === Some(-((100L * 15) / 2))) // -750, not -751
  }

  test("contentDigest: order-insensitive, content-sensitive") {
    val a = Seq(("g", 1L, "x"), ("g", 2L, "y"), ("h", 3L, "z"))
      .toDF("g", "id", "v")
    val d1 = graft.operators.Profile.contentDigest(a, "g", Seq("id", "v"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // permuted + repartitioned copy digests identically
    val b = Seq(("h", 3L, "z"), ("g", 2L, "y"), ("g", 1L, "x"))
      .toDF("g", "id", "v").repartition(7)
    val d2 = graft.operators.Profile.contentDigest(b, "g", Seq("id", "v"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(d1 === d2)
    assert(d1("g")._2 === 2L)
    // one changed value flips the group digest, leaves others alone
    val c = Seq(("g", 1L, "x"), ("g", 2L, "Y"), ("h", 3L, "z"))
      .toDF("g", "id", "v")
    val d3 = graft.operators.Profile.contentDigest(c, "g", Seq("id", "v"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(d3("g")._3 !== d1("g")._3)
    assert(d3("h") === d1("h"))
  }

  test("upliftByBucket: exact quantile buckets and arm rates") {
    val df = Seq((1L, true, false), (2L, false, false),
      (3L, true, true), (4L, false, false))
      .toDF("score", "tr", "conv")
    val out = graft.operators.Eval
      .upliftByBucket(df, "score", col("tr"), col("conv"), nBuckets = 2)
      .as[(Int, Long, Long, Long, Long, Option[Long], Option[Long],
        Option[Long])].collect().map(r => r._1 -> r).toMap
    // cut at rank 2 -> value 2; bucket = score > 2
    assert(out(0)._8 === Some(0L))
    assert(out(1)._6 === Some(10000L) && out(1)._8 === Some(10000L))
    // an empty arm yields NULL rate and NULL uplift
    val solo = Seq((1L, true, true), (2L, true, false))
      .toDF("score", "tr", "conv")
    val sout = graft.operators.Eval
      .upliftByBucket(solo, "score", col("tr"), col("conv"), nBuckets = 2)
      .as[(Int, Long, Long, Long, Long, Option[Long], Option[Long],
        Option[Long])].collect()
    assert(sout.forall(r => r._7.isEmpty && r._8.isEmpty))
  }

  test("seasonalProfile: weekday baseline and residuals, exact") {
    // Mondays 2024-01-01/08 with 2 and 4 events; Tuesday 01-02 with 3
    def ts(d: String, n: Int) = (1 to n).map(i => (s"$d 0$i:00:00", "e"))
    val df = (ts("2024-01-01", 2) ++ ts("2024-01-08", 4) ++
        ts("2024-01-02", 3))
      .toDF("ts", "g").withColumn("ts", to_timestamp(col("ts")))
    val out = Rolling.seasonalProfile(df, "g", "ts")
      .select(col("date").cast("string"), col("isodow"), col("n"),
        col("expected_fp"), col("residual_fp"))
      .as[(String, Int, Long, Long, Long)].collect().toSet
    assert(out === Set(
      ("2024-01-01", 1, 2L, 30000L, -10000L), // Monday mean (2+4)/2 = 3
      ("2024-01-08", 1, 4L, 30000L, 10000L),
      ("2024-01-02", 2, 3L, 30000L, 0L)))
  }

  test("modeValue: deterministic smallest-value tie-break") {
    val df = Seq(("a", 5L), ("a", 5L), ("a", 3L), ("a", 3L), ("a", 9L),
        ("b", 7L)).toDF("g", "v")
    val out = Profile.modeValue(df, "g", "v")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // counts: 5->2, 3->2, 9->1 — tie at 2, smallest value 3 wins
    assert(out("a") === ((3L, 2L, 5L, 3L)))
    assert(out("b") === ((7L, 1L, 1L, 1L)))
  }

  test("fdAudit reports violating determinants with repair budget") {
    val df = Seq((1L, "x"), (1L, "x"), (1L, "y"), // 1 -> {x,x,y}: violates
        (2L, "z"), (2L, "z"),                     // 2 -> z: holds
        (3L, "p"), (3L, "q"), (3L, "q"), (3L, "r")) // 3 -> {p,q,q,r}
      .toDF("k", "dep")
    val out = Profile.fdAudit(df, Seq("k"), "dep")
      .as[(Long, Long, Long, Long)].collect()
    // ordered by (n_rhs_values DESC, n_rows DESC, k)
    assert(out.toSeq === Seq((3L, 3L, 4L, 2L), (1L, 2L, 3L, 2L)))
    // repair budget: rows - majority = 2 for k=3, 1 for k=1
  }

  test("timeDecayAttribution: half-life weights, exact 10000 per conversion") {
    val hl = 100L
    // conv at t=1000: touch a at age 50 (w=10000), b at age 250
    // (2 half-lives -> w=2500); shares 8000/2000 exactly
    val conv = Seq((1L, 1000L, 100L), (3L, 1000L, 101L)).toDF("u", "ts", "id")
    val tch = Seq((1L, 950L, 1L, "a"), (1L, 750L, 2L, "b"))
      .toDF("u", "ts", "id", "ch")
    val out = graft.operators.Funnels.timeDecayAttribution(
        conv, tch, "u", "ts", "id", "ch", windowUs = 10000L,
        halfLifeUs = hl)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("a") === ((1L, 1L, 8000L)))
    assert(out("b") === ((1L, 1L, 2000L)))
    assert(out("organic") === ((1L, 0L, 10000L)))
    // three equal-weight touches: 3333 each + remainder 1 to the LATEST
    val tch3 = Seq((1L, 950L, 1L, "a"), (1L, 940L, 2L, "b"),
      (1L, 930L, 3L, "c")).toDF("u", "ts", "id", "ch")
    val out3 = graft.operators.Funnels.timeDecayAttribution(
        Seq((1L, 1000L, 100L)).toDF("u", "ts", "id"), tch3,
        "u", "ts", "id", "ch", windowUs = 10000L, halfLifeUs = hl)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out3 === Map("a" -> 3334L, "b" -> 3333L, "c" -> 3333L))
    // stale-but-qualifying touch floors at weight 1, never 0
    val far = Seq((1L, 1000L - 50L * hl, 9L, "z")).toDF("u", "ts", "id", "ch")
    val outF = graft.operators.Funnels.timeDecayAttribution(
        Seq((1L, 1000L, 100L)).toDF("u", "ts", "id"), far,
        "u", "ts", "id", "ch", windowUs = 100000L, halfLifeUs = hl)
      .as[(String, Long, Long, Long)].collect()
    assert(outF.toSeq === Seq(("z", 1L, 1L, 10000L)))
  }

  test("holtDaily matches the driver-side recurrence, tracks a ramp") {
    def t(d: Int) = new java.sql.Timestamp(d * 86400000L)
    // ramp: day d has d+1 events -> trend should go positive
    val rows = (0 until 10).flatMap(d => Seq.fill(d + 1)(("g", t(d))))
    val out = Rolling.holtDaily(rows.toDF("g", "ts"), "g", "ts")
      .orderBy("date")
      .as[(String, java.sql.Date, Long, Long, Long, Long)].collect()
    // brute recurrence
    var l = 0L; var b = 0L
    (0 until 10).foreach { d =>
      val x = (d + 1).toLong
      if (d == 0) { l = x * 256L; b = 0L }
      else {
        val pl = l
        l = ((pl + b) * 3L + x * 256L) >> 2
        b = (b * 3L + (l - pl)) >> 2
      }
      assert(out(d)._3 === x)
      assert(out(d)._4 === l, s"level day $d")
      assert(out(d)._5 === b, s"trend day $d")
      assert(out(d)._6 === l + b)
    }
    assert(out.last._5 > 0L) // positive trend on a ramp
  }

  test("frontier2d: exact Pareto frontier with ties and duplicates") {
    val pts = Seq((1L, 9L), (2L, 7L), (2L, 7L), (3L, 7L), (4L, 5L),
      (4L, 8L), (5L, 5L), (6L, 4L), (6L, 9L), (2L, 9L))
    val out = graft.operators.Skyline.frontier2d(
        pts.toDF("x", "y"), "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    // (1,9); (2,7) x2; (4,5); (6,4). (3,7) dominated by (2,7);
    // (5,5) by (4,5); (2,9) by (1,9)? x strict? (1,9): x 1<2, y 9=9
    // -> dominates. (4,8) dominated by (2,7).
    assert(out === Set((1L, 9L, 1L), (2L, 7L, 2L), (4L, 5L, 1L),
      (6L, 4L, 1L)))
    // brute-force check on a random cloud
    val rnd = new scala.util.Random(3)
    val cloud = Seq.fill(300)((rnd.nextInt(40).toLong,
      rnd.nextInt(40).toLong))
    val got = graft.operators.Skyline.frontier2d(
        cloud.toDF("x", "y"), "x", "y")
      .as[(Long, Long, Long)].collect()
      .flatMap(t => Seq.fill(t._3.toInt)((t._1, t._2))).sorted
    val expected = cloud.filter { case (x, y) =>
      !cloud.exists { case (a, b) =>
        a <= x && b <= y && (a < x || b < y) } }.sorted
    assert(got.toSeq === expected)
  }

  test("tCloseness: skewed group maxes the CDF gap, uniform group is 0") {
    // global: values 1,2 in equal parts; group "skew" all 1s,
    // group "fair" mirrors the global mix
    val df = (Seq.fill(4)(("skew", 1L)) ++
        Seq.fill(2)(("fair", 1L)) ++ Seq.fill(2)(("fair", 2L)) ++
        Seq.fill(2)(("rest", 2L))).toDF("qi", "v")
    // global: 6x1, 4x2 (N=10); cum at v=1: 6/10
    val out = Profile.tCloseness(df, Seq("qi"), "v")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // skew: cum_g(1)=4/4=1 vs 6/10 -> |1 - 0.6| = 0.4 -> 4000 bp
    assert(out("skew") === ((4L, 4000L)))
    // fair: cum(1) = 2/4 = 0.5 vs 0.6 -> 1000 bp
    assert(out("fair") === ((4L, 1000L)))
    // rest: cum(1) = 0 vs 0.6 -> 6000 bp
    assert(out("rest") === ((2L, 6000L)))
    // the groups x domain GRID budget fires even when the tally
    // passes: 3 groups x 2 values = 6 cells > 5
    val ex = intercept[IllegalArgumentException] {
      Profile.tCloseness(df, Seq("qi"), "v", maxSeries = 5L)
    }
    assert(ex.getMessage.contains("grid has 6 cells"))
  }

  test("backtestWape scores holt one-step forecasts exactly") {
    def t(d: Int) = new java.sql.Timestamp(d * 86400000L)
    val rows = (0 until 6).flatMap(d => Seq.fill(d + 1)(("g", t(d))))
    val holt = Rolling.holtDaily(rows.toDF("g", "ts"), "g", "ts")
    val out = Rolling.backtestWape(holt, "g", "date", "n",
        "forecast_scaled")
      .as[(String, Long, Option[Long])].collect().head
    // brute: replay the recurrence, accumulate |256 n_t - f_{t-1}|
    var l = 0L; var b = 0L; var errs = 0L; var acts = 0L; var pf = 0L
    (0 until 6).foreach { d =>
      val x = (d + 1).toLong
      if (d == 0) { l = x * 256L; b = 0L }
      else {
        val pl = l
        l = ((pl + b) * 3L + x * 256L) >> 2
        b = (b * 3L + (l - pl)) >> 2
        errs += math.abs(x * 256L - pf); acts += x * 256L
      }
      pf = l + b
    }
    assert(out === (("g", 5L, Some(10000L * errs / acts))))
  }

  test("entryExit: sessions classify entries, exits, bounces by type") {
    val gapUs = 1800L * 1000000L
    // user 1: session A = [view@0, click@1s], session B = [buy@2h]
    // user 2: session C = [view@0] (bounce)
    val rows = Seq(
      (1L, 0L, 1L, "view"), (1L, 1000000L, 2L, "click"),
      (1L, 7200L * 1000000L, 3L, "buy"),
      (2L, 0L, 4L, "view")).toDF("u", "ts_us", "id", "t")
    val out = graft.streaming.Sessions.entryExit(
        rows, "u", "ts_us", "id", "t", gapSeconds = 1800L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("view") === ((2L, 1L, 1L)))  // entries A,C; exit C; bounce C
    assert(out("click") === ((0L, 1L, 0L))) // exit of A
    assert(out("buy") === ((1L, 1L, 1L)))   // session B is a bounce
  }

  test("centroidClassify: separable clusters, deterministic tie label") {
    // A-vectors point +x, B-vectors point +y; scale = 4.0
    val rows = Seq(
      (1L, "A", Array(4.0f, 0.0f)), (2L, "A", Array(3.0f, 1.0f)),
      (3L, "B", Array(0.0f, 4.0f)), (4L, "B", Array(1.0f, 3.0f)))
      .toDF("id", "lab", "emb")
    val out = graft.operators.Quantize.centroidClassify(
        rows, "id", "emb", "lab", scale = 4.0)
      .as[(String, String, Long)].collect().toSet
    assert(out === Set(("A", "A", 2L), ("B", "B", 2L)))
    // an exactly-ambiguous vector (diagonal) ties: smaller label wins
    val withTie = rows.unionByName(
      Seq((5L, "B", Array(2.0f, 2.0f))).toDF("id", "lab", "emb"))
    val out2 = graft.operators.Quantize.centroidClassify(
        withTie, "id", "emb", "lab", scale = 4.0)
      .as[(String, String, Long)].collect().toSet
    // centroids shift but stay axis-dominant; the diagonal vector's
    // dots against both centroids are computed exactly — just assert
    // totals conserve and predictions are from the label set
    assert(out2.map(_._3).sum === 5L)
    assert(out2.forall(t => Set("A", "B").contains(t._2)))
    // ragged embedding lengths fail fast instead of silently
    // misrouting rows (NULL dot skipped by greatest): mixed WITHIN a
    // label and uniformly different ACROSS labels both refuse
    val mixed = rows.unionByName(
      Seq((6L, "A", Array(1.0f, 1.0f, 1.0f))).toDF("id", "lab", "emb"))
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.Quantize.centroidClassify(
        mixed, "id", "emb", "lab", scale = 4.0)
    }
    assert(e1.getMessage.contains("mixes embedding lengths"))
    val crossed = Seq(
      (1L, "A", Array(4.0f, 0.0f)), (2L, "B", Array(0.0f, 4.0f, 1.0f)))
      .toDF("id", "lab", "emb")
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Quantize.centroidClassify(
        crossed, "id", "emb", "lab", scale = 4.0)
    }
    assert(e2.getMessage.contains("disagree on embedding length"))
  }

  test("lorenz: hand curve with rank ties in one decile") {
    val df = Seq(("g", "a", 1L), ("g", "b", 1L), ("g", "c", 2L),
        ("g", "d", 6L)).toDF("grp", "e", "v")
    val out = Profile.lorenz(df, "grp", "e", "v")
      .orderBy("decile")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // ranks 1,1,3,4 (RANK ties) -> deciles 1,1,6,8
    assert(out === Seq(("g", 1L, 2L, 2L, 2000L),
      ("g", 6L, 3L, 4L, 4000L), ("g", 8L, 4L, 10L, 10000L)))
    // entity totals aggregate across rows before ranking
    val split = df.unionByName(
      Seq(("g", "d", 0L)).toDF("grp", "e", "v"))
    val out2 = Profile.lorenz(split, "grp", "e", "v")
      .orderBy("decile")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out2 === out)
  }

  test("schemaDrift: added/dropped columns, null and distinct deltas") {
    val a = Seq((1L, Some("x"), 10L), (2L, None, 10L), (3L, Some("y"), 20L))
      .toDF("id", "s", "v")
    val b = Seq((1L, 10L, "p"), (2L, 30L, "q"), (3L, 30L, "r"),
        (4L, 40L, "s")).toDF("id", "v", "extra")
    val out = Profile.schemaDrift(a, b)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out(("id", "n_rows")) === ((3L, 4L, 1L)))
    assert(out(("s", "present")) === ((1L, 0L, -1L)))   // dropped
    assert(out(("extra", "present")) === ((0L, 1L, 1L))) // added
    assert(out(("s", "n_nulls")) === ((1L, 0L, -1L)))
    assert(out(("v", "n_distinct")) === ((2L, 3L, 1L)))
    assert(out(("v", "n_nulls")) === ((0L, 0L, 0L)))
  }

  test("termBursts: planted one-day spike tops the report") {
    def d(i: Int) = java.sql.Date.valueOf(f"2024-01-$i%02d")
    // 'steady' appears once a day for 10 days; 'spike' 5x on day 3
    val rows = (1 to 10).map(i => (i.toLong, s"steady filler$i", d(i))) ++
      (11 to 15).map(i => (i.toLong, "spike news", d(3)))
    val out = graft.operators.TextIndex.termBursts(
        rows.toDF("id", "text", "day"), "id", "text", "day",
        minDf = 3, k = 5)
      .as[(String, Long, Long, String, Long, Long)].collect()
    val m = out.map(r => r._1 -> r).toMap
    assert(m("spike") === (("spike", 5L, 1L, "2024-01-03", 5L, 10000L)))
    assert(m("news") === (("news", 5L, 1L, "2024-01-03", 5L, 10000L)))
    assert(m("steady") === (("steady", 10L, 10L, "2024-01-01", 1L, 1000L)))
    assert(out.head._6 === 10000L) // burst order
  }

  test("classificationReport: hand confusion, margins, NULL sentinel") {
    // actual a: 3 right + 1 predicted-as-b; b: 2 right; c only ever
    // PREDICTED (never actual); one row with NULL actual AND one with
    // NULL predicted — both must land in the single __NULL__ class
    val rows: Seq[(String, String)] =
      Seq(("a", "a"), ("a", "a"), ("a", "a"), ("a", "b"),
        ("b", "b"), ("b", "b"), ("b", "c"),
        (null, "a"), ("b", null))
    val out = Eval.classificationReport(rows.toDF("act", "pred"),
        "act", "pred")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long]),
          Option(r.get(6)).map(_.asInstanceOf[Long])))).toMap
    // a: n_actual 4, n_predicted 4 (3 tp + 1 from NULL-actual), tp 3
    assert(out("a") === ((4L, 4L, 3L,
      Some(750000L), Some(750000L), Some(750000L))))
    // b: n_actual 4 (incl the NULL-predicted row), n_predicted 3, tp 2
    assert(out("b") === ((4L, 3L, 2L,
      Some(666666L), Some(500000L), Some(571428L)))) // 4e6/7
    // c: prediction-only class → n_actual 0 → NULL recall
    assert(out("c") === ((0L, 1L, 0L, Some(0L), None, Some(0L))))
    // the two NULL labels merge into ONE sentinel class row:
    // n_actual 1 (the null-actual row), n_predicted 1 (the
    // null-predicted row), tp 0 — not two rows with zeroed margins
    assert(out("__NULL__") === ((1L, 1L, 0L,
      Some(0L), Some(0L), Some(0L))))
    assert(out.size === 4)
  }

  test("mcnemar: hand discordant counts, agreement group NULL") {
    // g: b=3 (A right, B wrong), c=1 → (3−1)²·1e6/4 = 1000000
    val rows =
      Seq.fill(3)(("g", true, false)) ++ Seq(("g", false, true)) ++
        Seq.fill(5)(("g", true, true)) ++
        // z: the classifiers never disagree → NULL statistic
        Seq(("z", true, true), ("z", false, false))
    val out = Eval.mcnemar(rows.toDF("g", "a", "b"), "g",
        col("a"), col("b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(out("g") === ((9L, 3L, 1L, Some(1000000L))))
    assert(out("z") === ((2L, 0L, 0L, None)))
  }

  test("brier: perfect, inverted, and floored mid scores") {
    val rows = Seq(
      ("p", 1000000L, 1), ("p", 0L, 0),       // perfect → 0
      ("i", 0L, 1), ("i", 1000000L, 0),       // inverted → scale
      // m: (250000−0)² + (250000−1e6)² = 62.5e9 + 562.5e9 = 625e9
      // → 625e9 div (2·1e6) = 312500
      ("m", 250000L, 0), ("m", 250000L, 1))
    val out = Eval.brier(rows.toDF("g", "s", "l"), "g", "s", "l")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("p") === ((2L, 1L, 0L)))
    assert(out("i") === ((2L, 1L, 1000000L)))
    assert(out("m") === ((2L, 1L, 312500L)))
  }

  test("ece: mass-weighted and max bin gaps, hand bins") {
    // bin 0 (scores < 500k with nBins=2): n=2, mean 100000, pos 0/2
    //   → gap = |0 − 100000| = 100000
    // bin 1: n=3, mean 800000, pos 3/3 → gap = |1e6 − 800000| = 200000
    // ece = (2·100000 + 3·200000) div 5 = 160000 ; mce = 200000
    val rows = Seq(("g", 100000L, 0), ("g", 100000L, 0),
      ("g", 800000L, 1), ("g", 800000L, 1), ("g", 800000L, 1))
    val out = Eval.ece(rows.toDF("g", "s", "l"), "g", "s", "l",
        nBins = 2)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out === Array(("g", 5L, 2L, 160000L, 200000L)))
  }

  test("kendall: brute-force pair parity with ties, cell guard trips") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      ("g" + (i % 2), rnd.nextInt(8).toLong,
        (rnd.nextInt(8) / 2).toLong) // correlated-ish tied domains
    }
    val out = Eval.kendall(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6),
          Option(r.get(7)).map(_.asInstanceOf[Long])))).toMap
    for (g <- Seq("g0", "g1")) {
      val grp = rows.filter(_._1 == g).map(t => (t._2, t._3))
      var (nc, nd, tx, ty, txy) = (0L, 0L, 0L, 0L, 0L)
      for (i <- grp.indices; j <- i + 1 until grp.size) {
        val ((xa, ya), (xb, yb)) = (grp(i), grp(j))
        if (xa == xb && ya == yb) txy += 1
        else if (xa == xb) tx += 1
        else if (ya == yb) ty += 1
        else if ((xa < xb) == (ya < yb)) nc += 1
        else nd += 1
      }
      val n = grp.size.toLong
      val tau =
        if (nc >= nd) 1000000L * (nc - nd) / (n * (n - 1) / 2)
        else -(1000000L * (nd - nc) / (n * (n - 1) / 2))
      assert(out(g) === ((n, nc, nd, tx, ty, txy, Some(tau))))
    }
    // single-row group → n < 2 → NULL tau (and zero pair counts)
    val one = Eval.kendall(Seq(("s", 1L, 1L)).toDF("g", "x", "y"),
      "g", "x", "y").collect().head
    assert(one.getLong(1) === 1L && one.isNullAt(7))
    // quadratic surface fail-fast: 100 distinct cells in one group
    // against a 50-cell budget REQUIREs before any pair join runs
    val wide = (1 to 100).map(i => ("w", i.toLong, i.toLong))
    val e = intercept[IllegalArgumentException] {
      Eval.kendall(wide.toDF("g", "x", "y"), "g", "x", "y",
        maxCells = 50L)
    }
    assert(e.getMessage.contains("kendall") &&
      e.getMessage.contains("Pre-quantize"))
  }
}
