package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Eval, Funnels, Multimodal, Survival}

/** Round-10 inference operators: Shapley attribution, interpolating
  * as-of, Aalen–Johansen competing risks, Cochran–Armitage trend,
  * CUPED — hand-computed cases plus guard trips. */
class InferenceSpec extends SparkSpec {
  import spark.implicits._

  // ---------- Shapley attribution ----------

  test("shapleyAttribution matches the hand-solved 2-channel game") {
    // converter journeys: {A}×2, {A,B}×1, {B}×1 →
    // v(∅)=0, v({A})=2, v({B})=1, v({A,B})=4
    // φ_A = ½(v(A)−v(∅)) + ½(v(AB)−v(B)) = ½·2 + ½·3 = 2.5
    // φ_B = ½·1 + ½·2 = 1.5 ; efficiency 2.5+1.5 = v(AB) = 4
    val touches = Seq(
      (1L, "A"), (2L, "A"), (3L, "A"), (3L, "B"), (4L, "B"),
      (3L, "A"), // duplicate touch — must not change the set
      (9L, "A")  // non-converter touch — not in v, but counts channels
    ).toDF("user_id", "channel")
    val conv = Seq(1L, 2L, 3L, 4L, 7L) // 7 converts with NO touches
      .toDF("user_id")
    val got = Funnels.shapleyAttribution(touches, "user_id", "channel",
        conv).as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq("A", "B"))
    val a = got(0); val b = got(1)
    assert(a._3 == 2500000L && b._3 == 1500000L)
    // credit: 2.5/4 = 0.625, 1.5/4 = 0.375
    assert(a._4 == 6250L && b._4 == 3750L)
    // n_converters touching the channel
    assert(a._2 == 3L && b._2 == 2L)
  }

  test("shapleyAttribution is order-independent and trips its budget") {
    val touches = (1 to 30).map(i => (i.toLong, s"ch${i % 20}"))
      .toDF("user_id", "channel")
    val conv = (1 to 30).map(_.toLong).toDF("user_id")
    val e = intercept[IllegalArgumentException] {
      Funnels.shapleyAttribution(touches, "user_id", "channel", conv,
        maxChannels = 8)
    }
    assert(e.getMessage.contains("coalition budget"))
  }

  // ---------- interpolating as-of ----------

  test("AsOf.lerp brackets, floors, and refuses to extrapolate") {
    val samples = Seq(
      ("k1", 0L, 0L), ("k1", 3L, 10L),     // rising, non-even division
      ("k2", 0L, 10L), ("k2", 3L, 0L),     // falling
      ("k3", 5L, 7L),                      // single sample
      ("k4", 2L, 4L), ("k4", 2L, 9L)       // duplicate ts → max wins
    ).toDF("k", "ts", "v")
    val probes = Seq(
      ("k1", 1L, "in"), ("k1", 3L, "on"), ("k1", 4L, "after"),
      ("k1", -1L, "before"),
      ("k2", 1L, "in"),
      ("k3", 5L, "on"), ("k3", 6L, "after"),
      ("k4", 2L, "on"),
      ("k5", 1L, "nosamples")
    ).toDF("k", "ts", "tag")
    val got = AsOf.lerp(probes, samples, Seq("k"), "ts", "v")
      .select(col("k"), col("tag"), col("value_lerp"))
      .as[(String, String, Option[Long])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("k1", "in")).contains(3L))   // floor(10·1/3) = 3
    assert(got(("k1", "on")).contains(10L))  // exact hit
    assert(got(("k1", "after")).isEmpty)     // no right bracket
    assert(got(("k1", "before")).isEmpty)    // no left bracket
    assert(got(("k2", "in")).contains(7L))   // 10 − floor(10·1/3) = 7
    assert(got(("k3", "on")).contains(7L))
    assert(got(("k3", "after")).isEmpty)
    assert(got(("k4", "on")).contains(9L))   // dedup keeps max
    assert(got(("k5", "nosamples")).isEmpty)
  }

  // ---------- Aalen–Johansen ----------

  test("aalenJohansen matches the hand curve and conserves mass") {
    // g: t=1 cause A (n=4) → S 750000, cif_A 250000
    //    t=2 cause B (n=3) → cif_B 250000, S 500000
    //    t=3 censor (n=2) → no output row
    //    t=4 cause A (n=1) → cif_A 250000+500000 = 750000, S 0
    val df = Seq(
      ("g", 1L, Some("A")), ("g", 2L, Some("B")),
      ("g", 3L, None), ("g", 4L, Some("A"))
    ).toDF("g", "dur", "cause")
    val got = Survival.aalenJohansen(df, "g", "dur", "cause")
      .as[(String, Long, String, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._2, r._3))
    assert(got.toSeq == Seq(
      ("g", 1L, "A", 4L, 1L, 750000L, 250000L),
      ("g", 2L, "B", 3L, 1L, 500000L, 250000L),
      ("g", 4L, "A", 1L, 1L, 0L, 750000L)))
  }

  test("aalenJohansen: single cause ≈ 1 − KM, ties share one n_risk") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      ("g", rnd.nextInt(12).toLong,
        if (rnd.nextInt(3) == 0) None else Some("A"))
    }
    val df = rows.toDF("g", "dur", "cause")
    val aj = Survival.aalenJohansen(df, "g", "dur", "cause")
      .select("t", "surv_fp", "cif_fp")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val steps = aj.length
    // mass conservation: cif_A + S == scale, up to one floor ulp/step
    for ((_, s, cif) <- aj) {
      assert(cif + s <= 1000000L)
      assert(cif + s >= 1000000L - steps)
    }
    // parity with KM on the same data (all-cause = the single cause)
    val km = Survival.kaplanMeier(
        df.withColumn("ev", when(col("cause").isNotNull, 1).otherwise(0)),
        "g", "dur", "ev")
      .filter(col("n_event") > 0)
      .select("t", "surv_fp").as[(Long, Long)].collect().toMap
    for ((t, s, _) <- aj) assert(km(t) == s)
  }

  // ---------- Cochran–Armitage ----------

  test("trendTest matches the declared procedure and the true z²") {
    // doses 1,2,3 with n_i = 4 each; successes r_i = 0, 2, 4
    // n=12, R=6, Σwr = 16, Σwn = 24, Σw²n = 56, T_num = 48
    // true z² = T_num²(n−1)/(R(n−R)(nΣw²n−(Σwn)²)) = 48²·11/(36·96)
    val rows = for {
      w <- 1 to 3; i <- 1 to 4
    } yield ("exp", w.toLong, i <= (w - 1) * 2)
    val got = Eval.trendTest(rows.toDF("g", "w", "s"), "g", col("w"),
        col("s")).as[(String, Long, Long, Long, Option[Long])]
      .collect().head
    // the declared fp procedure, replayed sequentially in BigInt
    val (n, r, swr, sw, sww) =
      (BigInt(12), BigInt(6), BigInt(16), BigInt(24), BigInt(56))
    val S = BigInt(1000000)
    val tnum = n * swr - r * sw
    val tFp = S * tnum / (n * n)
    val v1 = S * (r * (n - r)) / (n * n)
    val v2 = S * (n * sww - sw * sw) / (n * n)
    val nf = S * (n - 1) / n
    val z2 = tFp * tFp * nf * n / v1 / v2
    assert(got._1 == "exp" && got._2 == 12L && got._3 == 6L)
    assert(got._4 == tFp.toLong)
    assert(got._5.contains(z2.toLong))
    // and the fp result approximates the true χ² within floor slack
    val trueZ2Fp = S * tnum * tnum * (n - 1) /
      (r * (n - r) * (n * sww - sw * sw))
    assert((z2 - trueZ2Fp).abs <= 300)
  }

  test("trendTest: degenerate groups yield NULL z², signed t") {
    val df = Seq(
      ("allpos", 1L, true), ("allpos", 2L, true),   // R = n → v1 = 0
      ("const", 5L, true), ("const", 5L, false),    // constant score
      ("down", 1L, true), ("down", 1L, true),
      ("down", 2L, false), ("down", 2L, false)      // negative trend
    ).toDF("g", "w", "s")
    val got = Eval.trendTest(df, "g", col("w"), col("s"))
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("allpos")._5.isEmpty)
    assert(got("const")._5.isEmpty)
    assert(got("down")._4 < 0 && got("down")._5.nonEmpty)
  }

  // ---------- CUPED ----------

  test("cuped removes a perfectly explanatory covariate") {
    // y = 2x exactly → θ = 2, every variant's adjusted mean equals
    // the pooled ȳ (all between-variant difference was covariate)
    val df = Seq(
      ("e", "a", 20L, 10L), ("e", "a", 40L, 20L),
      ("e", "b", 60L, 30L), ("e", "b", 80L, 40L)
    ).toDF("g", "variant", "y", "x")
    val got = Eval.cuped(df, "g", "variant", col("y"), col("x"))
      .as[(String, String, Long, Long, Option[Long], Long)]
      .collect().sortBy(_._2)
    assert(got.forall(_._5.contains(2000000L))) // θ = 2.0
    // pooled ȳ = 50; both adjusted means = 50·10^6
    assert(got.map(_._6).toSeq == Seq(50000000L, 50000000L))
    // raw means differ (30 vs 70) — the adjustment did the work
    assert(got.map(_._4).toSeq == Seq(30000000L, 70000000L))
  }

  test("cuped: zero-variance covariate degrades to raw means") {
    val df = Seq(
      ("e", "a", 10L, 5L), ("e", "a", 30L, 5L),
      ("e", "b", 20L, 5L)
    ).toDF("g", "variant", "y", "x")
    val got = Eval.cuped(df, "g", "variant", col("y"), col("x"))
      .as[(String, String, Long, Long, Option[Long], Long)]
      .collect().sortBy(_._2)
    assert(got.forall(_._5.isEmpty))
    assert(got.map(r => r._6 == r._4).forall(identity))
  }

  // ---------- Poisson bootstrap ----------

  test("poissonBootstrap: constant data collapses the interval") {
    val df = (1 to 300).map(i => ("g", i.toLong, 42L))
      .toDF("g", "id", "x")
    val got = Eval.poissonBootstrap(df, "g", "id", col("x"))
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(got == (("g", 300L, 42000000L, 48L, 42000000L, 42000000L)))
  }

  test("poissonBootstrap: deterministic, straddling, √n-narrowing") {
    val rnd = new scala.util.Random(5)
    val rows =
      (1 to 2000).map(i => ("big", i.toLong, rnd.nextInt(1000).toLong)) ++
      (1 to 40).map(i => ("small", 10000L + i, rnd.nextInt(1000).toLong))
    val df = rows.toDF("g", "id", "x")
    val run1 = Eval.poissonBootstrap(df, "g", "id", col("x"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val run2 = Eval.poissonBootstrap(df, "g", "id", col("x"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(run1 == run2) // portable draws ⇒ bitwise repeatable
    for (g <- Seq("big", "small")) {
      val (_, _, mean, bEff, lo, hi) = run1(g)
      assert(bEff == 48L)
      assert(lo <= mean && mean <= hi)
    }
    val wBig = run1("big")._6 - run1("big")._5
    val wSmall = run1("small")._6 - run1("small")._5
    assert(wBig < wSmall, s"CI width $wBig !< $wSmall")
    val e = intercept[IllegalArgumentException] {
      Eval.poissonBootstrap(df, "g", "id", col("x"), b = 1)
    }
    assert(e.getMessage.contains("replicate count"))
  }

  // ---------- conformal calibration ----------

  test("conformal: hand thresholds and the coverage guarantee") {
    val df = (1 to 10).map(i => ("g", i.toLong)).toDF("g", "s")
    val at50 = Eval.conformal(df, "g", "s", alphaBp = 5000)
      .as[(String, Long, Long, Long)].collect().head
    assert(at50 == (("g", 10L, 6L, 6000L))) // ⌈11·0.5⌉ = 6th smallest
    val at10 = Eval.conformal(df, "g", "s", alphaBp = 1000)
      .as[(String, Long, Long, Long)].collect().head
    assert(at10 == (("g", 10L, 10L, 10000L))) // ⌈11·0.9⌉ = 10 (capped)
    // finite-sample guarantee on random data: cov ≥ rank/n
    val rnd = new scala.util.Random(17)
    val big = (1 to 500).map(_ => (s"g${rnd.nextInt(3)}",
      rnd.nextInt(100000).toLong)).toDF("g", "s")
    for (alpha <- Seq(500L, 1000L, 2500L)) {
      val got = Eval.conformal(big, "g", "s", alphaBp = alpha)
        .as[(String, Long, Long, Long)].collect()
      for ((_, n, _, cov) <- got) {
        val k = math.min(n, ((n + 1) * (10000 - alpha) + 9999) / 10000)
        assert(cov >= k * 10000 / n, s"alpha $alpha n $n cov $cov")
      }
    }
  }

  // ---------- strict-order funnel ----------

  test("windowFunnelStrictOrder: intervening events break the chain") {
    val steps = Seq("A", "B", "C")
    val df = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "B"), (1L, 30L, 3L, "C"),
      (2L, 10L, 4L, "A"), (2L, 20L, 5L, "X"), (2L, 30L, 6L, "B"),
      (3L, 10L, 7L, "A"), (3L, 20L, 8L, "B"), (3L, 30L, 9L, "A"),
      (3L, 40L, 10L, "B"), (3L, 50L, 11L, "C"),
      (4L, 10L, 12L, "A"), (4L, 500L, 13L, "B"), // window violation
      (5L, 10L, 14L, "A"), (5L, 20L, 15L, "B"),
      (5L, 100L, 16L, "A"), (5L, 110L, 17L, "B") // tie → earliest
    ).toDF("u", "ts", "id", "et")
    val got = Funnels.windowFunnelStrictOrder(df, "u", "ts", "id",
        "et", steps, windowUs = 100L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(got(1L) == ((3L, 10L)))
    assert(got(2L) == ((1L, 10L)))  // X broke the chain
    assert(got(3L) == ((3L, 30L)))  // second anchor completes
    assert(got(4L) == ((1L, 10L)))  // B outside the window
    assert(got(5L) == ((2L, 10L)))  // stage tie → earliest anchor
    // contrast: the LOOSE funnel lets user 2 reach stage 2
    val loose = Funnels.windowFunnel(df, "u", "ts", "et", steps, 100L)
      .select("u", "stage").as[(Long, Long)].collect().toMap
    assert(loose(2L) == 2L && got(2L)._1 == 1L)
  }

  // ---------- CDC apply ----------

  test("Cdc.apply: upsert chains, deletes, inserts, tie-breaks") {
    import graft.core.Cdc
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (5L, "e", 50L)).toDF("k", "seg", "bal")
    val changes = Seq(
      (1L, "U", 100L, 1L, "a2", 11L),
      (1L, "U", 200L, 2L, "a3", 12L),   // latest wins
      (2L, "D", 100L, 3L, "x", 0L),     // delete
      (4L, "I", 100L, 4L, "d", 40L),    // insert new key
      (5L, "U", 100L, 5L, "e1", 51L),   // same-ts tie:
      (5L, "U", 100L, 6L, "e2", 52L),   //   higher id wins
      (6L, "I", 100L, 7L, "f", 60L),
      (6L, "D", 200L, 8L, "f", 60L),    // insert then delete → gone
      (7L, "D", 100L, 9L, "g", 70L),
      (7L, "I", 200L, 10L, "g2", 71L)   // delete then insert → alive
    ).toDF("k", "op", "ts", "cid", "seg", "bal")
    val got = Cdc.apply(base, changes, Seq("k"), "op", "ts", "cid")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "a3", 12L), (3L, "c", 30L), (4L, "d", 40L),
      (5L, "e2", 52L), (7L, "g2", 71L)))
  }

  test("Cdc.apply ≡ sequential per-key fold on random logs") {
    import graft.core.Cdc
    val rnd = new scala.util.Random(31)
    val baseRows = (1L to 20L).map(k => (k, s"b$k", k * 100))
    val changeRows = (1 to 300).map { i =>
      (rnd.nextInt(25).toLong + 1, Seq("I", "U", "D")(rnd.nextInt(3)),
        rnd.nextInt(50).toLong + 1, i.toLong, s"c$i", i.toLong * 7)
    }
    val got = Cdc.apply(baseRows.toDF("k", "seg", "bal"),
        changeRows.toDF("k", "op", "ts", "cid", "seg", "bal"),
        Seq("k"), "op", "ts", "cid")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    val want = scala.collection.mutable.Map.empty[Long, (String, Long)]
    baseRows.foreach { case (k, s, b) => want(k) = (s, b) }
    changeRows.sortBy(c => (c._3, c._4)).foreach {
      case (k, "D", _, _, _, _) => want.remove(k)
      case (k, _, _, _, s, b) => want(k) = (s, b)
    }
    assert(got == want.toMap)
  }

  // ---------- DP release ----------

  test("dpCounts: bounded, deterministic, calibrated geometric noise") {
    import graft.operators.Profile
    val rnd = new scala.util.Random(29)
    val rows = (1 to 5000).map(_ => (s"d${rnd.nextInt(300)}", 1))
    val df = rows.toDF("cell", "one")
    val truth = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val rel1 = Profile.dpCounts(df, Seq("cell"), "s1")
      .as[(String, Long)].collect().toMap
    val rel2 = Profile.dpCounts(df, Seq("cell"), "s1")
      .as[(String, Long)].collect().toMap
    assert(rel1 == rel2) // one seed = one release, bitwise
    val noises = rel1.map { case (c, n) => n - truth(c) }
    assert(noises.forall(k => k >= -10 && k <= 10)) // ±t truncation
    val meanAbs = noises.map(math.abs).sum.toDouble / noises.size
    assert(meanAbs > 0.9 && meanAbs < 1.8) // E|noise| = 4/3 at ε = ln 2
    assert(noises.exists(_ < 0) && noises.exists(_ > 0))
    val relB = Profile.dpCounts(df, Seq("cell"), "s2")
      .as[(String, Long)].collect().toMap
    assert(relB != rel1) // fresh seed, fresh draws
  }

  // ---------- WAV codec ----------

  test("encodeWav → decodeWav roundtrips exact PCM16 stats") {
    val rnd = new scala.util.Random(3)
    val samples = Array.fill(777)(rnd.nextInt(65536) - 32768)
    val st = Multimodal.decodeWav(
      Multimodal.encodeWav(samples, 44100, 2)).get
    assert(st.sampleRate == 44100 && st.channels == 2 && st.bits == 16)
    assert(st.nSamples == 777L)
    assert(st.sMin == samples.min && st.sMax == samples.max)
    assert(st.sumAbs == samples.map(v => math.abs(v).toLong).sum)
    assert(st.sumSq == samples.map(v => v.toLong * v).sum)
    val zc = samples.sliding(2).count(p => p(0).toLong * p(1) < 0)
    assert(st.zeroCross == zc.toLong)
  }

  test("decodeWav: 8-bit recenter, extra chunks, corrupt payloads") {
    // 8-bit: stored unsigned, decoded re-centered to −128..127
    val s8 = Array(0, 255, 128, 64)
    val st8 = Multimodal.decodeWav(
      Multimodal.encodeWav(s8.map(_ - 128), 8000, 1, bits = 8)).get
    assert(st8.bits == 8 && st8.nSamples == 4)
    assert(st8.sMin == -128 && st8.sMax == 127)
    // a LIST chunk between fmt and data must be skipped, odd-sized
    // chunks are word-aligned
    val base = Multimodal.encodeWav(Array(5, -5, 7), 8000, 1)
    val bb = java.nio.ByteBuffer.allocate(base.length + 8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(base, 0, 36) // RIFF header + fmt chunk
    bb.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](1, 2, 3, 0)) // 3 bytes + pad
    bb.put(base, 36, base.length - 36)
    val withList = bb.array()
    // patch the RIFF size field
    java.nio.ByteBuffer.wrap(withList)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, withList.length - 8)
    val stL = Multimodal.decodeWav(withList).get
    assert(stL.nSamples == 3 && stL.sMin == -5 && stL.sMax == 7)
    // corrupt payloads degrade to None, never throw
    assert(Multimodal.decodeWav(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeWav("not a wav at all, truly".getBytes).isEmpty)
    assert(Multimodal.decodeWav(base.take(40)).isEmpty)
    val badFmt = base.clone(); badFmt(20) = 3 // audioFormat = 3 (float)
    assert(Multimodal.decodeWav(badFmt).isEmpty)
  }

  // ---------- Wasserstein-1 ----------

  test("wasserstein1: exact shift distance where KS saturates") {
    def df(rows: (String, Long, Boolean)*) =
      rows.toSeq.toDF("g", "v", "a")
    // identical slices → 0
    val same = df(("g", 1L, true), ("g", 1L, false),
      ("g", 5L, true), ("g", 5L, false))
    assert(Eval.wasserstein1(same, "g", "v", col("a"))
      .as[(String, Long, Long, Long)].collect().head._4 == 0L)
    // B is A shifted by 10 → W1 = 10·scale, by 1 → 1·scale; KS gives
    // scale (total CDF gap) for BOTH — W1 sees the magnitude
    def shifted(d: Long) = df(("g", 0L, true), ("g", 0L, true),
      ("g", d, false), ("g", d, false))
    val w10 = Eval.wasserstein1(shifted(10), "g", "v", col("a"))
      .as[(String, Long, Long, Long)].collect().head
    val w1 = Eval.wasserstein1(shifted(1), "g", "v", col("a"))
      .as[(String, Long, Long, Long)].collect().head
    assert(w10 == (("g", 2L, 2L, 10000000L)))
    assert(w1 == (("g", 2L, 2L, 1000000L)))
    val ks = Eval.ksTest(shifted(10), "g", "v", col("a"))
      .select("d_fp").as[Long].collect().head
    assert(ks == 1000000L) // saturated — no magnitude signal
    // one-sided groups drop
    val oneSided = df(("h", 1L, true), ("h", 2L, true))
    assert(Eval.wasserstein1(oneSided, "g", "v", col("a")).count() == 0)
  }

  // ---------- rank-biased overlap ----------

  test("rboAtK: identical, reversed, disjoint, depth-cut rankings") {
    import graft.operators.Fusion
    def rk(rows: (String, String, Int)*) = rows.toSeq.toDF("q", "d", "r")
    // identical @3: Σ scale/2^d = 875000
    val ident = rk(("q1", "x", 1), ("q1", "y", 2), ("q1", "z", 3))
    assert(Fusion.rboAtK(ident, ident, "q", "d", "r", k = 3)
      .as[(String, Long)].collect().head._2 == 875000L)
    // reversed pair @2: overlap only at depth 2 → scale·2/(2·4)
    val ab = rk(("q1", "x", 1), ("q1", "y", 2))
    val ba = rk(("q1", "y", 1), ("q1", "x", 2))
    assert(Fusion.rboAtK(ab, ba, "q", "d", "r", k = 2)
      .as[(String, Long)].collect().head._2 == 250000L)
    // disjoint → 0 row still emitted; ranks beyond k ignored
    val other = rk(("q1", "u", 1), ("q1", "x", 9))
    val got = Fusion.rboAtK(ab, other, "q", "d", "r", k = 2)
      .as[(String, Long)].collect().head
    assert(got == (("q1", 0L)))
  }

  // ---------- sequential patterns ----------

  test("frequentSubsequences: greedy ladder matches hand supports") {
    // u1: A B A C ; u2: B A C ; u3: A C ; u4: A,B simultaneous
    val df = Seq(
      (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "A"), (1L, 40L, "C"),
      (2L, 10L, "B"), (2L, 20L, "A"), (2L, 30L, "C"),
      (3L, 10L, "A"), (3L, 20L, "C"),
      (4L, 10L, "A"), (4L, 10L, "B")
    ).toDF("u", "ts", "et")
    val got = graft.streaming.Paths
      .frequentSubsequences(df, "u", "ts", "et")
      .as[(String, Int, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got("A") == 4L && got("B") == 3L && got("C") == 3L)
    assert(got("A>C") == 3L)
    assert(got("B>A>C") == 2L) // u1 greedy: B@20 → A@30 → C@40; u2
    assert(got("A>B") == 1L)   // u2's B precedes its first A; u4 ties
    assert(!got.contains("C>A"))
  }

  test("frequentSubsequences: greedy ≡ brute-force existence") {
    val rnd = new scala.util.Random(13)
    val alpha = Vector("a", "b", "c", "d")
    val rows = for {
      u <- 1 to 25
      i <- 1 to rnd.nextInt(8) + 1
    } yield (u.toLong, i.toLong * 10, alpha(rnd.nextInt(alpha.size)))
    val got = graft.streaming.Paths
      .frequentSubsequences(rows.toDF("u", "ts", "et"), "u", "ts", "et")
      .as[(String, Int, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    // brute force: a pattern is contained iff an increasing index
    // chain spells it
    val byUser = rows.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toVector).toMap
    def contains(seq: Vector[String], p: Vector[String]): Boolean = {
      var i = 0
      for (s <- seq if i < p.size && s == p(i)) i += 1
      i == p.size
    }
    val pats = alpha.map(Vector(_)) ++
      (for (a <- alpha; b <- alpha) yield Vector(a, b)) ++
      (for (a <- alpha; b <- alpha; c <- alpha) yield Vector(a, b, c))
    for (p <- pats) {
      val n = byUser.values.count(contains(_, p))
      assert(got.getOrElse(p.mkString(">"), 0L) == n.toLong,
        s"pattern ${p.mkString(">")}")
    }
  }

  test("frequentSubsequences trips the alphabet budget") {
    val df = (1 to 20).map(i => (1L, i.toLong, s"t$i"))
      .toDF("u", "ts", "et")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.Paths.frequentSubsequences(df, "u", "ts", "et",
        maxTypes = 8)
    }
    assert(e.getMessage.contains("fanout budget"))
  }

  // ---------- inclusion dependencies ----------

  test("inclusionAudit finds subsets, partial overlaps, and dups") {
    import graft.operators.Profile
    val a = Seq(1L, 2L, 3L, 3L).toDF("k") // dup collapses
    val b = Seq(2L, 3L, 4L, 5L).toDF("k")
    val c = Seq(Some(1L), Some(2L), Some(3L), None).toDF("k") // NULL out
    val got = Profile.inclusionAudit(Seq(
        ("A", a, "k"), ("B", b, "k"), ("C", c, "k")))
      .as[(String, String, Long, Long, Option[Long], Boolean)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got(("A", "B")) == (("A", "B", 3L, 2L, Some(6666L), false)))
    assert(got(("B", "A")) == (("B", "A", 4L, 2L, Some(5000L), false)))
    assert(got(("A", "C"))._6 && got(("C", "A"))._6) // mutual subset
    assert(got(("C", "B")) == (("C", "B", 3L, 2L, Some(6666L), false)))
    assert(got.size == 6)
    val e = intercept[IllegalArgumentException] {
      Profile.inclusionAudit(Seq(("A", a, "k"), ("A", b, "k")))
    }
    assert(e.getMessage.contains("unique"))
  }

  test("encodeY4m → decodeY4m roundtrips exact luma stats") {
    val rnd = new scala.util.Random(19)
    val frames = Seq.fill(5)(Array.fill(16 * 8)(rnd.nextInt(256).toByte))
    val st = Multimodal.decodeY4m(
      Multimodal.encodeY4m(16, 8, frames)).get
    assert(st.width == 16 && st.height == 8 && st.nFrames == 5)
    val all = frames.flatten.map(_ & 0xff)
    assert(st.ySum == all.map(_.toLong).sum)
    assert(st.yMin == all.min && st.yMax == all.max)
    // frame headers may carry parameters; C444 changes plane sizes
    val hdr = "YUV4MPEG2 W2 H2 F25:1 C444\n".getBytes("US-ASCII")
    val f = "FRAME Xtag\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40) ++ Array.fill[Byte](8)(99)
    val st444 = Multimodal.decodeY4m(hdr ++ f ++ f).get
    assert(st444.nFrames == 2 && st444.ySum == 200L &&
      st444.yMin == 10 && st444.yMax == 40)
    // corrupt payloads degrade to None
    assert(Multimodal.decodeY4m("not video".getBytes).isEmpty)
    assert(Multimodal.decodeY4m(
      Multimodal.encodeY4m(4, 4, Seq(new Array[Byte](16)))
        .dropRight(3)).isEmpty) // truncated frame
    assert(Multimodal.decodeY4m(
      "YUV4MPEG2 W4 H4 C999\nFRAME\n".getBytes).isEmpty)
    // undecodable rows keep their row in the frame API
    val rows = Seq(
      (1L, Multimodal.encodeY4m(4, 4, Seq(Array.fill[Byte](16)(7)))),
      (2L, "garbage".getBytes)
    ).toDF("asset_id", "content")
    val got = Multimodal.y4mFeatures(rows)
      .select("asset_id", "decode_ok", "n_frames", "y_sum")
      .as[(Long, Boolean, Option[Int], Option[Long])].collect()
      .sortBy(_._1)
    assert(got(0) == ((1L, true, Some(1), Some(112L))))
    assert(got(1) == ((2L, false, None, None)))
  }

  test("wavFeatures keeps undecodable rows with decode_ok = false") {
    val rows = Seq(
      (1L, Multimodal.encodeWav(Array(1, -2, 3), 8000, 1)),
      (2L, "garbage".getBytes)
    ).toDF("asset_id", "content")
    val got = Multimodal.wavFeatures(rows)
      .select("asset_id", "decode_ok", "n_samples")
      .as[(Long, Boolean, Option[Long])].collect().sortBy(_._1)
    assert(got(0) == ((1L, true, Some(3L))))
    assert(got(1) == ((2L, false, None)))
  }
}
