package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Ivf, Similarity, Splits}
import graft.operators.Profile

/** Specs for the round-4 sampling/export/winsorize/incremental-dedup
  * operators: exact-size guarantees, determinism, plan shape, and
  * plain-Scala reference parity.
  */
class SamplingProfileSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 100L).map { i =>
    (i, s"doc text ${"x" * (i % 13).toInt} $i", s"lang${i % 4}")
  }.toDF("doc_id", "text", "lang")

  test("samplePerGroup returns exactly min(k, |group|) rows per group") {
    val out = Splits.samplePerGroup(corpus, "lang", "doc_id", k = 7)
    val sizes = out.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(sizes.values.toSet == Set(7L)) // 25 docs per lang, k=7
    val tiny = Splits.samplePerGroup(corpus.filter($"doc_id" < 2),
      "lang", "doc_id", k = 7)
    assert(tiny.count() == 2) // groups smaller than k keep everything
  }

  test("samplePerGroup prefixes nest and seeds are independent draws") {
    val k7 = Splits.samplePerGroup(corpus, "lang", "doc_id", k = 7)
      .select("doc_id").as[Long].collect().toSet
    val k3 = Splits.samplePerGroup(corpus, "lang", "doc_id", k = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(k3.subsetOf(k7)) // rank <= 3 is a prefix of rank <= 7
    val seeded = Splits.samplePerGroup(corpus, "lang", "doc_id", k = 7,
      seed = "other").select("doc_id").as[Long].collect().toSet
    assert(seeded != k7) // a different seed is a different draw
    assert(seeded.size == k7.size)
  }

  test("shardStats conserves rows and bytes; shards are in range") {
    val stats = Splits.shardStats(corpus, "doc_id", "text",
      nShards = 8, seed = "s")
      .as[(Long, Long, Long)].collect()
    assert(stats.map(_._2).sum == 100L)
    assert(stats.forall(s => s._1 >= 0 && s._1 < 8))
    val totalBytes = corpus.select(sum(octet_length($"text")))
      .as[Long].head()
    assert(stats.map(_._3).sum == totalBytes)
  }

  test("exportShuffled is a deterministic permutation with one exchange") {
    val a = Splits.exportShuffled(corpus, "doc_id", nShards = 4, seed = "s")
    val b = Splits.exportShuffled(corpus, "doc_id", nShards = 4, seed = "s")
    val rowsA = a.select("doc_id", "shard").collect().map(r =>
      (r.getLong(0), r.getLong(1)))
    val rowsB = b.select("doc_id", "shard").collect().map(r =>
      (r.getLong(0), r.getLong(1)))
    assert(rowsA.toSeq == rowsB.toSeq) // byte-identical across re-runs
    assert(rowsA.map(_._1).sorted.toSeq == (0L until 100L)) // permutation
    // the shard column matches the standalone assignment expression
    val byCol = corpus.select($"doc_id",
      Splits.shardOf($"doc_id", 4, "s").as("s2")).as[(Long, Long)]
      .collect().toMap
    assert(rowsA.forall { case (id, sh) => byCol(id) == sh })
    // exactly one shuffle: the repartition exchange
    val exchanges = a.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1)
  }

  test("winsorize matches a plain-Scala discrete-percentile reference") {
    val values = Seq(1L, 2L, 2L, 3L, 5L, 8L, 13L, 21L, 34L, 1000L)
    val df = values.zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }
      .toDF("id", "g", "v")
    val (loBp, hiBp) = (1000, 9000)
    def rankAt(bp: Int, n: Int): Int =
      math.max(1, ((n.toLong * bp + 9999L) / 10000L).toInt)
    val sorted = values.sorted
    val lo = sorted(rankAt(loBp, values.size) - 1)
    val hi = sorted(rankAt(hiBp, values.size) - 1)
    val expect = values.zipWithIndex.map { case (v, i) =>
      (i.toLong, math.min(math.max(v, lo), hi))
    }.toSet
    val got = Profile.winsorize(df, "g", "v", loBp, hiBp)
      .select("id", "winsorized").as[(Long, Long)].collect().toSet
    assert(got == expect)
    assert(lo == 1L && hi == 34L) // p10 → rank 1, p90 → rank 9
  }

  test("winsorize is a no-op on degenerate and in-range groups") {
    val df = Seq((1L, "a", 42L), (2L, "b", 7L), (3L, "b", 9L))
      .toDF("id", "g", "v")
    val out = Profile.winsorize(df, "g", "v", 100, 9900)
      .select("id", "winsorized").as[(Long, Long)].collect().toMap
    // singleton group clamps to its own value; a 2-row group's p1/p99
    // ranks are 1 and 2 → both rows keep their values
    assert(out == Map(1L -> 42L, 2L -> 7L, 3L -> 9L))
  }

  test("minhashProbePortable equals the cross-parity slice of full LSH") {
    val docs = (0L until 30L).map { i =>
      val words = (0 until 12).map(k => s"w${(i / 3 + k) % 9}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val full = Dedup.minhashLshPortable(docs, "doc_id", "text",
      n = 3, numPerms = 8, bands = 4, minMatch = 4)
      .as[(Long, Long, Long)].collect().toSet
    val crossParity = full.collect {
      case (a, b, m) if a % 2 == 0 && b % 2 == 1 => (b, a, m)
      case (a, b, m) if a % 2 == 1 && b % 2 == 0 => (a, b, m)
    }
    val probed = Dedup.minhashProbePortable(
      docs.filter($"doc_id" % 2 === 0), docs.filter($"doc_id" % 2 === 1),
      "doc_id", "text", n = 3, numPerms = 8, bands = 4, minMatch = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(probed == crossParity)
    assert(probed.nonEmpty) // the construction plants cross-parity dups
  }

  test("mmrRerank: pure-relevance at lambda=1, demotes near-dups below") {
    // candidates for one query: two near-identical high scorers plus
    // an orthogonal medium scorer
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0.999f, 0.001f, 0f, 0f)), // near-copy of 1
      (3L, Array(0f, 1f, 0f, 0f)),
      (9L, Array(0.7f, 0.7f, 0f, 0f))      // the query itself
    ).toDF("vec_id", "embedding")
    val cands = Seq((9L, 1L, 0.95), (9L, 2L, 0.94), (9L, 3L, 0.80))
      .toDF("query_id", "neighbor_id", "score")
    val pure = graft.operators.Similarity.mmrRerank(
      cands, vecs, "vec_id", "embedding", k = 3, lambda = 1.0)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(pure == Seq(1L, 2L, 3L)) // lambda=1 → plain score order
    val diverse = graft.operators.Similarity.mmrRerank(
      cands, vecs, "vec_id", "embedding", k = 3, lambda = 0.5)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    // the near-copy of the first pick drops below the orthogonal doc
    assert(diverse == Seq(1L, 3L, 2L))
    // k truncates
    assert(graft.operators.Similarity.mmrRerank(
      cands, vecs, "vec_id", "embedding", k = 2, lambda = 0.5)
      .count() == 2)
  }

  test("semanticDedup verdicts equal a brute-force within-cluster scan") {
    // two well-separated clusters with planted near-identical vectors
    val rng = new scala.util.Random(7)
    def jitter(base: Array[Float], eps: Float): Array[Float] =
      base.map(x => x + (rng.nextFloat() - 0.5f) * eps)
    val c1 = Array(10f, 0f, 0f, 0f)
    val c2 = Array(0f, 10f, 0f, 0f)
    val originals = (0L until 10L).map { i =>
      i -> jitter(if (i % 2 == 0) c1 else c2, 4f)
    }.toMap
    val vecs = (0L until 20L).map { i =>
      // ids 10..13 are near-copies of the VECTORS of ids 0..3 (same
      // parity → same side of the space → same coarse cluster)
      val v =
        if (i >= 10 && i < 14) jitter(originals(i - 10), 0.01f)
        else if (i < 10) originals(i)
        else jitter(if (i % 2 == 0) c1 else c2, 4f)
      (i, v)
    }.toDF("vec_id", "embedding")
    val model = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 3)
    val thr = 0.995
    val out = Similarity.semanticDedup(vecs, "vec_id", "embedding",
      model, thr)
      .select("vec_id", "keep", "n_dups_below")
      .as[(Long, Boolean, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // brute-force reference over the same cluster assignment
    val assigned = Ivf.assign(vecs, "vec_id", "embedding", model)
      .select("vec_id", "cluster_id").as[(Long, Int)].collect().toMap
    val raw = vecs.as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val d = ad.zip(bd).map(p => p._1 * p._2).sum
      d / (math.sqrt(ad.map(x => x * x).sum) *
        math.sqrt(bd.map(x => x * x).sum))
    }
    raw.keys.foreach { id =>
      val below = raw.keys.count(j => j < id &&
        assigned(j) == assigned(id) && cos(raw(j), raw(id)) >= thr)
      assert(out(id) == ((below == 0, below.toLong)),
        s"id $id: got ${out(id)}, expected ${(below == 0, below)}")
    }
    // the planted copies were actually caught
    assert((10L until 14L).forall(id => !out(id)._1))
  }

  test("rfm: exact quantile buckets, ties never straddle a cut") {
    // 10 customers; amounts/counts/dates crafted so quintile cuts and
    // the > cut rule are hand-checkable. Customer i has i orders of
    // 100*i cents on day (2024-01-i).
    val rows = (1 to 10).flatMap { i =>
      (1 to i).map(_ => (i.toLong, f"2024-01-$i%02d", 100L * i))
    }
    val df = rows.toDF("cust", "d", "cents")
    val out = Profile.rfm(df, "cust", "d", "cents",
        refDate = "2024-02-01", buckets = 5)
      .select(col("cust"), col("recency"), col("frequency"),
        col("monetary"), col("r"), col("f"), col("m"))
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(out.length == 10)
    // recency: customer i last ordered Jan i -> recency 32-i days;
    // HIGHER cust id = more recent = smaller recency = lower r bucket
    assert(out.head._2 == 31L && out.last._2 == 22L)
    val r = out.map(t => t._1 -> t._5).toMap
    assert(r(10L) == 1L && r(1L) == 5L)
    // frequency i and monetary 100*i*i are strictly increasing in i:
    // buckets of 2 per quintile (n=10, cuts at ranks 2,4,6,8 ->
    // values 2,4,6,8; bucket = 1 + #cuts strictly below)
    val f = out.map(t => t._1 -> t._6).toMap
    assert(f == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 3L,
      6L -> 3L, 7L -> 4L, 8L -> 4L, 9L -> 5L, 10L -> 5L))
    val m = out.map(t => t._1 -> t._7).toMap
    assert(m == f) // same ordering, same cuts rule
    // all-equal values land in ONE bucket (no straddling): single
    // measure, all ties
    val flat = (1 to 8).map(i => (i.toLong, "2024-01-15", 500L))
      .toDF("cust", "d", "cents")
    val fb = Profile.rfm(flat, "cust", "d", "cents",
        refDate = "2024-02-01", buckets = 4)
      .select(col("r"), col("f"), col("m")).distinct()
      .as[(Long, Long, Long)].collect()
    assert(fb.toSeq == Seq((1L, 1L, 1L)))
  }

  test("giniConcentration: exact index incl. tie correction") {
    // group a: perfectly even [10,10,10,10] -> ordinal S1 with ties
    //   = 10+20+30+40 = 100; G = (200 - 5*40)*10000 / (4*40) = 0
    // group b: one holder [0 is not allowed; use 1,1,1,97]:
    //   S1 = 1+2+3+4*97 = 394; G = (788 - 500)*10000 // 400 = 7200
    // group c: [1,2,3,4]: S1 = 1+4+9+16 = 30; G = (60-50)*1e4//40 = 2500
    val df = Seq(
      ("a", 10L), ("a", 10L), ("a", 10L), ("a", 10L),
      ("b", 1L), ("b", 1L), ("b", 1L), ("b", 97L),
      ("c", 1L), ("c", 2L), ("c", 3L), ("c", 4L)
    ).toDF("g", "v")
    val out = Profile.giniConcentration(df, "g", "v")
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(out("a") == ((4L, 40L, 0L)))
    assert(out("b") == ((4L, 100L, 7200L)))
    assert(out("c") == ((4L, 10L, 2500L)))
    // random parity vs a driver-side sort-based computation
    val rnd = new scala.util.Random(17)
    val rand = (1 to 500).map(_ =>
      (s"g${rnd.nextInt(3)}", (rnd.nextInt(50) + 1).toLong))
    val got = Profile.giniConcentration(rand.toDF("g", "v"), "g", "v")
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> t._4).toMap
    val want = rand.groupBy(_._1).map { case (g, xs) =>
      val vs = xs.map(_._2).sorted
      val n = vs.size.toLong
      val s0 = vs.sum
      val s1 = vs.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum
      g -> (BigInt(2) * BigInt(s1) - BigInt(n + 1) * BigInt(s0)) *
        BigInt(10000) / (BigInt(n) * BigInt(s0))
    }
    assert(got == want.map { case (k, v) => k -> v.toLong })
  }

  test("pairLift: exact lift, support floor, dedup within basket") {
    // 10 baskets; x,y co-occur in 4 of them; x alone in 2 more,
    // y alone in 1 more; u,v in 2 baskets (below minSupport 3).
    // n=10, c_x=6, c_y=5, c_xy=4 -> lift = 4*10/(6*5) = 1.333 ->
    // 13333 bp. Basket 1 repeats x twice (dedup must collapse it).
    val rows = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"), (3L, "x"), (3L, "y"), (4L, "x"), (4L, "y"),
      (5L, "x"), (6L, "x"), (7L, "y"),
      (8L, "u"), (8L, "v"), (9L, "u"), (9L, "v"),
      (10L, "z")
    ).toDF("basket", "item")
    val out = graft.operators.Association.pairLift(rows,
        "basket", "item", minSupport = 3, k = 10)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("x", "y", 6L, 5L, 4L, 13333L)))
    // lowering the floor admits (u, v): lift = 2*10/(2*2) = 5 -> 50000
    val out2 = graft.operators.Association.pairLift(rows,
        "basket", "item", minSupport = 2, k = 10)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(out2.length == 2)
    assert(out2.head == (("u", "v", 2L, 2L, 2L, 50000L))) // highest lift first
  }

  test("itemJaccard: exact basket-set Jaccard, floor, ranking") {
    // same fixture as pairLift: c_x=6, c_y=5, c_xy=4 ->
    // J = 4/(6+5-4) = 4/7 -> 5714 bp; u,v: 2/(2+2-2) = 1 -> 10000 bp
    val rows = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"), (3L, "x"), (3L, "y"), (4L, "x"), (4L, "y"),
      (5L, "x"), (6L, "x"), (7L, "y"),
      (8L, "u"), (8L, "v"), (9L, "u"), (9L, "v"),
      (10L, "z")
    ).toDF("basket", "item")
    val out = graft.operators.Association.itemJaccard(rows,
        "basket", "item", minSupport = 3, k = 10)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("x", "y", 6L, 5L, 4L, 5714L)))
    val out2 = graft.operators.Association.itemJaccard(rows,
        "basket", "item", minSupport = 2, k = 10)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(out2.toSeq == Seq(("u", "v", 2L, 2L, 2L, 10000L),
      ("x", "y", 6L, 5L, 4L, 5714L)))
  }

  test("phraseSearch: overlapping matches, 3-token chain, no partial hits") {
    val docs = Seq(
      (1L, "a a a a"),          // "a a" overlaps: 3 matches
      (2L, "x a a y a a"),      // 2 matches
      (3L, "a b a"),            // none for "a a"
      (4L, "q w e q w e q w"),  // "q w e" twice, trailing "q w" partial
      (5L, "")                  // empty doc
    ).toDF("doc_id", "text")
    val two = graft.operators.TextIndex.phraseSearch(docs, "doc_id",
        "text", Seq("a", "a"))
      .as[(Long, Long)].collect().toMap
    assert(two == Map(1L -> 3L, 2L -> 2L))
    val three = graft.operators.TextIndex.phraseSearch(docs, "doc_id",
        "text", Seq("q", "w", "e"))
      .as[(Long, Long)].collect().toMap
    assert(three == Map(4L -> 2L))
  }

  test("rollupReport: subtotal pyramid, guards on NULL and '(all)'") {
    val df = Seq(
      ("eu", "de", 10L), ("eu", "de", 5L), ("eu", "fr", 7L),
      ("us", "us", 3L)
    ).toDF("r", "c", "v")
    val out = graft.operators.Profile.rollupReport(df, Seq("r", "c"), "v")
      .as[(String, String, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    assert(out == Map(
      ("eu", "de") -> ((2L, 15L)), ("eu", "fr") -> ((1L, 7L)),
      ("us", "us") -> ((1L, 3L)),
      ("eu", "(all)") -> ((3L, 22L)), ("us", "(all)") -> ((1L, 3L)),
      ("(all)", "(all)") -> ((4L, 25L))))
    intercept[Exception] {
      graft.operators.Profile.rollupReport(
        Seq((null.asInstanceOf[String], "x", 1L)).toDF("r", "c", "v"),
        Seq("r", "c"), "v").collect()
    }
    intercept[Exception] {
      graft.operators.Profile.rollupReport(
        Seq(("(all)", "x", 1L)).toDF("r", "c", "v"),
        Seq("r", "c"), "v").collect()
    }
  }

  test("snapshotDiff: verdict classes, null spelling, no concat ambiguity") {
    val a = Seq(
      (1L, Option("x"), Option(10L)), // same
      (2L, Option("y"), Option(20L)), // changed in b
      (3L, Option("z"), Option(30L)), // removed
      (5L, None: Option[String], Option(50L)), // null vs "null" string
      (6L, Option("ab"), Option(7L))  // ambiguity probe vs b's ("a", ...)
    ).toDF("k", "s", "v")
    val b = Seq(
      (1L, Option("x"), Option(10L)),
      (2L, Option("y"), Option(21L)),
      (4L, Option("w"), Option(40L)), // added
      (5L, Option("null"), Option(50L)),
      (6L, Option("a"), Option(7L))
    ).toDF("k", "s", "v")
    val out = graft.operators.Profile.snapshotDiff(a, b, Seq("k"))
      .select("k", "verdict").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "same", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "changed", 6L -> "changed"))
  }

  test("totalVariationBp: exact TVD, disjoint and identical extremes") {
    // a: buckets {1:2, 2:2}; b: {1:1, 2:1} -> identical distributions
    // -> 0 bp. c: {3:2} -> disjoint from a -> 10000 bp.
    // a vs c check by hand: |2*2-0*4| + |2*2-0*4| + |0*2-2*4| = 16;
    // 16*10000/(2*4*2) = 10000.
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 2L), ("a", 2L),
      ("b", 1L), ("b", 2L),
      ("c", 3L), ("c", 3L)
    ).toDF("slice", "bucket")
    val out = graft.operators.CorpusSim.totalVariationBp(df, "slice", "bucket")
      .select("slice_a", "slice_b", "tv_bp", "n_a", "n_b")
      .as[(String, String, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap
    assert(out(("a", "b")) == ((0L, 4L, 2L)))
    assert(out(("a", "c")) == ((10000L, 4L, 2L)))
    assert(out(("b", "c")) == ((10000L, 2L, 2L)))
    // asymmetric overlap: d {1:3, 2:1} vs b {1:1, 2:1}:
    // |3*2-1*4| + |1*2-1*4| = 2+2 = 4; 4*10000/(2*4*2) = 2500
    val df2 = Seq(("d", 1L), ("d", 1L), ("d", 1L), ("d", 2L),
      ("b", 1L), ("b", 2L)).toDF("slice", "bucket")
    val o2 = graft.operators.CorpusSim.totalVariationBp(df2, "slice", "bucket")
      .select("slice_a", "slice_b", "tv_bp")
      .as[(String, String, Long)].collect()
    assert(o2.toSeq == Seq(("b", "d", 2500L)))
  }
}
