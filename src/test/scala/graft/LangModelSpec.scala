package graft

import org.apache.spark.sql.functions._

import graft.operators.LangModel

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  // reference surprisal computation, sequential, independent of the
  // operator's join formulation
  private def refScore(train: Seq[String], doc: String,
                       lambda: Double): (Long, Long) = {
    val toks = train.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
    val uni = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = toks.isEmpty match {
      case true => Map.empty[(String, String), Long]
      case false => train.flatMap { t =>
        val w = t.trim.split("\\s+").filter(_.nonEmpty)
        w.zip(w.drop(1))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
    val total = toks.size.toDouble
    val vocab = uni.size.toDouble
    val denom = total + vocab + 1.0
    val w = doc.trim.split("\\s+").filter(_.nonEmpty)
    val pairs = w.zip(w.drop(1))
    val fp = pairs.map { case (w1, w2) =>
      val p1 = (uni.getOrElse(w2, 0L) + 1.0) / denom
      val pBi = bi.get((w1, w2)) match {
        case Some(c) => c.toDouble / uni(w1).toDouble
        case None => 0.0
      }
      math.floor(-math.log(lambda * pBi + (1 - lambda) * p1) * 1e9).toLong
    }.sum
    (pairs.length.toLong, fp)
  }

  test("bigram LM surprisal matches the sequential reference bit-exactly") {
    val train = Seq("the cat sat on the mat", "the dog sat on the rug",
      "a cat and a dog")
    val docs = Seq(
      (1L, "the cat sat on the rug"),   // all seen bigrams
      (2L, "zebra quantum flux"),       // all OOV
      (3L, "the cat"),                  // one bigram
      (4L, "single"))                   // unscorable
    val corpus = train.zipWithIndex.map { case (t, i) => (100L + i, t) }
    val df = (docs ++ corpus).toDF("doc_id", "text")
    val lm = LangModel.train(df.filter(col("doc_id") >= 100L), "text")
    val got = LangModel.score(lm, df, "doc_id", "text", lambda = 0.9)
      .select("doc_id", "n_scored", "surprisal_fp")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3)))
      .toMap
    for ((id, text) <- docs) {
      assert(got(id) == refScore(train, text, 0.9),
        s"doc $id ('$text') surprisal mismatch")
    }
    // seen-bigram text must be less surprising per bigram than OOV text
    assert(got(1L)._2 / got(1L)._1 < got(2L)._2 / got(2L)._1)
    assert(got(4L) == ((0L, 0L)))
  }

  test("pruning drops rare words to the OOV bucket but keeps ordering") {
    val common = (1 to 50).map(i => (i.toLong, "alpha beta gamma alpha beta"))
    val rare = Seq((900L, "omicron sigma tau upsilon"))
    val df = (common ++ rare).toDF("doc_id", "text")
    // vocab budget of 3 keeps only alpha/beta/gamma
    val lm = LangModel.train(df, "text", topUnigrams = 3, topBigrams = 10)
    assert(lm.vocabSize == 3L)
    assert(lm.unigrams.select("w").as[String].collect().toSet ==
      Set("alpha", "beta", "gamma"))
    val scored = LangModel.score(lm, df, "doc_id", "text")
      .select("doc_id", "cross_entropy").as[(Long, Double)].collect().toMap
    assert(scored(900L) > scored(1L)) // pruned text is maximally surprising
  }

  test("scoreWithBuckets: exact-rank cuts, monotone in cross-entropy") {
    val docs = (1 to 90).map { i =>
      // three planted tiers: repeated seen text / mixed / pure OOV
      val text = i % 3 match {
        case 0 => "the cat sat on the mat the cat sat on the mat"
        case 1 => "the cat xylophone on zzz mat the frobnicate"
        case _ => s"qq$i ww$i ee$i rr$i tt$i yy$i uu$i ii$i"
      }
      (i.toLong, text)
    }
    val df = docs.toDF("doc_id", "text")
    val out = LangModel.scoreWithBuckets(df, "doc_id", "text",
        trainPred = col("doc_id") % 3 === 0, cuts = Seq(33, 67))
      .select("doc_id", "cross_entropy", "ce_bucket")
      .as[(Long, Option[Double], Int)].collect()
    // buckets are monotone: every bucket-0 CE <= every bucket-2 CE
    val byBucket = out.groupBy(_._3).view
      .mapValues(_.flatMap(_._2)).toMap
    assert(byBucket.keySet == Set(0, 1, 2))
    assert(byBucket(0).max <= byBucket(1).min + 1e-12)
    assert(byBucket(1).max <= byBucket(2).min + 1e-12)
    // planted tiers land in order: trained tier in head, OOV in tail
    val tier0 = out.filter(t => t._1 % 3 == 0).map(_._3)
    val tier2 = out.filter(t => t._1 % 3 == 2).map(_._3)
    assert(tier0.forall(_ == 0))
    assert(tier2.forall(_ == 2))
  }

  test("importanceSelect equals brute-force top-N; target docs win") {
    // ids 1-15 are target-domain docs (repetitive vocab); 16-60 are
    // background with distinct vocab; duplicates exercise the tie path
    val docs = (1 to 60).map { i =>
      val text =
        if (i <= 15) "solar panel inverter grid solar panel battery"
        else if (i % 2 == 0) "the quick brown fox jumps over the lazy dog"
        else s"random widget $i assembly manual page $i section"
      (i.toLong, text)
    }
    val df = docs.toDF("doc_id", "text")
    val out = LangModel.importanceSelect(df, "doc_id", "text",
        targetPred = col("doc_id") <= 15, nKeep = 20)
      .select("doc_id", "weight_fp", "selected")
      .as[(Long, Long, Boolean)].collect()
    assert(out.length == 60)
    assert(out.count(_._3) == 20)
    // the selected set IS the top-20 under (weight desc, id-hash-
    // bucket asc, id asc) — boundary ties resolve through the same
    // bucket-parallel hashRankFilter order every keep-cutoff uses
    // (portable md5 bucket of the stringified id, then id)
    def pb(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val expect = out.sortBy(t => (-t._2, pb(t._1), t._1))
      .take(20).map(_._1).toSet
    assert(out.filter(_._3).map(_._1).toSet == expect)
    // the point of the operator: target-domain docs outrank background
    val tw = out.filter(_._1 <= 15).map(_._2)
    val bw = out.filter(_._1 > 15).map(_._2)
    assert(tw.min > bw.max,
      s"target floor ${tw.min} not above background ceiling ${bw.max}")
    // determinism: a re-run selects the identical set
    val again = LangModel.importanceSelect(df, "doc_id", "text",
        targetPred = col("doc_id") <= 15, nKeep = 20)
      .filter(col("selected")).select("doc_id")
      .as[Long].collect().toSet
    assert(again == expect)
  }

  test("scoreWithBucketsBy cuts per group; constant group equals global") {
    // two "domains" with different CE distributions: every doc mixes
    // trained bigrams with j OOV words, so per-doc mean surprisal is
    // strictly increasing in j INSIDE each group, and src_b (OOV-heavy)
    // sits above src_a overall. A global cut would dump src_b into the
    // tail; per-group cuts must produce all three buckets per group.
    val docs = (1 to 30).map { i =>
      val (g, j) = if (i <= 15) ("src_a", i) else ("src_b", i - 15)
      val trained = if (g == "src_a") 20 else 2
      val oov = if (g == "src_a") j else 5 + j
      val text = ("alpha beta " * trained) +
        (1 to oov).map(x => s"${g.last}${j}w$x").mkString(" ")
      (i.toLong, g, text)
    }
    val df = docs.toDF("doc_id", "source", "text")
    val out = LangModel.scoreWithBucketsBy(df, "doc_id", "text", "source",
        trainPred = col("doc_id") <= 5)
      .select("doc_id", "source", "cross_entropy", "ce_bucket")
      .as[(Long, String, Option[Double], Int)].collect()
    assert(out.length == 30)
    Seq("src_a", "src_b").foreach { g =>
      val inG = out.filter(_._2 == g)
      val byBucket = inG.groupBy(_._4).view.mapValues(_.flatMap(_._3)).toMap
      assert(byBucket.keySet == Set(0, 1, 2), s"$g buckets: ${byBucket.keySet}")
      assert(byBucket(0).max <= byBucket(1).min + 1e-12, s"$g 0<=1")
      assert(byBucket(1).max <= byBucket(2).min + 1e-12, s"$g 1<=2")
    }
    // per-group heads differ from a global cut: src_b's head docs
    // would NOT be head under the global cuts (their CE is above
    // src_a's tail boundary)
    val globalOut = LangModel.scoreWithBuckets(df, "doc_id", "text",
        trainPred = col("doc_id") <= 5)
      .select("doc_id", "ce_bucket").as[(Long, Int)].collect().toMap
    val bHeads = out.filter(t => t._2 == "src_b" && t._4 == 0).map(_._1)
    assert(bHeads.nonEmpty && bHeads.exists(id => globalOut(id) > 0))

    // a constant group column reproduces the global bucketing exactly
    val const = LangModel.scoreWithBucketsBy(
        df.withColumn("one", lit("x")), "doc_id", "text", "one",
        trainPred = col("doc_id") <= 5)
      .select("doc_id", "ce_bucket").as[(Long, Int)].collect().toMap
    assert(const == globalOut)

    // unscorable doc lands in bucket 0 without disturbing its group
    val withEmpty = LangModel.scoreWithBucketsBy(
        df.union(Seq((99L, "src_b", "")).toDF("doc_id", "source", "text")),
        "doc_id", "text", "source", trainPred = col("doc_id") <= 5)
      .filter(col("doc_id") === 99).select("ce_bucket")
      .as[Int].collect()
    assert(withEmpty.toSeq == Seq(0))
  }

  test("fused pair training matches two separate train+score passes") {
    // importanceSelect trains both LMs off one explosion (trainPair);
    // the weight must equal the one derived from two independent
    // train() + score() passes — count-identical prunes, same ties
    val docs = (1 to 40).map { i =>
      val text =
        if (i <= 10) "solar panel inverter grid solar panel battery"
        else if (i % 2 == 0) "the quick brown fox jumps over the lazy dog"
        else s"random widget $i assembly manual page $i section"
      (i.toLong, text)
    }
    val df = docs.toDF("doc_id", "text")
    val pred = col("doc_id") <= 10
    val fused = LangModel.importanceSelect(df, "doc_id", "text",
        targetPred = pred, nKeep = 5)
      .select("doc_id", "weight_fp")
      .as[(Long, Option[Long])].collect().toMap
    val lmT = LangModel.train(df.filter(pred), "text")
    val lmC = LangModel.train(df, "text")
    val tfp = LangModel.score(lmT, df, "doc_id", "text")
      .select("doc_id", "surprisal_fp", "n_scored")
      .as[(Long, Long, Long)].collect()
    val cfp = LangModel.score(lmC, df, "doc_id", "text")
      .select("doc_id", "surprisal_fp")
      .as[(Long, Long)].collect().toMap
    tfp.foreach { case (id, t, n) =>
      val expect =
        if (n == 0) None
        else Some((BigInt(cfp(id)) - BigInt(t)) * 1000 / n)
      assert(fused(id).map(BigInt(_)) == expect,
        s"doc $id: fused ${fused(id)} vs two-pass $expect")
    }
  }

  test("importanceSelect survives unscorable docs; they never select") {
    // empty and single-token docs have no bigrams (n_scored = 0); the
    // r5 sentinel encoding made any such doc crash the Selection
    // bounds math (span wrap) — this corpus mixes both kinds in
    val docs = (1 to 12).map { i =>
      val text =
        if (i <= 3) "solar panel inverter grid solar panel battery"
        else if (i == 11) ""             // empty doc
        else if (i == 12) "lone"         // one token, zero bigrams
        else s"random widget $i assembly manual page $i section"
      (i.toLong, text)
    }
    val df = docs.toDF("doc_id", "text")
    val out = LangModel.importanceSelect(df, "doc_id", "text",
        targetPred = col("doc_id") <= 3, nKeep = 5)
      .select("doc_id", "n_scored", "weight_fp", "selected")
      .as[(Long, Long, Option[Long], Boolean)].collect()
    assert(out.length == 12)
    // unscorable docs: NULL weight, never selected
    val unscorable = out.filter(_._2 == 0)
    assert(unscorable.map(_._1).toSet == Set(11L, 12L))
    assert(unscorable.forall(t => t._3.isEmpty && !t._4))
    // exactly nKeep scorable docs selected; target docs all in
    assert(out.count(_._4) == 5)
    assert((1 to 3).forall(i => out.find(_._1 == i).exists(_._4)))

    // nKeep above the scorable count: every scorable doc selects,
    // unscorable still excluded, no crash
    val all = LangModel.importanceSelect(df, "doc_id", "text",
        targetPred = col("doc_id") <= 3, nKeep = 50)
      .select("doc_id", "n_scored", "selected")
      .as[(Long, Long, Boolean)].collect()
    assert(all.count(_._3) == 10)
    assert(all.filter(_._2 == 0).forall(!_._3))

    // all-unscorable corpus: empty selection, no crash
    val none = LangModel.importanceSelect(
        Seq((1L, ""), (2L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", targetPred = col("doc_id") === 1, nKeep = 3)
      .select("selected").as[Boolean].collect()
    assert(none.length == 2 && none.forall(!_))
  }

  test("exactSurprisals tracks -1e6*ln of every model probability " +
    "within 3 units; scoreExactFp sums agree with the float path") {
    val train = Seq("the cat sat on the mat", "the dog sat on the rug",
      "a cat and a dog")
    val docs = (train ++ Seq("the cat sat", "zebra quark the cat", "",
      "onlyoneword")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val lm = LangModel.train(docs.filter(col("doc_id") < 3), "text")
    val ex = LangModel.exactSurprisals(lm)
    val uniC = lm.unigrams.as[(String, Long)].collect().toMap
    val denom = lm.totalTokens.toDouble + lm.vocabSize.toDouble + 1.0
    // bigram rows
    ex.biSurp.as[(String, String, Long)].collect().foreach {
      case (w1, w2, fp) =>
        val cb = lm.bigrams.filter(col("w1") === w1 && col("w2") === w2)
          .select("c_bi").as[Long].head()
        val p = 0.9 * cb.toDouble / uniC(w1) + 0.1 * (uniC(w2) + 1) / denom
        assert(math.abs(fp - (-math.log(p) * 1e6)) <= 3.0,
          s"bigram ($w1,$w2): $fp vs ${-math.log(p) * 1e6}")
    }
    // unigram fallback + OOV
    ex.uniSurp.as[(String, Long)].collect().foreach { case (w, fp) =>
      val p = 0.1 * (uniC(w) + 1) / denom
      assert(math.abs(fp - (-math.log(p) * 1e6)) <= 3.0)
    }
    assert(math.abs(ex.oovFp - (-math.log(0.1 / denom) * 1e6)) <= 3.0)
    // per-doc sums: exact (micronat) vs float (nanonat) within
    // n_scored * 3 millinat of each other
    val fl = LangModel.score(lm, docs, "doc_id", "text")
      .select("doc_id", "n_scored", "surprisal_fp")
      .as[(Long, Long, Long)].collect()
    val flMap = fl.map(t => t._1 -> (t._2, t._3)).toMap
    LangModel.scoreExactFp(lm, docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().foreach { case (id, n, fp6) =>
        val (nf, fp9) = flMap(id)
        assert(n == nf)
        assert(math.abs(fp6 - fp9 / 1000.0) <= 3.0 * math.max(1, n),
          s"doc $id: exact $fp6 vs float/1000 ${fp9 / 1000.0}")
      }
  }

  test("importanceSelectExactFp selects the same documents as the " +
    "float path on a well-separated corpus; buckets are exact") {
    val docs = (1 to 60).map { i =>
      val text =
        if (i <= 15) "solar panel inverter grid solar panel battery"
        else if (i % 2 == 0) "the quick brown fox jumps over the lazy dog"
        else s"random widget $i assembly manual page $i section"
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val exact = LangModel.importanceSelectExactFp(docs, "doc_id", "text",
        targetPred = col("doc_id") <= 15, nKeep = 20)
      .filter(col("selected")).select("doc_id").as[Long].collect().toSet
    val float = LangModel.importanceSelect(docs, "doc_id", "text",
        targetPred = col("doc_id") <= 15, nKeep = 20)
      .filter(col("selected")).select("doc_id").as[Long].collect().toSet
    assert(exact == float, s"exact $exact vs float $float")
    // bucket twin: ce_mnn is surprisal_fp*1000 div n_scored, buckets
    // count cuts strictly below the key
    val b = LangModel.scoreWithBucketsExactFp(docs, "doc_id", "text",
        trainPred = col("doc_id") <= 15)
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(b.length == 60)
    b.foreach { case (_, n, fp, mnn, bucket) =>
      if (n > 0) assert(mnn == fp * 1000 / n)
      else assert(mnn == -1L && bucket == 0)
      assert(bucket >= 0 && bucket <= 2)
    }
    // bucket rule mirror: cuts are the keys at ranks
    // greatest(1, n*c div 100) of the ascending key order (ALL docs),
    // bucket = #cuts strictly below the doc's key
    val keys = b.map(_._4).sorted
    val cut33 = keys(math.max(1, keys.length * 33 / 100) - 1)
    val cut67 = keys(math.max(1, keys.length * 67 / 100) - 1)
    b.foreach { case (id, _, _, mnn, bucket) =>
      val want = (if (mnn > cut33) 1 else 0) + (if (mnn > cut67) 1 else 0)
      assert(bucket == want, s"doc $id: bucket $bucket vs $want")
    }
  }

  test("scoreWithBucketsByExactFp: per-group buckets match the float " +
    "path; NULL-cut group and unscorable docs land in bucket 0") {
    // the scoreWithBucketsBy corpus: CE strictly increasing inside
    // each group, so exact-integer ranks must bucket identically to
    // the float path (well-separated keys — no float/int rank flips)
    val docs = (1 to 30).map { i =>
      val (g, j) = if (i <= 15) ("src_a", i) else ("src_b", i - 15)
      val trained = if (g == "src_a") 20 else 2
      val oov = if (g == "src_a") j else 5 + j
      val text = ("alpha beta " * trained) +
        (1 to oov).map(x => s"${g.last}${j}w$x").mkString(" ")
      (i.toLong, g, text)
    }
    val df = docs.toDF("doc_id", "source", "text")
    val exact = LangModel.scoreWithBucketsByExactFp(df, "doc_id", "text",
        "source", trainPred = col("doc_id") <= 5)
      .select("doc_id", "source", "n_scored", "surprisal_fp", "ce_mnn",
        "ce_bucket")
      .as[(Long, String, Long, Long, Long, Int)].collect()
    assert(exact.length == 30)
    val float = LangModel.scoreWithBucketsBy(df, "doc_id", "text",
        "source", trainPred = col("doc_id") <= 5)
      .select("doc_id", "ce_bucket").as[(Long, Int)].collect().toMap
    exact.foreach { case (id, _, n, fp, mnn, bucket) =>
      assert(bucket == float(id), s"doc $id: exact $bucket vs ${float(id)}")
      if (n > 0) assert(mnn == fp * 1000 / n) else assert(mnn == -1L)
    }
    // per-group cut mirror: cuts at ranks greatest(1, n*c div 100) of
    // the ascending key order over SCORABLE docs of the SAME group
    exact.groupBy(_._2).foreach { case (g, inG) =>
      val keys = inG.filter(_._3 > 0).map(_._5).sorted
      val c33 = keys(math.max(1, keys.length * 33 / 100) - 1)
      val c67 = keys(math.max(1, keys.length * 67 / 100) - 1)
      inG.foreach { case (id, _, _, _, mnn, bucket) =>
        val want = (if (mnn > c33) 1 else 0) + (if (mnn > c67) 1 else 0)
        assert(bucket == want, s"$g doc $id: $bucket vs $want")
      }
    }
    // a group whose docs are ALL unscorable has NULL cuts → bucket 0,
    // and unscorable docs in a scorable group also land in bucket 0
    val aug = df.union(Seq(
      (97L, "src_c", ""), (98L, "src_c", "solo"),
      (99L, "src_b", "")).toDF("doc_id", "source", "text"))
    val edge = LangModel.scoreWithBucketsByExactFp(aug, "doc_id", "text",
        "source", trainPred = col("doc_id") <= 5)
      .filter(col("doc_id") >= 97)
      .select("doc_id", "ce_bucket").as[(Long, Int)].collect().toMap
    assert(edge == Map(97L -> 0, 98L -> 0, 99L -> 0))
  }
}
