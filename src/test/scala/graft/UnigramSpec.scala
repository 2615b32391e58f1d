package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram

/** Unigram tokenizer battery: Viterbi optimality/tie-break laws,
  * round-trip (pieces re-concatenate to the word), the Kudo prune,
  * alphabet coverage, OOV fallback on unseen text, and the
  * vocab/segments artifacts. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi picks the min-cost path; ties go to the longest " +
    "last piece") {
    // costs: "ab" cheap, chars expensive -> "abab" = [ab, ab]
    val costs = Map("a" -> 10L, "b" -> 10L, "ab" -> 5L, "ba" -> 5L,
      "aba" -> 30L, "abab" -> 40L)
    assert(Unigram.viterbi("abab", costs, 4) == Seq("ab", "ab"))
    // exact tie between [ab][ab] (10) and [abab] (10): the longest
    // last piece wins at the final position
    val tie = costs + ("abab" -> 10L)
    assert(Unigram.viterbi("abab", tie, 4) == Seq("abab"))
    // unsegmentable char -> loud error
    intercept[IllegalArgumentException] {
      Unigram.viterbi("ax", Map("a" -> 1L), 4)
    }
  }

  test("round-trip: segmentation pieces concatenate back to every " +
    "dictionary word; all pieces are in the vocabulary") {
    val dict = Seq("sparkle" -> 20L, "sparks" -> 15L, "spark" -> 30L,
      "park" -> 10L, "parks" -> 8L, "lark" -> 4L, "larks" -> 2L)
    val m = Unigram.trainDict(dict, seedSize = 10, maxPieceLen = 4)
    val vocab = m.pieces.map(_._1).toSet
    for ((w, _) <- dict) {
      val ps = m.segments(w)
      assert(ps.mkString("") == w, s"roundtrip broke for $w: $ps")
      assert(ps.forall(vocab), s"out-of-vocab piece in $ps")
    }
  }

  test("Kudo prune: multi-char pieces without a Viterbi count drop; " +
    "the alphabet always survives with freq >= 1") {
    val dict = Seq("aaaa" -> 100L, "bbbb" -> 1L)
    val m = Unigram.trainDict(dict, seedSize = 50, maxPieceLen = 4)
    val pieces = m.pieces.map(p => p._1 -> p._2).toMap
    // chars of both words survive even if unused in final paths
    assert(pieces.contains("a") && pieces.contains("b"))
    assert(pieces.values.forall(_ >= 1L))
    // "aaaa" dominates: its 4-gram must be in the vocab and used
    assert(pieces.contains("aaaa"))
    assert(m.segments("aaaa") == Seq("aaaa"))
    // every surviving multi-char piece has a genuine Viterbi count
    val used = dict.flatMap { case (w, c) =>
      m.segments(w).map(_ -> c) }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    for ((p, f) <- pieces if p.length > 1)
      assert(used.getOrElse(p, 0L) == f,
        s"piece $p freq $f != recount ${used.getOrElse(p, 0L)}")
  }

  test("tokenize: dictionary words map through the broadcast " +
    "segmentation; OOV words fall back to chars and are counted") {
    val corpus = Seq((1L, "spark spark lark"), (2L, "park larks"))
      .toDF("doc_id", "text")
    val m = Unigram.train(corpus, "text", seedSize = 20)
    val unseen = Seq((9L, "spark zebra"), (10L, "zzz"))
      .toDF("doc_id", "text")
    val out = Unigram.tokenize(unseen, "doc_id", "text", m)
      .orderBy("doc_id")
      .collect()
    val r9 = out(0)
    assert(r9.getLong(r9.fieldIndex("n_oov_words")) == 1L)
    val pieces9 = r9.getSeq[String](r9.fieldIndex("pieces"))
    assert(pieces9.mkString("") == "sparkzebra")
    // the OOV word contributed single chars
    assert(pieces9.containsSlice(Seq("z", "e", "b", "r", "a")))
    val r10 = out(1)
    assert(r10.getLong(r10.fieldIndex("n_oov_words")) == 1L)
    assert(r10.getSeq[String](r10.fieldIndex("pieces")) ==
      Seq("z", "z", "z"))
  }

  test("fertility: nonzero OOV share on unseen text; exact integer " +
    "ratios") {
    val corpus = Seq((1L, "spark spark park")).toDF("doc_id", "text")
    val m = Unigram.train(corpus, "text", seedSize = 20)
    val eval = Seq((1L, "en", "spark novel"), (2L, "de", "park park"))
      .toDF("doc_id", "lang", "text")
    val rows = Unigram.fertility(eval, "doc_id", "text", "lang", m)
      .orderBy("lang").collect()
    val de = rows(0); val en = rows(1)
    assert(de.getString(0) == "de" &&
      de.getLong(de.fieldIndex("n_oov_words")) == 0L)
    assert(en.getLong(en.fieldIndex("n_oov_words")) == 1L)
    assert(en.getLong(en.fieldIndex("oov_bp")) == 5000L) // 1 of 2 words
    // fertility = 10^4 * n_tokens div n_words, replayable arithmetic
    val nt = en.getLong(en.fieldIndex("n_tokens"))
    val nw = en.getLong(en.fieldIndex("n_words"))
    assert(en.getLong(en.fieldIndex("fertility_bp")) == 10000L * nt / nw)
  }

  test("encodeIds: ids are code-point-ordered vocab positions; OOV " +
    "chars outside the alphabet become UnkId and are counted") {
    val corpus = Seq((1L, "spark spark park")).toDF("doc_id", "text")
    val m = Unigram.train(corpus, "text", seedSize = 20)
    val ordered = Unigram.vocabIds(m)
    assert(ordered.map(_._1) == ordered.map(_._1).sorted) // code-point order
    val ids = ordered.toMap
    val out = Unigram.encodeIds(
      Seq((1L, "spark zoo")).toDF("doc_id", "text"),
      "doc_id", "text", m).head()
    val tids = out.getSeq[Int](out.fieldIndex("token_ids"))
    // 'z' and 'o' are outside the {s,p,a,r,k} alphabet -> UNK
    assert(tids.count(_ == Unigram.UnkId) == 3)
    assert(out.getLong(out.fieldIndex("n_unk")) == 3L)
    assert(out.getLong(out.fieldIndex("n_oov_words")) == 1L)
    // in-vocab pieces map to their vocab positions exactly
    val sparkPieces = m.segments("spark")
    assert(tids.take(sparkPieces.length) == sparkPieces.map(ids))
  }

  test("vocab/segments artifacts: deterministic ordering, cost " +
    "monotone in frequency, retrain reproduces the model") {
    val dict = Seq("alpha" -> 50L, "alps" -> 20L, "beta" -> 40L,
      "bet" -> 10L, "able" -> 5L)
    val m1 = Unigram.trainDict(dict, seedSize = 30, maxPieceLen = 4)
    val m2 = Unigram.trainDict(dict, seedSize = 30, maxPieceLen = 4)
    assert(m1.pieces == m2.pieces && m1.segments == m2.segments)
    // lnFp(tot, f) strictly decreases as f grows: rarer = costlier
    val byFreq = m1.pieces.groupBy(_._2).view.mapValues(_.map(_._3))
    for (f1 <- byFreq.keys; f2 <- byFreq.keys if f1 < f2)
      assert(byFreq(f1).min >= byFreq(f2).max,
        s"cost not monotone between freq $f1 and $f2")
  }

  /** Total corpus description length under the model's OWN costs:
    * Σ_w count(w) · Σ_{p ∈ seg(w)} cost(p). */
  private def corpusCost(dict: Seq[(String, Long)],
                         m: Unigram.UnigramModel): BigInt = {
    val cost = m.pieces.map(t => t._1 -> t._3).toMap
    dict.iterator.map { case (w, c) =>
      BigInt(c) * m.segments(w).map(cost).sum
    }.sum
  }

  test("emRounds = 2 yields a no-worse corpus likelihood than 1, and " +
    "emRounds = 1 / no target reproduces the single-round model") {
    val dict = Seq("internationalization" -> 9L, "international" -> 22L,
      "nation" -> 40L, "nations" -> 18L, "ration" -> 12L,
      "rational" -> 7L, "internal" -> 15L, "intern" -> 11L,
      "station" -> 25L, "stationary" -> 5L, "alization" -> 3L,
      "art" -> 30L, "piece" -> 17L)
    val m1 = Unigram.trainDict(dict, seedSize = 60, maxPieceLen = 4)
    val m1e = Unigram.trainDict(dict, seedSize = 60, maxPieceLen = 4,
      emRounds = 1, targetVocab = 0)
    assert(m1.pieces == m1e.pieces && m1.segments == m1e.segments,
      "defaults must reproduce the r16 single-round model exactly")
    val m2 = Unigram.trainDict(dict, seedSize = 60, maxPieceLen = 4,
      emRounds = 2)
    assert(corpusCost(dict, m2) <= corpusCost(dict, m1),
      s"round 2 worsened the corpus cost: ${corpusCost(dict, m2)} > " +
        s"${corpusCost(dict, m1)}")
    // more rounds keep it monotone on this corpus (hard EM converges)
    val m4 = Unigram.trainDict(dict, seedSize = 60, maxPieceLen = 4,
      emRounds = 4)
    assert(corpusCost(dict, m4) <= corpusCost(dict, m2))
  }

  test("iterative target pruning: vocab lands at the target (alphabet " +
    "floor respected), survivors carry Viterbi counts, coverage holds") {
    val dict = Seq("sparkle" -> 20L, "sparks" -> 15L, "spark" -> 30L,
      "parking" -> 9L, "marker" -> 14L, "market" -> 21L,
      "lark" -> 11L, "larks" -> 4L)
    val nChars = dict.flatMap(_._1.toSeq).distinct.size
    val target = nChars + 3 // keeps only the 3 best multi-char pieces
    val m = Unigram.trainDict(dict, seedSize = 50, maxPieceLen = 4,
      emRounds = 2, targetVocab = target)
    assert(m.pieces.size <= target)
    assert(m.pieces.count(_._1.length == 1) == nChars,
      "the whole alphabet must survive the target prune")
    // every dictionary word still segments through surviving pieces
    val vocab = m.pieces.map(_._1).toSet
    for ((w, _) <- dict) {
      assert(m.segments(w).mkString("") == w)
      assert(m.segments(w).forall(vocab))
    }
    // a target below the alphabet keeps exactly the alphabet
    val mFloor = Unigram.trainDict(dict, seedSize = 50, maxPieceLen = 4,
      emRounds = 2, targetVocab = 2)
    assert(mFloor.pieces.map(_._1).toSet ==
      dict.flatMap(_._1.toSeq).map(_.toString).toSet)
  }
}
