package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PortableLn

/** Unigram-LM (SentencePiece-class) tokenizer — the other dominant
  * tokenizer family next to [[Bpe]] (Kudo, ACL 2018: "Subword
  * Regularization"; the SentencePiece unigram model). Pieces carry
  * probabilities; a word's segmentation is the Viterbi path through
  * its substring lattice.
  *
  * ENGINE-EXACT formulation: piece scores are integer fixed-point
  * SURPRISALS through [[PortableLn.lnFp]] — `cost(p) = lnFp(Σfreq,
  * freq(p))` (≈ 10^6·ln of the inverse unigram probability) — and the
  * EM step is HARD EM (Viterbi counts, not forward-backward
  * expectations), so every quantity in training is an integer and the
  * whole training run replays bit-for-bit as SQL (the q103 BPE
  * recursive-replay posture; floats would diverge in the last ulp and
  * flip argmins). Tie-break at each lattice node: minimum total cost,
  * then the LONGEST last piece — a total order both engines express.
  *
  * Training (all on the word-frequency dictionary — like BPE, unigram
  * statistics never need corpus rows; pieces cannot cross word
  * boundaries):
  *   1. dictionary: one word-count shuffle, top `maxVocabWords` by
  *      (count DESC, word) — [[Bpe.train]]'s prune;
  *   2. seed vocabulary: every substring of length 2..`maxPieceLen`
  *      of dictionary words, occurrence-weighted by word count; keep
  *      the top `seedSize` by (freq DESC, piece) PLUS the whole
  *      single-character alphabet (coverage floor — every word stays
  *      segmentable);
  *   3. `emRounds` Viterbi-EM rounds: costs `lnFp(totF, freq)` over
  *      the current vocabulary; Viterbi-segment the dictionary (hard
  *      E-step); re-count piece frequencies from the segmentations
  *      (M-step); drop multi-char pieces with zero Viterbi count
  *      (the Kudo prune), clamp kept frequencies to ≥ 1; optionally
  *      prune to `targetVocab` (alphabet + top multi-char pieces by
  *      (freq DESC, code-point ASC)) — iterative pruning, since the
  *      next round re-estimates counts under the pruned vocabulary;
  *   4. final costs over the surviving vocabulary; final Viterbi
  *      segmentation of every dictionary word — the broadcastable
  *      `word → pieces` artifact ([[Bpe]]'s tokenize-time shape).
  *
  * Scale: identical posture to [[Bpe]] — one word-count shuffle, a
  * dict-sized driver fold (the "driver holds the model, cluster holds
  * the data" split), tokenization via broadcast segmentation join,
  * OOV words fall back to character pieces with a reported flag.
  *
  * Caveat (shared with [[Bpe.codePointOrder]]'s note): words are
  * split and measured in UTF-16 units (`substring`/`length`), while
  * the DuckDB oracle's `substr`/`length` are code-point semantics —
  * identical on BMP text, divergent on supplementary-plane corpora,
  * which would need a code-point split. The shipped corpora are
  * ASCII. */
object Unigram {

  /** Trained model: surviving pieces with Viterbi-count frequencies
    * and fixed-point costs, plus the dictionary segmentation. */
  final case class UnigramModel(pieces: Seq[(String, Long, Long)],
                                segments: Map[String, Seq[String]])

  /** Viterbi segmentation of `word` under integer piece costs:
    * minimum total cost, ties to the LONGEST last piece at each
    * position (deterministic, SQL-replayable). Every single char of
    * `word` must be in `costs` (the alphabet floor). */
  private[graft] def viterbi(word: String, costs: Map[String, Long],
                             maxPieceLen: Int): Seq[String] = {
    val n = word.length
    val dp = new Array[Long](n + 1)
    val pick = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = Long.MaxValue
      var bestL = 0
      var l = 1
      while (l <= math.min(maxPieceLen, i)) {
        costs.get(word.substring(i - l, i)) match {
          case Some(c) =>
            val v = dp(i - l) + c
            // strict < keeps the FIRST minimum per cost; scanning l
            // upward with >= preference for longer pieces = take the
            // LARGEST l achieving the minimum
            if (v < best || (v == best && l > bestL)) {
              best = v; bestL = l
            }
          case None => ()
        }
        l += 1
      }
      require(bestL > 0, s"unsegmentable position $i in '$word' — " +
        "alphabet char missing from the vocabulary")
      dp(i) = best
      pick(i) = bestL
      i += 1
    }
    // backtrack
    val out = List.newBuilder[String]
    val rev = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = n
    while (j > 0) { rev += word.substring(j - pick(j), j); j -= pick(j) }
    out ++= rev.reverse
    out.result()
  }

  /** Train on a corpus column. One word-count shuffle; everything
    * after runs on the driver over the model-sized dictionary. */
  def train(df: DataFrame, textCol: String, seedSize: Int,
            maxPieceLen: Int = 4,
            maxVocabWords: Int = 1 << 20,
            emRounds: Int = 1,
            targetVocab: Int = 0): UnigramModel = {
    require(seedSize >= 1 && maxPieceLen >= 2)
    val dict = df
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocabWords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    trainDict(dict, seedSize, maxPieceLen, emRounds, targetVocab)
  }

  /** The driver fold, exposed for specs (the [[Bpe.trainDict]]
    * posture). `emRounds` Viterbi-EM rounds (Kudo's multi-round
    * training instead of the single hard round shipped through r16):
    * each round segments the dictionary under the current costs
    * (E-step), recounts piece frequencies (M-step), drops multi-char
    * pieces with zero Viterbi count (the Kudo prune; the alphabet
    * stays, clamped ≥ 1, so coverage never regresses), and — when
    * `targetVocab` > 0 — additionally prunes to the TARGET size,
    * keeping the whole alphabet plus the top (target − |alphabet|)
    * multi-char pieces by (freq DESC, code-point ASC). Interleaving
    * the target prune with EM re-estimation is what makes the
    * pruning iterative: round t+1's counts are estimated under the
    * round-t pruned vocabulary. `emRounds = 1, targetVocab = 0`
    * reproduces the r16 model exactly. */
  private[graft] def trainDict(dict: Seq[(String, Long)], seedSize: Int,
                               maxPieceLen: Int, emRounds: Int = 1,
                               targetVocab: Int = 0): UnigramModel = {
    require(emRounds >= 1, "emRounds must be >= 1")
    // occurrence-weighted substring frequencies
    val subFreq = scala.collection.mutable.HashMap.empty[String, Long]
    val charFreq = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, c) <- dict; i <- 0 until w.length) {
      charFreq.updateWith(w.substring(i, i + 1))(
        o => Some(o.getOrElse(0L) + c))
      var l = 2
      while (l <= maxPieceLen && i + l <= w.length) {
        subFreq.updateWith(w.substring(i, i + l))(
          o => Some(o.getOrElse(0L) + c))
        l += 1
      }
    }
    val seed = subFreq.toSeq
      .sortWith { case ((p1, f1), (p2, f2)) =>
        if (f1 != f2) f1 > f2
        else Bpe.codePointOrder.compare(p1, p2) < 0
      }
      .take(seedSize)
    def costsOf(vocab: Map[String, Long]): Map[String, Long] = {
      val tot = vocab.valuesIterator.map(BigInt(_)).sum
      vocab.map { case (p, f) => p -> PortableLn.lnFp(tot, BigInt(f)) }
    }
    var vocab: Map[String, Long] = (charFreq.toSeq ++ seed).toMap
    var round = 0
    while (round < emRounds) {
      val cost = costsOf(vocab)
      // hard E-step under the current costs, then the M-step recount
      val used = scala.collection.mutable.HashMap.empty[String, Long]
      for ((w, c) <- dict; p <- viterbi(w, cost, maxPieceLen))
        used.updateWith(p)(o => Some(o.getOrElse(0L) + c))
      // Kudo zero-count prune + alphabet floor
      var next: Map[String, Long] = vocab.flatMap { case (p, _) =>
        val u = used.getOrElse(p, 0L)
        if (p.length == 1) Some(p -> math.max(1L, u))
        else if (u > 0L) Some(p -> u)
        else None
      }
      if (targetVocab > 0) {
        val chars = next.filter(_._1.length == 1)
        val keep = math.max(0, targetVocab - chars.size)
        val multi = next.iterator.filter(_._1.length > 1).toSeq
          .sortWith { case ((p1, f1), (p2, f2)) =>
            if (f1 != f2) f1 > f2
            else Bpe.codePointOrder.compare(p1, p2) < 0
          }
          .take(keep)
        next = chars ++ multi
      }
      vocab = next
      round += 1
    }
    val costF = costsOf(vocab)
    val segments = dict.map { case (w, _) =>
      w -> viterbi(w, costF, maxPieceLen) }.toMap
    val pieces = vocab.toSeq
      .sortWith((a, b) => Bpe.codePointOrder.compare(a._1, b._1) < 0)
      .map { case (p, f) => (p, f, costF(p)) }
    UnigramModel(pieces, segments)
  }

  /** The vocabulary as a DataFrame — the persistable model artifact:
    * (piece, freq, cost_fp). */
  def vocabDf(spark: org.apache.spark.sql.SparkSession,
              model: UnigramModel): DataFrame = {
    import spark.implicits._
    model.pieces.toDF("piece", "freq", "cost_fp")
  }

  /** The dictionary segmentation as a DataFrame:
    * (w, n_pieces, pieces space-joined). */
  def segmentsDf(spark: org.apache.spark.sql.SparkSession,
                 model: UnigramModel): DataFrame = {
    import spark.implicits._
    model.segments.toSeq.map { case (w, ps) =>
      (w, ps.length.toLong, ps.mkString(" "))
    }.toDF("w", "n_pieces", "pieces")
  }

  /** Tokenize a corpus: dictionary words map through the broadcast
    * segmentation; OOV words fall back to single-character pieces
    * (flagged and counted, never dropped). Output: (id, pieces,
    * n_pieces, n_oov_words) — [[Bpe.tokenize]]'s shape without the
    * end-of-word marker. */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
               model: UnigramModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val segs = model.segments.toSeq.toDF("__w", "__toks")
    df.select(col(idCol).as("__id"),
        posexplode(TextAnalysis.words(col(textCol)))
          .as(Seq("__pos", "__w")))
      .filter(col("__w") =!= "")
      .join(broadcast(segs), Seq("__w"), "left")
      .withColumn("__oov", col("__toks").isNull)
      .withColumn("__toks", coalesce(col("__toks"),
        filter(split(col("__w"), ""), s => s =!= "")))
      .groupBy(col("__id"))
      .agg(
        flatten(transform(
          array_sort(collect_list(struct(col("__pos"), col("__toks")))),
          x => x.getField("__toks"))).as("pieces"),
        sum(when(col("__oov"), 1L).otherwise(0L)).as("n_oov_words"))
      .select(col("__id").as(idCol), col("pieces"),
        size(col("pieces")).cast("long").as("n_pieces"),
        col("n_oov_words"))
  }

  /** UNK id emitted for characters outside the training alphabet
    * (OOV-word char fallback can produce them). */
  val UnkId: Int = -1

  /** Deterministic integer piece ids: the surviving vocabulary in
    * code-point order takes 0..V-1 — reproducible across runs and
    * engines given the same model ([[Bpe.vocab]]'s contract). */
  def vocabIds(model: UnigramModel): Seq[(String, Int)] =
    model.pieces.map(_._1).zipWithIndex

  /** Tokenize to integer token IDS: [[tokenize]]'s segmentation, each
    * piece mapped through the vocabulary as a map LITERAL (model-sized
    * — no join, no UDF, pure codegen'd column work). Characters
    * outside the alphabet become [[UnkId]] and are counted. Output:
    * (id, token_ids, n_tokens, n_oov_words, n_unk) —
    * [[Bpe.encodeIds]]'s shape. */
  def encodeIds(df: DataFrame, idCol: String, textCol: String,
                model: UnigramModel): DataFrame = {
    val v = vocabIds(model)
    val idMap = map_from_arrays(
      array(v.map(t => lit(t._1)): _*),
      array(v.map(t => lit(t._2)): _*))
    tokenize(df, idCol, textCol, model)
      .withColumn("token_ids", transform(col("pieces"),
        t => coalesce(element_at(idMap, t), lit(UnkId))))
      .withColumn("n_unk",
        size(filter(col("token_ids"), i => i === UnkId)).cast("long"))
      .select(col(idCol), col("token_ids"), col("n_pieces").as("n_tokens"),
        col("n_oov_words"), col("n_unk"))
  }

  /** Per-language fertility under the unigram model — the
    * [[Bpe.fertility]] report for the competing tokenizer family, so
    * the two can be compared on one corpus. Output: (lang, n_docs,
    * n_words, n_tokens, n_bytes, n_oov_words, fertility_bp,
    * bytes_per_token_bp, oov_bp). */
  def fertility(df: DataFrame, idCol: String, textCol: String,
                langCol: String, model: UnigramModel): DataFrame = {
    val meta = df.select(col(idCol),
      col(langCol).as("lang"),
      octet_length(col(textCol)).cast("long").as("__bytes"),
      size(filter(TextAnalysis.words(col(textCol)), w => w =!= ""))
        .cast("long").as("__words"))
    tokenize(df, idCol, textCol, model)
      .join(meta, Seq(idCol))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__words")).as("n_words"),
        sum(col("n_pieces")).as("n_tokens"),
        sum(col("__bytes")).as("n_bytes"),
        sum(col("n_oov_words")).as("n_oov_words"))
      .withColumn("fertility_bp",
        expr("(10000 * n_tokens) div greatest(1L, n_words)"))
      .withColumn("bytes_per_token_bp",
        expr("(10000 * n_bytes) div greatest(1L, n_tokens)"))
      .withColumn("oov_bp",
        expr("(10000 * n_oov_words) div greatest(1L, n_words)"))
  }
}
