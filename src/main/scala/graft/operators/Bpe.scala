package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and application — the
  * "train a tokenizer over the corpus" step of an LLM data pipeline
  * (Sennrich et al., ACL 2016).
  *
  * Reference analogue: none (beyond-reference LLM-pipeline capability;
  * [[TextAnalysis.bpeTokenCount]] is only a counting proxy).
  *
  * Scale design: BPE statistics never need corpus rows — merges are a
  * function of the WORD-FREQUENCY DICTIONARY alone (pairs never cross
  * word boundaries). So the distributed part is exactly one
  * word-count-shaped partial-agg shuffle producing (word, count),
  * pruned to the top `maxVocabWords` by count (Heaps' law bounds the
  * useful dictionary; the sort ranks the vocab table, not the corpus).
  * The merge loop then runs on the driver over that model-sized
  * dictionary — the same "driver holds the model, cluster holds the
  * data" split as Ivf/Pq k-means. Tokenization back at scale is a
  * broadcast join of the precomputed word→tokens segmentation (one
  * row per dictionary word); out-of-dictionary words fall back to
  * character tokens, so coverage degrades gracefully and is REPORTED
  * (`oov` flag per word) rather than silent.
  *
  * Determinism: the winning pair each round is (max count, then
  * lexicographically smallest pair) — total order, so training is
  * reproducible across runs and cluster layouts given the same pruned
  * dictionary; the dictionary prune itself orders by (count DESC,
  * word) for the same reason.
  */
object Bpe {

  /** One learned merge: `left`+`right` fused at `rank` (0-based), with
    * the weighted pair count that won the round. */
  final case class Merge(rank: Int, left: String, right: String,
                         count: Long)

  /** Trained model: the ordered merge list plus the final
    * segmentation of every dictionary word (the training byproduct —
    * applying the merges is free for dictionary words). */
  final case class BpeModel(merges: Seq[Merge],
                            segments: Map[String, Seq[String]])

  /** End-of-word marker appended as a separate initial symbol, so
    * merges can distinguish word-final fusions ("er</w>" vs "er"). */
  val Eow = "</w>"

  private[graft] def initSymbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ Eow

  /** Code-point lexicographic String order. The default String order
    * compares UTF-16 code units, which sorts supplementary-plane
    * characters (surrogate pairs, 0xD800-prefixed) BEFORE U+E000..
    * U+FFFF; code-point order equals binary UTF-8 collation — what
    * DuckDB's ORDER BY uses — so tie-breaks and vocab ids stay
    * engine-portable beyond the BMP. (Note initSymbols still splits
    * words into UTF-16 units, so a supplementary-plane corpus would
    * also need a code-point split; the shipped corpora are ASCII.) */
  private[graft] val codePointOrder: Ordering[String] = (x, y) => {
    val n = math.min(x.length, y.length)
    var i = 0
    var r = 0
    while (r == 0 && i < n) {
      val cx = x.codePointAt(i)
      r = Integer.compare(cx, y.codePointAt(i))
      if (r == 0) i += Character.charCount(cx)
    }
    if (r != 0) r else Integer.compare(x.length, y.length)
  }

  /** Sequential BPE over a (word → count) dictionary. Exposed
    * package-private so specs can drive it directly. */
  private[graft] def trainDict(dict: Seq[(String, Long)],
                               numMerges: Int): BpeModel = {
    var words: Vector[(Vector[String], Long)] =
      dict.toVector.map { case (w, c) => (initSymbols(w), c) }
    val merges = Vector.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(
          o => Some(o.getOrElse(0L) + c))
      if (counts.isEmpty) done = true
      else {
        // winner = (max count, code-point-smallest pair): total order,
        // and the tie-break collates identically in any engine
        val (pair, c) = counts.min(
          Ordering.fromLessThan[((String, String), Long)] {
            case (((a1, b1), n1), ((a2, b2), n2)) =>
              if (n1 != n2) n1 > n2
              else {
                val ca = codePointOrder.compare(a1, a2)
                if (ca != 0) ca < 0
                else codePointOrder.compare(b1, b2) < 0
              }
          })
        if (c < 2) done = true // a pair seen once compresses nothing
        else {
          merges += Merge(rank, pair._1, pair._2, c)
          val fused = pair._1 + pair._2
          words = words.map { case (syms, wc) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == pair._1 &&
                  syms(i + 1) == pair._2) { out += fused; i += 2 }
              else { out += syms(i); i += 1 }
            }
            (out.result(), wc)
          }
          rank += 1
        }
      }
    }
    BpeModel(merges.result(),
      dict.map(_._1).zip(words.map(_._1)).toMap)
  }

  /** Train on a corpus column: one word-count shuffle, a vocab-table
    * prune, then the driver merge loop over the dictionary. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxVocabWords: Int = 1 << 20): BpeModel = {
    val dict = df
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocabWords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    trainDict(dict, numMerges)
  }

  /** The merge table as a DataFrame — the distributable model
    * artifact (persist with a plain parquet write). */
  def mergesDf(spark: org.apache.spark.sql.SparkSession,
               model: BpeModel): DataFrame = {
    import spark.implicits._
    model.merges.toDF("rank", "left", "right", "count")
  }

  /** The model's vocabulary with deterministic integer ids — the
    * artifact a training run consumes. Id space: the initial alphabet
    * (every character of every dictionary word, plus [[Eow]]) sorted
    * lexicographically takes 0..A-1; merged symbols follow in rank
    * order at A+rank. Reproducible across runs given the same model. */
  def vocab(model: BpeModel): Seq[(String, Int)] = {
    val alphabet = model.segments.keysIterator
      .flatMap(w => initSymbols(w)).toSet.toSeq.sorted(codePointOrder)
    val merged = model.merges.sortBy(_.rank).map(m => m.left + m.right)
    // first occurrence wins: a fused string can collide with an
    // alphabet symbol (markup text containing literal "</w>") or with
    // another merge ("a"+"ab" and "aa"+"b" both fuse to "aab") — the
    // id map must stay duplicate-free or map_from_arrays throws
    (alphabet ++ merged).distinct.zipWithIndex
  }

  /** UNK id emitted for characters outside the training alphabet. */
  val UnkId: Int = -1

  /** Tokenize to integer token IDS: [[tokenize]]'s segmentation, then
    * each token mapped through the model vocabulary embedded as a map
    * LITERAL (model-sized — alphabet + one entry per merge; no join,
    * no UDF, pure codegen'd column work). Characters outside the
    * training alphabet become [[UnkId]] and are counted per document.
    * Output: (id, token_ids, n_tokens, n_oov_words, n_unk). */
  def encodeIds(df: DataFrame, idCol: String, textCol: String,
                model: BpeModel): DataFrame = {
    val v = vocab(model)
    val idMap = map_from_arrays(
      array(v.map(t => lit(t._1)): _*),
      array(v.map(t => lit(t._2)): _*))
    tokenize(df, idCol, textCol, model)
      .withColumn("token_ids", transform(col("tokens"),
        t => coalesce(element_at(idMap, t), lit(UnkId))))
      .withColumn("n_unk",
        size(filter(col("token_ids"), i => i === UnkId)).cast("long"))
      .select(col(idCol), col("token_ids"), col("n_tokens"),
        col("n_oov_words"), col("n_unk"))
  }

  /** Tokenize a corpus with a trained model. Dictionary words map
    * through the broadcast segmentation (one BroadcastHashJoin, no
    * per-row merge loop anywhere near the data); OOV words fall back
    * to character symbols + [[Eow]]. Output: (id, tokens, n_tokens,
    * n_oov_words) with tokens in original word order. */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
               model: BpeModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val segs = model.segments.toSeq
      .map { case (w, toks) => (w, toks) }
      .toDF("__w", "__toks")
    val positioned = df
      .select(col(idCol).as("__id"),
        posexplode(TextAnalysis.words(col(textCol)))
          .as(Seq("__pos", "__w")))
      .filter(col("__w") =!= "")
      .join(broadcast(segs), Seq("__w"), "left")
      .withColumn("__oov", col("__toks").isNull)
      // OOV fallback: characters + the end-of-word marker, exactly the
      // pre-merge symbol alphabet
      .withColumn("__toks", coalesce(col("__toks"),
        concat(filter(split(col("__w"), ""), s => s =!= ""),
          array(lit(Eow)))))
    positioned
      .groupBy(col("__id"))
      .agg(
        flatten(transform(
          array_sort(collect_list(struct(col("__pos"), col("__toks")))),
          x => x.getField("__toks"))).as("tokens"),
        sum(when(col("__oov"), 1L).otherwise(0L)).as("n_oov_words"))
      .select(col("__id").as(idCol), col("tokens"),
        size(col("tokens")).cast("long").as("n_tokens"),
        col("n_oov_words"))
  }

  /** Tokenizer fertility report — the per-language coverage check run
    * before committing a tokenizer to a training run: pieces per word
    * (`fertility_bp = 10^4·Σn_tokens div Σn_words`, Eow markers
    * included, so a fully in-vocabulary word costs ≥ 2), bytes per
    * piece, and the OOV-word share. A language whose fertility is 2–3×
    * the corpus median is being shredded to characters and will train
    * badly at its nominal data share.
    *
    * Scale: [[tokenize]]'s broadcast-segmentation pass, one id-keyed
    * equi-join back to the (lang, bytes, words) projection, one
    * partial agg to languages-sized output. Output: (lang, n_docs,
    * n_words, n_tokens, n_bytes, n_oov_words, fertility_bp,
    * bytes_per_token_bp, oov_bp). */
  def fertility(df: DataFrame, idCol: String, textCol: String,
                langCol: String, model: BpeModel): DataFrame = {
    val meta = df.select(col(idCol),
      col(langCol).as("lang"),
      octet_length(col(textCol)).cast("long").as("__bytes"),
      size(filter(TextAnalysis.words(col(textCol)), w => w =!= ""))
        .cast("long").as("__words"))
    tokenize(df, idCol, textCol, model)
      .join(meta, Seq(idCol))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__words")).as("n_words"),
        sum(col("n_tokens")).as("n_tokens"),
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
