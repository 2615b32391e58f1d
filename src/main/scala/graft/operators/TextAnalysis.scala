package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines: token counting,
  * quality scoring, language ID, fingerprinting.
  *
  * Everything is built from codegen'd native functions (split /
  * regexp_extract_all / higher-order array functions) — no UDFs, so the
  * expressions stay inside whole-stage codegen and scale linearly with a
  * parquet scan.
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(words(text))

  /** BPE-ish token estimate: runs of word chars, or single punctuation
    * marks — a cheap proxy for subword tokenizer counts. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9_\\s]"), lit(0)))

  private val Stopwords =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  /** Fraction of whitespace tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val w = words(text)
    val stops = filter(w, t => t.isInCollection(Stopwords))
    size(stops).cast("double") / size(w)
  }

  /** Composite quality score in [0, 1]:
    * 0.4·min(1, words/64) + 0.3·(1 − punct/chars) + 0.3·stopword_ratio.
    * All inputs are exact integers, so the double arithmetic is
    * bit-reproducible across engines. */
  def qualityScore(text: Column): Column = {
    val w = size(words(text)).cast("double")
    val chars = length(text).cast("double")
    val punct = punctCount(text).cast("double")
    least(lit(1.0), w / 64.0) * 0.4 +
      (lit(1.0) - punct / chars) * 0.3 +
      stopwordRatio(text) * 0.3
  }

  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "with", "a"),
    "de" -> Seq("der", "die", "und", "nicht"),
    "es" -> Seq("el", "los", "las", "es"),
    "fr" -> Seq("le", "les", "et", "est")
  )

  private def markerCount(text: Column, markers: Seq[String]): Column =
    size(filter(words(lower(text)), t => t.isInCollection(markers)))

  /** Marker-word / CJK-script language heuristic. Returns the language
    * with the highest marker count (ties broken in en>de>es>fr order),
    * "zh" when CJK characters are present, "und" when nothing matches. */
  def langId(text: Column): Column = {
    val counts = LangMarkers.map { case (lang, ms) => lang -> markerCount(text, ms) }
    val cjk = size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    val best = counts.tail.foldLeft(counts.head._2)((m, c) => greatest(m, c._2))
    val pick = counts.foldLeft(when(cjk > 0, "zh")) { case (acc, (lang, c)) =>
      acc.when(c === best && best > 0, lang)
    }
    pick.otherwise("und")
  }

  /** Document fingerprint: winnowing-style minimum over k-gram hashes,
    * plus the distinct k-gram count. Deterministic (murmur3 via `hash`). */
  def fingerprint(text: Column, k: Int = 8): Column = {
    val grams = transform(
      sequence(lit(1), greatest(lit(1), length(text) - (k - 1))),
      i => hash(substring2(text, i, lit(k))).cast("long"))
    struct(
      array_min(grams).as("min_hash"),
      size(array_distinct(grams)).as("distinct_grams"))
  }

  /** substring with column arguments (functions.substring takes Ints). */
  private def substring2(str: Column, pos: Column, len: Column): Column =
    str.substr(pos, len)
}
