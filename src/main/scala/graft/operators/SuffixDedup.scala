package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT substring duplication via a distributed suffix array — the
  * suffix-array half of Lee et al., "Deduplicating Training Data Makes
  * Language Models Better" (ACL 2022): window-based duplicate
  * accounting (Dedup.duplicatedWindows / duplicatedSpans) only sees
  * duplication at fixed window alignments; the suffix array reports the
  * MAXIMAL shared-prefix length between lexicographically adjacent
  * suffixes, catching duplicate runs of any length at any alignment.
  *
  * Construction is Manber–Myers prefix doubling re-expressed as
  * DataFrame passes (the standard distributed formulation — no driver
  * loop over data, no global windows):
  *   rank_0(d,p)   = dense rank of token(d,p) over the vocabulary
  *   rank_j(d,p)   = dense rank of (rank_{j-1}(d,p),
  *                                  rank_{j-1}(d,p+2^{j-1}) or 0)
  * where the 0 for past-the-end encodes "shorter suffix sorts first" —
  * the same convention as SQL list comparison, so a DuckDB
  * `ORDER BY suffix_list` replays the identical total order. Suffixes
  * never cross document boundaries (token streams are per-document).
  * Each dense rank is one distinct + distributed range-sort +
  * zipWithIndex (two narrow jobs); the loop runs ceil(log2 maxDl)
  * times or exits early once every rank is unique — on natural text
  * ranks separate within a few levels and only true duplicate runs
  * keep doubling, so the level count tracks log2 of the LONGEST
  * duplicate, not of the corpus.
  *
  * The LCP of each suffix-array-adjacent pair is then computed
  * directly (one codegen zip_with over length-capped token slices —
  * adjacent-pair LCPs are what excision needs; interior pairs of a
  * tied group share at least the reported prefix by transitivity).
  *
  * All outputs are integers, so the report hash-checks against a
  * brute-force SQL suffix sort. Output: (doc_a, pos_a, doc_b, pos_b,
  * lcp) for adjacent pairs with lcp ≥ minLen; positions 1-based;
  * lcp is capped at `maxLcp` (a pair reported AT the cap shares at
  * least that many tokens).
  *
  * Known optimization, deliberately not taken yet: after each level,
  * positions whose rank is already unique are fully ordered and could
  * be frozen, shrinking the re-ranked set to positions inside
  * still-tied groups (∝ duplicated text volume, which collapses
  * geometrically). That trades the simple whole-corpus dense rank per
  * level for an overlay bookkeeping frame; worth it if SA construction
  * ever dominates a pipeline. The current shape is the textbook
  * O(log maxDocLen) distributed sorts bound.
  */
object SuffixDedup {

  /** Dense rank of (k1, k2) keys: distinct → distributed range sort →
    * zipWithIndex (per-partition sizes then offsets — never a single
    * task). Unique keys make the order total, so the assignment is
    * deterministic. Returns (k1, k2, r) with r in [1, #distinct]. */
  private def denseRank(keys: DataFrame): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.distinct().orderBy(col("k1"), col("k2")).rdd
      .map(r => (r.getLong(0), r.getLong(1)))
      .zipWithIndex()
      .map { case ((k1, k2), i) => (k1, k2, i + 1) }
      .toDF("k1", "k2", "r")
      .localCheckpoint(true)
  }

  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      minLen: Int, maxLcp: Int = 512): DataFrame = {
    require(minLen >= 1, "minLen must be >= 1")
    require(maxLcp >= minLen, "maxLcp must be >= minLen")
    val spark = df.sparkSession
    import spark.implicits._

    val toks = df.select(col(idCol).cast("long").as("doc"),
        split(trim(col(textCol)), "\\s+").as("ta"))
      .filter(col("ta").isNotNull)
      .localCheckpoint(true) // positions now + LCP token slices later
    val statsRow = toks.agg(
      coalesce(max(size(col("ta"))), lit(0)).as("m"),
      coalesce(sum(size(col("ta")).cast("long")), lit(0L)).as("n")).head
    val maxDl = statsRow.getInt(0)
    val nPos = statsRow.getLong(1)
    val empty = Seq.empty[(Long, Int, Long, Int, Long)]
      .toDF("doc_a", "pos_a", "doc_b", "pos_b", "lcp")
    if (nPos < 2) return empty

    // rank_0: vocabulary dense rank (UTF8-binary order — the same
    // order DuckDB compares VARCHARs by)
    val positions = toks.select(col("doc"),
        posexplode(col("ta")).as(Seq("pos0", "tok")))
      .select(col("doc"), (col("pos0") + 1).as("pos"), col("tok"))
    val vocab = positions.select(col("tok")).distinct()
      .orderBy(col("tok")).rdd.map(_.getString(0)).zipWithIndex()
      .map { case (t, i) => (t, i + 1) }.toDF("tok", "r")
      .localCheckpoint(true)
    var cur = positions.join(vocab, Seq("tok"))
      .select(col("doc"), col("pos"), col("r").as("rank"))
      .localCheckpoint(true)
    var distinctRanks = vocab.count()

    // prefix doubling: after the level with offset 2^j, rank order ==
    // order of the first 2^(j+1) tokens of each suffix
    var off = 1L
    while (distinctRanks < nPos && off < maxDl) {
      val nxt = cur.select(col("doc"), (col("pos") - lit(off)).as("pos"),
        col("rank").as("__nr"))
      val keyed = cur.join(nxt, Seq("doc", "pos"), "left")
        .select(col("doc"), col("pos"), col("rank").as("k1"),
          coalesce(col("__nr"), lit(0L)).as("k2"))
        .localCheckpoint(true) // feeds the distinct AND the rank join
      val rk = denseRank(keyed.select(col("k1"), col("k2")))
      cur = keyed.join(rk, Seq("k1", "k2"))
        .select(col("doc"), col("pos"), col("r").as("rank"))
        .localCheckpoint(true)
      distinctRanks = rk.count()
      off *= 2
    }

    // suffix-array order = (rank, doc, pos); exactly-equal suffixes
    // (the only possible rank ties after full doubling) tie-break by
    // (doc, pos) — mirror `ORDER BY suffix, doc, pos` in any oracle
    val sa = cur.orderBy(col("rank"), col("doc"), col("pos")).rdd
      .map(r => (r.getLong(0), r.getInt(1)))
      .zipWithIndex()
      .map { case ((d, p), i) => (d, p, i) }
      .toDF("doc", "pos", "idx")
      .localCheckpoint(true) // both sides of the adjacency join
    val pairs = sa.select(col("doc").as("doc_a"), col("pos").as("pos_a"),
        col("idx"))
      .join(sa.select(col("doc").as("doc_b"), col("pos").as("pos_b"),
        (col("idx") - 1).as("idx")), Seq("idx"))
      .drop("idx")

    // adjacent-pair LCP over maxLcp-capped slices: zip_with pads the
    // shorter slice with nulls, so x <=> y turns a length difference
    // into the first mismatch (shorter suffix IS the prefix)
    val withA = pairs.join(toks.select(col("doc").as("doc_a"),
      col("ta").as("__ta")), Seq("doc_a"))
    val withB = withA.join(toks.select(col("doc").as("doc_b"),
      col("ta").as("__tb")), Seq("doc_b"))
    withB
      .withColumn("__sa", slice(col("__ta"), col("pos_a"), lit(maxLcp)))
      .withColumn("__sb", slice(col("__tb"), col("pos_b"), lit(maxLcp)))
      .withColumn("__mism", array_position(
        zip_with(col("__sa"), col("__sb"), (x, y) => x <=> y), false))
      .withColumn("lcp",
        when(col("__mism") === 0L,
          least(size(col("__sa")), size(col("__sb"))).cast("long"))
          .otherwise(col("__mism") - 1L))
      .filter(col("lcp") >= minLen)
      .select(col("doc_a"), col("pos_a"), col("doc_b"), col("pos_b"),
        col("lcp"))
  }

  /** The excision half of ExactSubstr dedup: fold [[duplicatedSpans]]
    * pairs into per-document token ranges to CUT. For each adjacent
    * pair the occurrence at the LARGER (doc, pos) is the cut candidate
    * — the smallest copy survives, and inside a group of k identical
    * suffixes the adjacency chain marks exactly the k−1 later copies.
    * Candidate half-open intervals [pos, pos+lcp) merge when they
    * overlap or touch (gaps-and-islands per doc; the window partitions
    * by doc, bounded by that doc's span count — never corpus-wide).
    * Output: (doc, cut_from, cut_until, n_spans), 1-based token
    * positions, cut_until exclusive. */
  def exciseRanges(spans: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = spans.select(
        when(col("doc_a") > col("doc_b") ||
          (col("doc_a") === col("doc_b") && col("pos_a") > col("pos_b")),
          struct(col("doc_a").as("d"), col("pos_a").as("p")))
          .otherwise(struct(col("doc_b").as("d"), col("pos_b").as("p")))
          .as("c"),
        col("lcp"))
      .select(col("c.d").as("doc"), col("c.p").cast("long").as("f"),
        (col("c.p") + col("lcp")).cast("long").as("u"))
    val w = Window.partitionBy(col("doc")).orderBy(col("f"), col("u"))
    cand
      .withColumn("__maxu", max(col("u")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__maxu").isNull || col("f") > col("__maxu"), 1L)
          .otherwise(0L))
      .withColumn("__grp", sum(col("__new")).over(w))
      .groupBy(col("doc"), col("__grp"))
      .agg(min(col("f")).as("cut_from"), max(col("u")).as("cut_until"),
        count(lit(1)).as("n_spans"))
      .select(col("doc"), col("cut_from"), col("cut_until"),
        col("n_spans"))
  }
}
