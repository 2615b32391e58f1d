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
  * Tied-group refinement (the optimization that makes this 100-TB
  * shaped): ranks here are POSITION ranks — pr(p) = #positions with a
  * strictly smaller key, so a rank class occupying [pr, pr+size)
  * refines IN PLACE: pr'(p) = pr(p) + #{q in the class : k2(q) <
  * k2(p)}, computed by a window partitioned by the class (bounded by
  * duplicate multiplicity, never corpus-wide). Positions whose rank is
  * already unique are fully ordered and FROZEN — each level re-ranks
  * only the still-tied set, which collapses geometrically toward the
  * positions inside true duplicate runs. Per level the corpus-sized
  * work is two lineage-free scans (the k2 lookup join and the rank
  * overlay, broadcast once the tied set is small); only level 1
  * shuffles corpus-sized frames.
  */
object SuffixDedup {

  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      minLen: Int, maxLcp: Int = 512): DataFrame = {
    import org.apache.spark.sql.expressions.Window
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

    // pr_0: per-token position rank = exclusive prefix sum of sorted
    // vocabulary counts (UTF8-binary order — the order DuckDB compares
    // VARCHARs by). Distributed range sort; only the ≤ #partitions
    // per-partition subtotals reach the driver.
    val positions = toks.select(col("doc"),
        posexplode(col("ta")).as(Seq("pos0", "tok")))
      .select(col("doc"), (col("pos0") + 1).as("pos"), col("tok"))
    val sortedVc = positions.groupBy(col("tok"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("tok")).rdd
      .map(r => (r.getString(0), r.getLong(1)))
    val partTotals = sortedVc
      .mapPartitionsWithIndex { (i, it) =>
        Iterator((i, it.foldLeft(0L)(_ + _._2))) }
      .collect().sortBy(_._1).map(_._2)
    val partOffsets = partTotals.scanLeft(0L)(_ + _)
    val vocabPr = sortedVc
      .mapPartitionsWithIndex { (i, it) =>
        var run = partOffsets(i)
        it.map { case (t, c) => val p = run; run += c; (t, p, c) }
      }.toDF("tok", "pr", "c")
      .localCheckpoint(true)
    var prTab = positions.join(vocabPr, Seq("tok"))
      .select(col("doc"), col("pos"), col("pr"), col("c"))
      .localCheckpoint(true)
    var tied = prTab.filter(col("c") >= 2)
      .select(col("doc"), col("pos"), col("pr"))
      .localCheckpoint(true)
    prTab = prTab.drop("c")

    // prefix doubling over the tied set only: after the level with
    // offset `off`, ranks order the first 2·off tokens of each suffix
    var off = 1L
    var tiedCount = tied.count()
    while (tiedCount > 0 && off < maxDl) {
      // k2 = pr_{level-1}(doc, pos+off); past-the-end sorts first
      val lookup = prTab.select(col("doc"),
        (col("pos") - lit(off)).as("pos"), col("pr").as("__nr"))
      val keyed = tied.join(lookup, Seq("doc", "pos"), "left")
        .select(col("doc"), col("pos"), col("pr"),
          coalesce(col("__nr"), lit(-1L)).as("k2"))
      // in-place class refinement: rank() ties keep refined classes
      // tied; the window partitions by the CLASS (size = duplicate
      // multiplicity), never by anything corpus-wide
      val w = Window.partitionBy(col("pr")).orderBy(col("k2"))
      val upd = keyed
        .select(col("doc"), col("pos"),
          (col("pr") + rank().over(w) - 1L).as("npr"))
        .localCheckpoint(true) // feeds the size agg AND both overlays
      val sizes = upd.groupBy(col("npr")).agg(count(lit(1)).as("n"))
      tied = upd.join(broadcast(sizes.filter(col("n") >= 2)), Seq("npr"))
        .select(col("doc"), col("pos"), col("npr").as("pr"))
        .localCheckpoint(true)
      // overlay the refined ranks onto the full table (broadcast-hash
      // once upd is small — one corpus scan, no shuffle)
      prTab = prTab.join(upd, Seq("doc", "pos"), "left")
        .select(col("doc"), col("pos"),
          coalesce(col("npr"), col("pr")).as("pr"))
        .localCheckpoint(true)
      tiedCount = tied.count()
      off *= 2
    }

    // suffix-array order = (pr, doc, pos); exactly-equal suffixes
    // (the only possible rank ties after full doubling) tie-break by
    // (doc, pos) — mirror `ORDER BY suffix, doc, pos` in any oracle
    val sa = prTab.orderBy(col("pr"), col("doc"), col("pos")).rdd
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
