package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.{Queries, QueryPack}
import graft.core.{Intervals, Tables}
import graft.operators.{BloomJoin, ConnectedComponents, Layout, Linkage,
  Profile, Quantize, Splits, TextIndex, TrainingSet}

/** Scale-posture operators: bucketized interval-overlap join, bloom-
  * pruned join, weighted corpus mixing, profiling histograms, int8
  * quantization + quantized MIPS, inverted-index postings.
  */
object ScalePack extends QueryPack {

  // ΣW = 11; the oracle SQL embeds the same weights and total.
  private val MixWeights = Seq(
    "en" -> 5L, "zh" -> 2L, "de" -> 2L, "fr" -> 1L, "es" -> 1L)

  // Shared by the q71 query AND its oracle: the oracle embeds the
  // SAME (query_id, token) pairs, tokenized by the SAME Scala split.
  private val Bm25Queries = Seq(
    1L -> "hash join strategy",
    2L -> "customer order filter",
    3L -> "slow batch scan")

  /** Order fulfillment window: [orderdate, +90). */
  private def orderWindows(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders").select(
      col("o_orderkey"),
      to_date(col("o_orderdate")).as("valid_from"),
      date_add(to_date(col("o_orderdate")), 90).as("valid_until"))

  /** Line shipping window: [shipdate, shipdate + 1 + linenumber%7). */
  private def shipWindows(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem").select(
      col("l_orderkey").as("o_orderkey"),
      col("l_linenumber"),
      to_date(col("l_shipdate")).as("valid_from"),
      expr("date_add(to_date(l_shipdate), 1 + l_linenumber % 7)")
        .as("valid_until"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // keyed interval-overlap join via epoch bucketing (the range join
    // Spark would otherwise nested-loop): order fulfillment windows ⋈
    // line shipping windows per orderkey, with the overlap intersection
    "q64_overlap_join" -> ((s, dir) =>
      Intervals.overlapJoin(
        orderWindows(s, dir), shipWindows(s, dir),
        keys = Seq("o_orderkey"), bucketDays = 30)
        .select(col("o_orderkey"), col("l_linenumber"),
          col("valid_from").cast("string").as("valid_from"),
          col("valid_until").cast("string").as("valid_until"),
          col("valid_from_b").cast("string").as("valid_from_b"),
          col("valid_until_b").cast("string").as("valid_until_b"),
          col("overlap_from").cast("string").as("overlap_from"),
          col("overlap_until").cast("string").as("overlap_until"))),

    // deterministic weighted domain mix (integer-exact downsampling)
    "q65_weighted_mix" -> ((s, dir) =>
      Splits.weightedMix(Tables.load(s, dir, "documents"),
        "lang", "doc_id", MixWeights.toMap)
        .select("doc_id", "lang")),

    // bloom-pruned selective join (exact; the bloom only cuts shuffle)
    "q66_bloom_join" -> ((s, dir) => {
      val small = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 490000.0)
        .select(col("o_orderkey"), col("o_totalprice"))
      BloomJoin.prunedJoin(
        Tables.load(s, dir, "lineitem"), small,
        "l_orderkey", "o_orderkey", expectedItems = 100000L)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("o_totalprice") * 100).cast("long").as("price_cents"),
          round(col("l_extendedprice") * 100).cast("long").as("ext_cents"))
    }),

    // all-integer equi-width histogram profile per group
    "q67_histogram" -> ((s, dir) =>
      Profile.histogram(Tables.load(s, dir, "lineitem"),
        "l_returnflag", "l_quantity", nBuckets = 8)),

    // int8 symmetric quantization of the embedding corpus (exploded to
    // (id, pos, q) rows so every code is hash-checked)
    "q68_quantize" -> ((s, dir) => {
      val t = Tables.load(s, dir, "embeddings")
      Quantize.quantizedLong(t, "vec_id", "embedding",
        Quantize.scaleOf(t, "embedding"))
    }),

    // quantized maximum-inner-product top-k (all-integer ranking)
    "q69_qmips" -> ((s, dir) => {
      val t = Tables.load(s, dir, "embeddings")
      Quantize.topKQuantized(t, "vec_id", "embedding",
        pmod(col("vec_id"), lit(50)) === 0, k = 10,
        Quantize.scaleOf(t, "embedding"))
    }),

    // inverted-index postings with document-frequency pruning
    "q70_inverted_index" -> ((s, dir) =>
      TextIndex.invertedIndex(Tables.load(s, dir, "documents"),
        "doc_id", "text", minDf = 25)),

    // BM25 top-k at the exact-integer (k1=1.2, b=0.75) profile: idf
    // through the portable fixed-point ln kernel (driver-side for the
    // query panel; the oracle replays the SAME integer algorithm as a
    // recursive CTE), saturation as one floor division — scores
    // hash-check bit-for-bit
    "q71_bm25" -> ((s, dir) =>
      TextIndex.bm25TopKExactFp(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        queries = Bm25Queries, k = 10)),

    // EXACT substring duplication via the distributed suffix array
    // (Lee et al. ACL'22 ExactSubstr class): prefix-doubling ranks,
    // SA-adjacent pairs, capped LCP — catches duplicate runs the
    // window-aligned q80/q82 accounting can't, at ANY alignment and
    // with the exact maximal length. All-integer output; the oracle
    // is a brute-force SQL suffix sort on the same doc slice (the
    // slice is a distributed input filter, so it may scale with SF —
    // it is NOT a driver panel)
    "q268_suffix_spans" -> ((s, dir) =>
      graft.operators.SuffixDedup.duplicatedSpans(
        Tables.load(s, dir, "documents")
          .filter(pmod(col("doc_id"), lit(2)) === 0),
        "doc_id", "text", minLen = 8)),

    // the excision half of ExactSubstr: q268's spans folded into
    // per-doc merged cut ranges (larger-(doc,pos) copy is cut, the
    // smallest copy survives; adjacency chains mark all k−1 later
    // copies of a k-way duplicate)
    "q269_sa_excise" -> ((s, dir) =>
      graft.operators.SuffixDedup.exciseRanges(
        graft.operators.SuffixDedup.duplicatedSpans(
          Tables.load(s, dir, "documents")
            .filter(pmod(col("doc_id"), lit(2)) === 0),
          "doc_id", "text", minLen = 8))),

    // the ExactSubstr TRANSFORM: the merged cut ranges applied to the
    // corpus text — later copies of each duplicate run are excised,
    // the smallest copy survives, cleaned text hash-checks exactly
    "q271_sa_excise_text" -> ((s, dir) =>
      graft.operators.SuffixDedup.exciseText(
        Tables.load(s, dir, "documents")
          .filter(pmod(col("doc_id"), lit(2)) === 0),
        "doc_id", "text", minLen = 8)),

    // SA-path curation pipeline (q98's posture on the suffix-array
    // transform): excise -> kept-length gate -> per-language survivor
    // accounting; proves the SA path composes downstream
    "q272_sa_pipeline" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(2)) === 0)
      val cleaned = graft.operators.SuffixDedup.exciseText(
          docs, "doc_id", "text", minLen = 8)
        .withColumn("n_kept", col("n_tokens") - col("n_removed"))
        .filter(col("n_kept") >= 20)
      cleaned
        .join(docs.select(col("doc_id").as("doc"), col("lang")),
          Seq("doc"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_kept")).as("kept_tokens"),
          sum(col("n_removed")).as("removed_tokens"))
    }),

    // incremental ExactSubstr: duplicated spans a NEW batch (doc_id %
    // 4 = 2) introduces against an append-only corpus (doc_id % 4 =
    // 0), WITHOUT rebuilding the corpus suffix array — one corpus
    // gram scan finds the affected docs, the doubling loop runs over
    // batch ∪ affected only. Union = q268's exact doc slice, so the
    // oracle's brute sort replays the identical blocks.
    "q273_sa_probe" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.SuffixDedup.probeSpans(
        docs.filter(pmod(col("doc_id"), lit(4)) === 0),
        docs.filter(pmod(col("doc_id"), lit(4)) === 2),
        "doc_id", "text", minLen = 8)
    }),

    // the SA-dedup CAPSTONE: ExactSubstr excision composed with the
    // LSH/packing stages in ONE hash-checked chain — exciseText →
    // kept-length gate → portable MinHash+LSH near-dup removal →
    // token-budget bin packing, per-language bin accounting. Proves
    // the suffix-array path slots into the q98-style curation pipeline
    // rather than existing as an island.
    "q274_sa_lsh_pack" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(2)) === 0)
      // checkpointed: the LSH branch and the anti-join/packing branch
      // both read the cleaned corpus, and the SA excision is the
      // dominant subtree — without this it executes twice
      val cleaned = graft.operators.SuffixDedup.exciseText(
          docs, "doc_id", "text", minLen = 8)
        .filter(col("n_tokens") - col("n_removed") >= 10)
        .join(docs.select(col("doc_id").as("doc"), col("lang")),
          Seq("doc"))
        .select(col("doc").as("doc_id"), col("lang"),
          col("clean_text").as("text"))
        .localCheckpoint(true)
      val dupIds = graft.operators.Dedup.minhashLshPortable(cleaned,
          "doc_id", "text", n = 3, numPerms = 8, bands = 4,
          minMatch = 6)
        .select(col("id_b").as("doc_id")).distinct()
      graft.operators.Chunking.packBins(
          cleaned.join(dupIds, Seq("doc_id"), "left_anti"),
          "doc_id", "text", "lang", binTokens = 512)
        .groupBy(col("lang"), col("bin_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("bin_tokens"))
    }),

    // EXACT-substring decontamination: every maximal ≥8-token span of
    // a training doc (doc_id % 10 != 4) that appears verbatim anywhere
    // in the protected benchmark slice (doc_id % 10 = 4) is cut,
    // regardless of alignment — the q112/q46 family upgraded to Lee et
    // al. exact semantics. Gram-anchored candidate join, true-LCP
    // extension, merged ranges, scan-local rebuild.
    "q275_sa_decontaminate" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.SuffixDedup.decontaminateExact(
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 4),
        docs.filter(pmod(col("doc_id"), lit(10)) === 4),
        "doc_id", "text", minLen = 8)
    }),

    // contamination ATTRIBUTION: q275's audit companion — per
    // (train doc, bench doc) pair, merged shared-span count, total
    // contaminated tokens and the longest contiguous contaminated run
    "q276_contamination_report" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.SuffixDedup.contaminationReport(
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 4),
        docs.filter(pmod(col("doc_id"), lit(10)) === 4),
        "doc_id", "text", minLen = 8)
    }),

    // hybrid retrieval, ENGINE-EXACT: integer BM25 ∪ int8 integer-MIPS
    // dense ranking, fused through the integer RRF kernel — every rank
    // and fused score is an integer, so the hybrid result hash-checks
    // (was rows-only while the dense side used float cosine). The
    // SF-INVARIANT panel (id % 100 = 0, ≤ 2000) bounds the collected
    // query texts at ≤ 21 rows at every SF; the oracle derives the
    // SAME panel and tokens in SQL
    "q104_hybrid_topk" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val panel = pmod(col("doc_id"), lit(100)) === 0 &&
        col("doc_id") <= 2000
      val queries = docs.filter(panel)
        .select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      graft.operators.Fusion.hybridTopKExactFp(
        docs, "doc_id", "text", emb, "vec_id", "embedding",
        queries, pmod(col("vec_id"), lit(100)) === 0 &&
          col("vec_id") <= 2000, topK = 10)
    }),

    // RM3 pseudo-relevance feedback, ENGINE-EXACT: both BM25 passes
    // on the q71 integer kernel, the relevance model as 10^6
    // fixed-point floors, and the λ-interpolated weights with cleared
    // denominators (w = R·[t∈q] + |q|·rm_fp at λ=1/2) — per-query
    // positive scaling, so the ranking is the float path's and every
    // score hash-checks (was rows-only while scores used libm ln)
    "q217_rm3" -> ((s, dir) =>
      TextIndex.rm3TopKExactFp(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        queries = Bm25Queries, k = 10, fbDocs = 5, fbTerms = 8)),

    // exact retrieval eval: Recall@10 + fixed-point reciprocal rank
    // of the q69 integer-MIPS ranking against same-label ground truth
    // — the closing eval primitive for the ANN/BM25/fusion family
    "q156_retrieval_eval" -> ((s, dir) => {
      val t = Tables.load(s, dir, "embeddings")
      val results = Quantize.topKQuantized(t, "vec_id", "embedding",
          pmod(col("vec_id"), lit(50)) === 0, k = 10,
          Quantize.scaleOf(t, "embedding"))
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank"))
      val q = t.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("query_id"), col("label").as("__ql"))
      val truth = t.select(col("vec_id").as("doc_id"), col("label"))
        .join(q, col("label") === col("__ql") &&
          col("doc_id") =!= col("query_id"))
        .select(col("query_id"), col("doc_id"))
      graft.operators.Fusion.retrievalMetrics(results, truth,
        "query_id", "doc_id", "rank", k = 10)
    }),

    // point-in-time training-set assembly: every order enriched with the
    // customer's segment and order-count-to-date — N feature tables,
    // ONE shuffle
    "q73_training_matrix" -> ((s, dir) => {
      val spine = Tables.load(s, dir, "orders").select(
        col("o_custkey").as("key_cust"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"))
      // versioned per-customer activity: one version per active date,
      // valid [date, next-active-date), value = orders to date (incl.)
      val w = Window.partitionBy("key_cust").orderBy("valid_from")
      val activity = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey").as("key_cust"),
          to_date(col("o_orderdate")).as("valid_from"))
        .agg(count(lit(1)).as("__n"))
        .withColumn("n_orders_to_date", sum(col("__n")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("valid_until", lead(col("valid_from"), 1).over(w))
        .select("key_cust", "n_orders_to_date", "valid_from",
          "valid_until")
      TrainingSet.assemble(spine, Seq("key_cust"), "d",
        Seq("segment" -> Queries.segmentFeature(s, dir),
          "activity" -> activity))
        .select(col("o_orderkey"), col("key_cust"),
          col("d").cast("string").as("d"),
          col("mktsegment"), col("n_orders_to_date"))
    }),

    // blocked fuzzy record linkage over canonical part names
    "q74_fuzzy_parts" -> ((s, dir) => {
      val canon = Tables.load(s, dir, "part")
        .groupBy("p_name").agg(min(col("p_partkey")).as("id"))
      Linkage.fuzzyPairs(canon, "id", "p_name",
        block = split(col("p_name"), " ").getItem(1), maxDist = 2)
    }),

    // mutual best-match linkage: even-id vs odd-id canonical part
    // names, reciprocal top-1 within edit distance 3 — argmin via
    // min(struct), no per-key window, mutuality by one equi-join
    "q154_mutual_link" -> ((s, dir) => {
      val canon = Tables.load(s, dir, "part")
        .groupBy("p_name").agg(min(col("p_partkey")).as("id"))
      Linkage.mutualBest(
        canon.filter(col("id") % 2 === 0),
        canon.filter(col("id") % 2 === 1),
        "id", "p_name",
        block = split(col("p_name"), " ").getItem(1), maxDist = 3)
    }),

    // exact keyword extraction (integer TF-IDF ordering)
    "q75_keywords" -> ((s, dir) =>
      TextIndex.characteristicTerms(Tables.load(s, dir, "documents"),
        "doc_id", "text", k = 3)),

    // per-group integer min-max feature scaling
    "q76_minmax_scale" -> ((s, dir) =>
      Profile.minMaxScale(
        Tables.load(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("cents")),
        "o_orderpriority", "cents", outMax = 1000L)
        .select("o_orderkey", "o_orderpriority", "cents", "scaled")),

    // entity resolution: large-star/small-star connected components over
    // the fuzzy-linkage pair graph (chains A↔B↔C collapse to one entity;
    // the closure oracle is the same WITH RECURSIVE trick as q63)
    "q79_entity_clusters" -> ((s, dir) => {
      val canon = Tables.load(s, dir, "part")
        .groupBy("p_name").agg(min(col("p_partkey")).as("id"))
      val pairs = Linkage.fuzzyPairs(canon, "id", "p_name",
        block = split(col("p_name"), " ").getItem(1), maxDist = 2)
      ConnectedComponents.run(pairs, "id_a", "id_b")
    }),

    // Z-order (Morton) codes over a 2-d key box — the clustering key
    // behind multi-dimensional data skipping; LayoutSpec measures the
    // actual partition-pruning rate of the layout these codes induce
    "q81_zorder" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem").select(
        col("l_orderkey"),
        pmod(col("l_partkey"), lit(1024)).cast("long").as("x"),
        pmod(col("l_suppkey"), lit(1024)).cast("long").as("y"))
        .withColumn("zval",
          Layout.zValue(Seq(col("x"), col("y")), bits = 10))),

    // exact-k seeded per-language document sample (deterministic
    // reservoir stand-in; nested prefixes are themselves samples)
    "q84_group_sample" -> ((s, dir) =>
      Splits.samplePerGroup(Tables.load(s, dir, "documents"),
        "lang", "doc_id", k = 20, seed = "r4")
        .select("doc_id", "lang", "sample_rank")),

    // export shard-balance manifest: 16 deterministic md5 shards over
    // the document corpus, per-shard row and byte totals
    "q85_shard_stats" -> ((s, dir) =>
      Splits.shardStats(Tables.load(s, dir, "documents"),
        "doc_id", "text", nShards = 16, seed = "r4")),

    // per-group winsorization at [p1, p99] discrete percentiles (cents),
    // folded to a per-group fingerprint that covers every clamp
    "q86_winsorize" -> ((s, dir) =>
      Profile.winsorize(
        Tables.load(s, dir, "lineitem").select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents")),
        "l_returnflag", "cents", loBp = 100, hiBp = 9900)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          min(col("winsorized")).as("lo_cents"),
          max(col("winsorized")).as("hi_cents"),
          sum(when(col("winsorized") =!= col("cents"), 1L).otherwise(0L))
            .as("n_clamped"),
          sum(col("winsorized")).as("sum_cents"))),

    // small-file compaction plan: synthetic manifest (one "file" per 50
    // doc ids per language), 32 KiB targets by exact cumsum binning
    "q88_compaction_plan" -> ((s, dir) => {
      val manifest = Tables.load(s, dir, "documents")
        .groupBy(col("lang"), expr("doc_id div 50").as("file_id"))
        .agg(sum(octet_length(col("text"))).cast("long").as("bytes"))
      Layout.compactionPlan(manifest, "lang", "file_id", "bytes",
        targetBytes = 32768L)
    }),

    // ANALYZE-style per-column stats (exact NDV, nulls, min/max)
    "q90_table_stats" -> ((s, dir) =>
      Profile.tableStats(Tables.load(s, dir, "lineitem"),
        Seq("l_orderkey", "l_returnflag", "l_shipdate", "l_linestatus"))),

    // per-group equi-depth histogram: 8 quantile buckets of price cents
    "q91_equidepth" -> ((s, dir) =>
      Profile.equiDepthHistogram(
        Tables.load(s, dir, "lineitem").select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents")),
        "l_returnflag", "cents", nBuckets = 8)),

    // join-skew diagnosis: 20 heaviest order keys by line count, with
    // exact basis-point shares
    "q92_heavy_keys" -> ((s, dir) =>
      Profile.heavyHitters(Tables.load(s, dir, "lineitem"),
        "l_orderkey", topN = 20)),

    // per-class acceptance sampling: language-dependent retention
    // rates in basis points, decided per row by the portable md5 draw
    "q96_accept_sample" -> ((s, dir) => {
      val w = when(col("lang") === "en", 10000)
        .when(col("lang") === "zh", 5000)
        .when(col("lang") === "de", 2500)
        .when(col("lang") === "fr", 1000).otherwise(500)
      Splits.acceptByWeight(Tables.load(s, dir, "documents"),
        "doc_id", w, seed = "q96")
        .select("doc_id", "lang")
    }),

    // exact per-row percentile rank (RANK() semantics) via Selection
    // bucket prefixes — no group-window over fact rows; folded to a
    // per-group fingerprint whose sum_cross covers every row's rank
    "q117_pct_rank" -> ((s, dir) =>
      graft.operators.Selection.rankRows(
        Tables.load(s, dir, "lineitem").select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents")),
        "l_returnflag", "cents")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("rank")).as("sum_rank"),
          max(col("rank")).as("max_rank"),
          sum(col("rank") * (col("cents") % 997)).as("sum_cross"))),

    // integer fixed-point PageRank over the supplier<->customer trade
    // graph (distinct pairs, both directions so no node is sink-only):
    // 5 damped power-iteration rounds, every division integer — the
    // whole iteration hash-checks against a DuckDB recursive CTE
    "q130_pagerank" -> ((s, dir) => {
      val pairs = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").cast("long").as("supp"),
          col("o_custkey").cast("long").as("cust"))
        .distinct()
      val edges = pairs.select(
          (col("supp") + 10000000L).as("src"),
          (col("cust") + 20000000L).as("dst"))
        .union(pairs.select((col("cust") + 20000000L).as("src"),
          (col("supp") + 10000000L).as("dst")))
      graft.operators.PageRank.iterate(edges, "src", "dst", iters = 5)
    }),

    // personalized (seeded-teleport) PageRank — TrustRank: teleport
    // mass lands only on suppliers of nations 0-4, so rank measures
    // trade proximity to that trusted slice; same exact-integer
    // arithmetic as q130, hash-checked against a recursive CTE
    "q134_trustrank" -> ((s, dir) => {
      val pairs = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").cast("long").as("supp"),
          col("o_custkey").cast("long").as("cust"))
        .distinct()
      val edges = pairs.select(
          (col("supp") + 10000000L).as("src"),
          (col("cust") + 20000000L).as("dst"))
        .union(pairs.select((col("cust") + 20000000L).as("src"),
          (col("supp") + 10000000L).as("dst")))
      val seeds = Tables.load(s, dir, "supplier")
        .filter(col("s_nationkey") < 5)
        .select((col("s_suppkey").cast("long") + 10000000L).as("id"))
      graft.operators.PageRank.personalized(edges, "src", "dst",
        seeds, "id", iters = 5)
    }),

    // strongly connected components of the DIRECTED trade graph:
    // supp→cust for every trade pair, cust→supp only for pairs with a
    // high-value order — SCCs are the reciprocated trade meshes; scc
    // label = min member id, hash-checked against the DuckDB
    // transitive closure (graph pre-shrunk to nations 0-4 so the
    // oracle's closure stays small)
    "q200_scc" -> ((s, dir) => {
      val sup = Tables.load(s, dir, "supplier")
        .filter(col("s_nationkey") < 5)
        .select(col("s_suppkey").cast("long").as("sk"))
      val cus = Tables.load(s, dir, "customer")
        .filter(col("c_nationkey") < 5)
        .select(col("c_custkey").cast("long").as("ck"))
      val pairs = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").cast("long").as("sk"),
          col("o_custkey").cast("long").as("ck"), col("o_totalprice"))
        .join(sup, Seq("sk"), "left_semi")
        .join(cus, Seq("ck"), "left_semi")
      val fwd = pairs.select((col("sk") + 10000000L).as("src"),
        (col("ck") + 20000000L).as("dst")).distinct()
      val back = pairs.filter(col("o_totalprice") > 300000.0)
        .select((col("ck") + 20000000L).as("src"),
          (col("sk") + 10000000L).as("dst")).distinct()
      graft.operators.Graph.stronglyConnected(
        fwd.unionByName(back), "src", "dst", maxSteps = 200)
    }),

    // market-basket association: top-50 part pairs by exact lift
    // (basis points) among pairs sharing >= 3 orders — decimal(38,0)
    // product against overflow, deterministic (lift, pair) tie order
    "q142_assoc_rules" -> ((s, dir) =>
      graft.operators.Association.pairLift(
        Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey").as("basket"),
            col("l_partkey").cast("long").as("item")),
        "basket", "item", minSupport = 3, k = 50)),

    // item-item Jaccard similarity ("bought A also bought B"): top-50
    // part pairs by exact basket-set Jaccard in basis points — pure
    // long arithmetic, deterministic tie order
    "q151_item_jaccard" -> ((s, dir) =>
      graft.operators.Association.itemJaccard(
        Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey").as("basket"),
            col("l_partkey").cast("long").as("item")),
        "basket", "item", minSupport = 3, k = 50)),

    // exact phrase search over the positional index: docs containing
    // the consecutive token pair "table value" with overlapping-match
    // counts — one filtered posexplode + a (doc, pos) equi-join chain
    "q149_phrase_search" -> ((s, dir) =>
      graft.operators.TextIndex.phraseSearch(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        Seq("table", "value"))),

    // exact Gini concentration of per-customer revenue per market
    // segment: rankRows histogram ranks + min-rank tie correction,
    // finals divided driver-side in BigInt — hash-checks against a
    // row_number formulation
    "q141_gini" -> ((s, dir) => {
      val per = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
      Profile.giniConcentration(per, "c_mktsegment", "cents")
    }),

    // RFM customer segmentation: exact quintile buckets per axis via
    // Selection's rank machinery (no global sort, no key-row window);
    // all-integer bucket assignment hash-checks
    "q139_rfm" -> ((s, dir) =>
      Profile.rfm(
        Tables.load(s, dir, "orders")
          .withColumn("cents",
            round(col("o_totalprice") * 100).cast("long")),
        "o_custkey", "o_orderdate", "cents", refDate = "1998-12-01")
        .select(col("o_custkey").cast("long").as("cust"),
          col("recency"), col("frequency"), col("monetary"),
          col("r"), col("f"), col("m"), col("segment"))),

    // declarative data-quality expectations compiled to one scan (all
    // scalar rules in a single aggregate) + one count-distinct + one
    // anti-join — the ingest admission gate; exact counts hash-check.
    // in_range(l_linenumber,1,4) and the discount bound are DELIBERATE
    // violations (TPC-H linenumbers run 1..7) so the report is
    // non-trivial at every scale factor
    "q136_expectations" -> ((s, dir) => {
      val E = graft.operators.Expectations
      E.validate(Tables.load(s, dir, "lineitem"),
        checks = Seq(
          E.notNull("l_orderkey"),
          E.inRange("l_quantity", 1, 50),
          E.inRange("l_linenumber", 1, 4),
          E.matches("l_returnflag", "^[ARN]$"),
          E.inSet("l_linestatus", Seq("O", "F")),
          E.Check("disc_bound", col("l_discount") > 0.06)),
        uniques = Seq(E.Unique("pk_unique",
          Seq("l_orderkey", "l_linenumber"))),
        refs = Seq(E.ReferencedIn("fk_orders", "l_orderkey",
          Tables.load(s, dir, "orders"), "o_orderkey")))
    }),

    // per-node triangle count + clustering coefficient over the part
    // co-occurrence graph (parts sharing an order; 2k nodes, 116k
    // edges, 414k triangles at sf0.01) — degree-ordered wedge join,
    // all integer, hash-checks against plain DuckDB joins
    "q131_triangles" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"),
          col("l_partkey").cast("long").as("pk"))
      val pairs = li.withColumnRenamed("pk", "u")
        .join(li.withColumnRenamed("pk", "v"), Seq("ok"))
        .filter(col("u") < col("v"))
        .select(col("u"), col("v")).distinct()
      graft.operators.Graph.triangleStats(pairs, "u", "v")
    }),

    // integer fixed-point HITS over the directed supplier->customer
    // trade graph: 4 rounds, every half-step renormalized to 1e6 by
    // floored division — hash-checks against a recursive CTE
    "q132_hits" -> ((s, dir) => {
      val edges = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey").cast("long") + 10000000L).as("src"),
          (col("o_custkey").cast("long") + 20000000L).as("dst"))
      graft.operators.Graph.hits(edges, "src", "dst", iters = 4)
    }),

    // synchronous label-propagation communities over the REPEATED
    // part co-occurrence graph (pairs sharing >= 2 distinct orders —
    // the single-order graph is too dense to have communities): 5
    // deterministic rounds, min-label tie-break, 356 communities at
    // sf0.01 — hash-checks against a recursive CTE
    "q137_communities" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"),
          col("l_partkey").cast("long").as("pk"))
      val pairs = li.withColumnRenamed("pk", "u")
        .join(li.withColumnRenamed("pk", "v"), Seq("ok"))
        .filter(col("u") < col("v"))
        .groupBy(col("u"), col("v"))
        .agg(count_distinct(col("ok")).as("__c"))
        .filter(col("__c") >= 2)
        .select(col("u"), col("v"))
      graft.operators.Graph.labelPropagation(pairs, "u", "v", rounds = 5)
    }),

    // 80-core of the part co-occurrence graph: 5 cascade rounds to
    // the fixpoint at sf0.01 (1857 of 2000 parts survive); the Spark
    // loop early-exits at the fixpoint, the oracle's fixed 8 rounds
    // are no-ops past it — identical output either way
    "q133_kcore" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"),
          col("l_partkey").cast("long").as("pk"))
      val pairs = li.withColumnRenamed("pk", "u")
        .join(li.withColumnRenamed("pk", "v"), Seq("ok"))
        .filter(col("u") < col("v"))
        .select(col("u"), col("v")).distinct()
      graft.operators.Graph.kCore(pairs, "u", "v", k = 80, maxRounds = 8)
    }),

    // hop-bounded weighted shortest paths (frontier Bellman-Ford):
    // edge cost 1e6 div shared-order-count (stronger trade link =
    // cheaper), 3 rounds from the nation-0 supplier slice — exact
    // integer minima, hash-checked against a layered relax oracle
    "q150_shortest_paths" -> ((s, dir) => {
      val pc = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_suppkey").cast("long").as("supp"),
          col("o_custkey").cast("long").as("cust"))
        .agg(count_distinct(col("l_orderkey")).as("cnt"))
      val edges = pc.select((col("supp") + 10000000L).as("src"),
          (col("cust") + 20000000L).as("dst"),
          expr("1000000L div cnt").as("w"))
        .union(pc.select((col("cust") + 20000000L).as("src"),
          (col("supp") + 10000000L).as("dst"),
          expr("1000000L div cnt").as("w")))
      val seeds = Tables.load(s, dir, "supplier")
        .filter(col("s_nationkey") === 0)
        .select((col("s_suppkey").cast("long") + 10000000L).as("id"))
      graft.operators.Graph.shortestPaths(edges, "src", "dst", "w",
        seeds, "id", rounds = 3)
    }),

    // hierarchical rollup report: revenue cents + order counts at the
    // region -> nation -> (all) subtotal pyramid in ONE native rollup
    // pass — hash-checks against GROUP BY ROLLUP
    "q152_rollup_report" -> ((s, dir) =>
      Profile.rollupReport(
        Tables.load(s, dir, "orders")
          .join(Tables.load(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(Tables.load(s, dir, "nation"),
            col("c_nationkey") === col("n_nationkey"))
          .join(Tables.load(s, dir, "region"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("r_name"), col("n_name"),
            round(col("o_totalprice") * 100).cast("long").as("cents")),
        Seq("r_name", "n_name"), "cents")),

    // snapshot diff (CDC audit): two integer-safe projections of
    // orders — 1%-ish slices added/removed by modulus, a perturbed
    // cents slice as 'changed' — classified per key by canonical md5
    // fingerprints over one full-outer join; verdicts AND fingerprints
    // hash-check against the same construction in DuckDB
    "q153_snapshot_diff" -> ((s, dir) => {
      val base = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderdate").cast("string").as("odate"),
          col("o_orderpriority"))
      val old = base.filter(col("o_orderkey") % 100 =!= 0)
        .withColumn("cents", col("cents") +
          when(col("o_orderkey") % 97 === 0, 1L).otherwise(0L))
      val neu = base.filter(col("o_orderkey") % 101 =!= 0)
      Profile.snapshotDiff(old, neu, Seq("o_orderkey"))
        .select(col("o_orderkey"), col("verdict"),
          col("fp_old"), col("fp_new"))
    }),

    // multi-source BFS hop distance over the bipartite trade graph:
    // exact hop radius from the nation-0 supplier seed slice, 3 hops
    // (suppliers at even hops, customers at odd) — frontier expansion,
    // hash-checks against a recursive UNION-dedupe CTE
    "q145_bfs_hops" -> ((s, dir) => {
      val pairs = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").cast("long").as("supp"),
          col("o_custkey").cast("long").as("cust"))
        .distinct()
      val edges = pairs.select(
          (col("supp") + 10000000L).as("src"),
          (col("cust") + 20000000L).as("dst"))
        .union(pairs.select((col("cust") + 20000000L).as("src"),
          (col("supp") + 10000000L).as("dst")))
      val seeds = Tables.load(s, dir, "supplier")
        .filter(col("s_nationkey") === 0)
        .select((col("s_suppkey").cast("long") + 10000000L).as("id"))
      graft.operators.Graph.bfsDistance(edges, "src", "dst",
        seeds, "id", maxHops = 3)
    }),

    // dataset card: per-source docs/tokens/chars/empties/dups/lang-mix
    // in long format — the exact-integer summary a curation pipeline
    // publishes next to the data
    "q122_dataset_card" -> ((s, dir) =>
      Profile.datasetCard(Tables.load(s, dir, "documents"),
        "source", "doc_id", "lang", "text")),

    // contrastive negative sampling: per query, the k pool docs with
    // the smallest portable (query, cand, seed) hash — broadcast pool,
    // per-query windows bounded by |pool|
    "q116_negative_sample" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.TrainingSet.negativeSample(
        docs.filter(pmod(col("doc_id"), lit(50)) === 0),
        docs.filter(pmod(col("doc_id"), lit(7)) === 0),
        "doc_id", "doc_id", k = 8, seed = "neg1")
    }),

    // robust per-group outliers: exact median + MAD through Selection
    // bucket histograms (no group-window sort), folded to a per-group
    // fingerprint that covers every row's score
    "q113_mad_outliers" -> ((s, dir) =>
      Profile.robustOutliers(
        Tables.load(s, dir, "lineitem").select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents")),
        "l_returnflag", "cents", threshBp = 20000)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          max(col("median")).as("median_cents"),
          max(col("mad")).as("mad_cents"),
          sum(col("is_outlier").cast("long")).as("n_outliers"),
          max(col("score_bp")).as("max_score_bp")))
  )

  /** q71 oracle: the exact-integer BM25 replayed end-to-end in DuckDB.
    * The query panel embeds as literal (query_id, token) VALUES rows —
    * tokenized by the SAME Scala split as the operator — and idf_fp
    * comes from [[graft.functions.PortableLn.duckLnCtes]], the
    * recursive-CTE twin of the integer ln the operator ran driver-side,
    * so every score is the identical BIGINT. sum() is CAST back to
    * BIGINT (HUGEINT rule) and rank to INT (row_number rule). */
  private val Bm25OracleSql: String = {
    val qvals = Bm25Queries.flatMap { case (qid, text) =>
      text.trim.split("\\s+").distinct.map { t =>
        require(!t.contains("'"), s"query token $t needs quoting")
        s"(CAST($qid AS BIGINT), '$t')"
      }
    }.mkString(", ")
    val lnCtes = graft.functions.PortableLn.duckLnCtes(
      "__ln_in", Seq("df"), "idf")
    s"""WITH RECURSIVE t AS (
       |  SELECT doc_id,
       |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |  FROM documents),
       |tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
       |       FROM t GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
       |       FROM t GROUP BY 1),
       |nst AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |               CAST(sum(dl) AS BIGINT) AS tt FROM dl),
       |q(query_id, term) AS (VALUES $qvals),
       |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
       |        WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |__ln_in AS (SELECT DISTINCT df,
       |    2 * ((SELECT n FROM nst) + 1) AS a, 2 * df + 1 AS b
       |  FROM dfq),
       |$lnCtes,
       |sc AS (
       |  SELECT q.query_id, tf.doc_id,
       |    CAST(sum((idf.ln_fp * 22 * tf.tf * nst.tt) //
       |      (10 * tf.tf * nst.tt + 3 * nst.tt + 9 * dl.dl * nst.n))
       |      AS BIGINT) AS score_fp
       |  FROM q JOIN tf USING (term) JOIN dfq USING (term)
       |    JOIN idf USING (df) JOIN dl USING (doc_id), nst
       |  GROUP BY 1, 2),
       |r AS (SELECT query_id, doc_id, score_fp, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score_fp DESC, doc_id) AS rank
       |  FROM sc)
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_fp
       |FROM r WHERE rank <= 10""".stripMargin
  }

  /** q217 oracle: the exact-integer RM3 replayed end-to-end. Pass 1 =
    * the q71 scoring over the literal query panel; the relevance model
    * sums `tf·10^6 // dl` over each query's top-5 docs; the top-8
    * expansion terms and the cleared-denominator weights
    * `w = lamNum·R·[t∈q] + (lamDen−lamNum)·|q|·rm_fp` (R = 0 fallback
    * to w = 1) feed pass 2 through the SAME single ln CTE — idf_fp is
    * materialized for EVERY distinct df value, which decouples the
    * derived expansion terms from the recursive CTE's one-instance
    * limit. λ = 1/2, fbDocs = 5, fbTerms = 8, k = 10. */
  private val Rm3OracleSql: String = {
    val qvals = Bm25Queries.flatMap { case (qid, text) =>
      text.trim.split("\\s+").distinct.map { t =>
        require(!t.contains("'"), s"query token $t needs quoting")
        s"(CAST($qid AS BIGINT), '$t')"
      }
    }.mkString(", ")
    val lnCtes = graft.functions.PortableLn.duckLnCtes(
      "__ln_in", Seq("df"), "idf")
    val (lamNum, lamDen) = (1L, 2L)
    s"""WITH RECURSIVE t AS (
       |  SELECT doc_id,
       |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |  FROM documents),
       |tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
       |       FROM t GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
       |       FROM t GROUP BY 1),
       |nst AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |               CAST(sum(dl) AS BIGINT) AS tt FROM dl),
       |dfall AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
       |          GROUP BY 1),
       |__ln_in AS (SELECT DISTINCT df,
       |    2 * ((SELECT n FROM nst) + 1) AS a, 2 * df + 1 AS b
       |  FROM dfall),
       |$lnCtes,
       |q(query_id, term) AS (VALUES $qvals),
       |sc1 AS (
       |  SELECT q.query_id, tf.doc_id,
       |    CAST(sum((idf.ln_fp * 22 * tf.tf * nst.tt) //
       |      (10 * tf.tf * nst.tt + 3 * nst.tt + 9 * dl.dl * nst.n))
       |      AS BIGINT) AS score_fp
       |  FROM q JOIN tf USING (term) JOIN dfall USING (term)
       |    JOIN idf USING (df) JOIN dl USING (doc_id), nst
       |  GROUP BY 1, 2),
       |fb AS (SELECT query_id, doc_id FROM (
       |    SELECT query_id, doc_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY score_fp DESC, doc_id) AS rn
       |    FROM sc1)
       |  WHERE rn <= 5),
       |rm AS (
       |  SELECT fb.query_id, tf.term,
       |    CAST(sum((tf.tf * 1000000) // dl.dl) AS BIGINT) AS rm_fp
       |  FROM fb JOIN tf USING (doc_id) JOIN dl USING (doc_id)
       |  GROUP BY 1, 2),
       |ex AS (SELECT query_id, term, rm_fp FROM (
       |    SELECT query_id, term, rm_fp, row_number() OVER (
       |      PARTITION BY query_id ORDER BY rm_fp DESC, term) AS rn
       |    FROM rm)
       |  WHERE rn <= 8),
       |rr AS (SELECT query_id, CAST(sum(rm_fp) AS BIGINT) AS r
       |       FROM ex GROUP BY 1),
       |ql AS (SELECT query_id, CAST(count(*) AS BIGINT) AS nq
       |       FROM q GROUP BY 1),
       |wts AS (
       |  SELECT query_id, term, CAST(sum(w) AS BIGINT) AS w FROM (
       |    SELECT q.query_id, q.term,
       |      CASE WHEN coalesce(rr.r, 0) > 0 THEN $lamNum * rr.r
       |           ELSE 1 END AS w
       |    FROM q LEFT JOIN rr USING (query_id)
       |    UNION ALL
       |    SELECT e.query_id, e.term,
       |      ${lamDen - lamNum} * ql.nq * e.rm_fp AS w
       |    FROM ex e JOIN ql USING (query_id))
       |  GROUP BY 1, 2),
       |sc2 AS (
       |  SELECT w.query_id, tf.doc_id,
       |    CAST(sum(w.w * ((idf.ln_fp * 22 * tf.tf * nst.tt) //
       |      (10 * tf.tf * nst.tt + 3 * nst.tt + 9 * dl.dl * nst.n)))
       |      AS BIGINT) AS score_fp
       |  FROM wts w JOIN tf USING (term) JOIN dfall USING (term)
       |    JOIN idf USING (df) JOIN dl USING (doc_id), nst
       |  GROUP BY 1, 2),
       |r2 AS (SELECT query_id, doc_id, score_fp, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score_fp DESC, doc_id) AS rank
       |  FROM sc2)
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_fp
       |FROM r2 WHERE rank <= 10""".stripMargin
  }

  /** q104 oracle: the exact hybrid replayed — q71's integer BM25 over
    * the SQL-derived SF-invariant panel (top 40), q69's int8
    * integer-MIPS over the matching vec panel (top 40), RRF-fused with
    * the integer kernel (Scale 10^9, kRrf 60), fused top 10. */
  private val HybridOracleSql: String = {
    val lnCtes = graft.functions.PortableLn.duckLnCtes(
      "__ln_in", Seq("df"), "idf")
    s"""WITH RECURSIVE t AS (
       |  SELECT doc_id,
       |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |  FROM documents),
       |tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
       |       FROM t GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
       |       FROM t GROUP BY 1),
       |nst AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |               CAST(sum(dl) AS BIGINT) AS tt FROM dl),
       |q AS (SELECT DISTINCT doc_id AS query_id, term FROM t
       |      WHERE doc_id % 100 = 0 AND doc_id <= 2000),
       |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
       |        WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |__ln_in AS (SELECT DISTINCT df,
       |    2 * ((SELECT n FROM nst) + 1) AS a, 2 * df + 1 AS b
       |  FROM dfq),
       |$lnCtes,
       |sc1 AS (
       |  SELECT q.query_id, tf.doc_id,
       |    CAST(sum((idf.ln_fp * 22 * tf.tf * nst.tt) //
       |      (10 * tf.tf * nst.tt + 3 * nst.tt + 9 * dl.dl * nst.n))
       |      AS BIGINT) AS score_fp
       |  FROM q JOIN tf USING (term) JOIN dfq USING (term)
       |    JOIN idf USING (df) JOIN dl USING (doc_id), nst
       |  GROUP BY 1, 2),
       |lexr AS (SELECT query_id, doc_id, rn FROM (
       |    SELECT query_id, doc_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY score_fp DESC, doc_id) AS rn
       |    FROM sc1)
       |  WHERE rn <= 40),
       |scq AS (SELECT max(av) AS s FROM (
       |    SELECT unnest(list_transform(embedding,
       |      x -> abs(CAST(x AS DOUBLE)))) AS av
       |    FROM embeddings)),
       |qv AS (SELECT vec_id, list_transform(embedding,
       |    x -> greatest(-127, least(127,
       |      CAST(round(CAST(x AS DOUBLE) * 127.0 / scq.s) AS BIGINT))))
       |    AS qv
       |  FROM embeddings, scq),
       |dp AS (SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
       |    CAST(list_sum(list_transform(list_zip(a.qv, b.qv),
       |      x -> x[1] * x[2])) AS BIGINT) AS qdot
       |  FROM qv a JOIN qv b
       |    ON a.vec_id % 100 = 0 AND a.vec_id <= 2000
       |      AND b.vec_id <> a.vec_id),
       |denr AS (SELECT query_id, doc_id, rn FROM (
       |    SELECT query_id, doc_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY qdot DESC, doc_id) AS rn
       |    FROM dp)
       |  WHERE rn <= 40),
       |contrib AS (
       |  SELECT query_id, doc_id, 1000000000 // (60 + rn) AS c FROM lexr
       |  UNION ALL
       |  SELECT query_id, doc_id, 1000000000 // (60 + rn) AS c FROM denr),
       |fused AS (SELECT query_id, doc_id,
       |    CAST(sum(c) AS BIGINT) AS rrf_fp,
       |    CAST(count(*) AS BIGINT) AS n_sources
       |  FROM contrib GROUP BY 1, 2),
       |fr AS (SELECT query_id, doc_id, rrf_fp, n_sources,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY rrf_fp DESC, doc_id) AS rn
       |  FROM fused)
       |SELECT query_id, CAST(rn AS INT) AS rank, doc_id, rrf_fp,
       |  n_sources
       |FROM fr WHERE rn <= 10""".stripMargin
  }

  /** Brute-force suffix sort over whatever CTE `d`(doc_id, a) holds,
    * ending in `l`(doc_a, pos_a, doc_b, pos_b, lcp) — adjacent-pair
    * LCPs capped at 512. Prepend a `d` definition (q268-q272 use the
    * half-corpus slice; q273 the probe scope). */
  private val SaSortCtes: String =
    """s AS (
      |  SELECT doc_id, i AS pos, a[i:] AS suf, len(a) - i + 1 AS sl
      |  FROM d,
      |    LATERAL (SELECT unnest(generate_series(1, len(a))) AS i) t),
      |o AS (
      |  SELECT doc_id, pos, suf, sl,
      |    row_number() OVER (ORDER BY suf, doc_id, pos) AS rn
      |  FROM s),
      |p AS (
      |  SELECT x.doc_id AS doc_a, x.pos AS pos_a, x.suf AS sa,
      |    x.sl AS la, y.doc_id AS doc_b, y.pos AS pos_b, y.suf AS sb,
      |    y.sl AS lb
      |  FROM o x JOIN o y ON y.rn = x.rn + 1),
      |m AS (
      |  SELECT doc_a, pos_a, doc_b, pos_b, la, lb,
      |    list_position(list_transform(list_zip(sa, sb),
      |      x -> x[1] IS NOT DISTINCT FROM x[2]), false) AS mism
      |  FROM p),
      |l AS (
      |  -- list_position yields 0/NULL (version-dependent) when no
      |  -- mismatch exists, i.e. the suffixes are identical
      |  SELECT doc_a, pos_a, doc_b, pos_b,
      |    least(512, CASE WHEN mism IS NULL OR mism = 0
      |      THEN least(la, lb) ELSE mism - 1 END) AS lcp
      |  FROM m)""".stripMargin

  /** Shared CTE chain of the q268-q272 oracles: [[SaSortCtes]] over
    * the half-corpus slice. */
  private val SuffixSpansCtes: String =
    """WITH d AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
      |  FROM documents WHERE doc_id % 2 = 0),
      |""".stripMargin + SaSortCtes

  /** q273's probe-scope `d`: the batch slice (doc_id % 4 = 2) plus
    * exactly the corpus docs (doc_id % 4 = 0) sharing an 8-gram with
    * it — the same affected-doc derivation the operator runs. */
  private val SaProbeCtes: String =
    """WITH db AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
      |  FROM documents WHERE doc_id % 4 = 2),
      |dc AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
      |  FROM documents WHERE doc_id % 4 = 0),
      |bg AS (
      |  SELECT DISTINCT array_to_string(a[i:i+7], ' ') AS gram
      |  FROM db, LATERAL (SELECT unnest(generate_series(1,
      |    len(a) - 7)) AS i) t),
      |aff AS (
      |  SELECT DISTINCT doc_id
      |  FROM dc, LATERAL (SELECT unnest(generate_series(1,
      |    len(a) - 7)) AS i) t
      |  WHERE array_to_string(a[i:i+7], ' ') IN (SELECT gram FROM bg)),
      |d AS (
      |  SELECT doc_id, a FROM db
      |  UNION ALL
      |  SELECT dc.doc_id, dc.a FROM dc JOIN aff USING (doc_id)),
      |""".stripMargin + SaSortCtes

  /** q274's oracle: the SA excision chain (shared CTEs) feeding the
    * q98-style portable-LSH + bin-packing stages — kept token lists
    * shingle to 3-grams, md5+affine-perm minhash signatures band into
    * LSH buckets, later-id members of confirmed pairs drop, survivors
    * pack into 512-token bins per language (cumulative sum by doc id,
    * the packBins contract). Same literal perms as the Spark side. */
  private lazy val SaLshPackSql: String = {
    val permValues = graft.operators.Dedup.portablePerms(8).zipWithIndex
      .map { case ((a, b), p) => s"($p, $a, $b)" }.mkString(", ")
    raw"""cl2 AS (
         |  SELECT k2.doc, d0.lang, k2.kl AS kept
         |  FROM (SELECT doc, list(tok ORDER BY pos) AS kl,
         |          count(*) AS nk
         |        FROM kept GROUP BY doc) k2
         |  JOIN documents d0 ON k2.doc = d0.doc_id
         |  WHERE k2.nk >= 10),
         |sh2 AS (
         |  SELECT DISTINCT doc, array_to_string(kept[i:i+2], ' ') AS s
         |  FROM cl2, LATERAL (SELECT unnest(generate_series(
         |    1, greatest(1, len(kept) - 2))) AS i) gi),
         |gh2 AS (
         |  SELECT doc,
         |    CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) AS g
         |  FROM sh2),
         |ph2 AS (
         |  SELECT doc, p, min((a * g + b) % 2147483647) AS h
         |  FROM gh2, (VALUES $permValues) AS perms(p, a, b)
         |  GROUP BY doc, p),
         |sig2 AS (
         |  SELECT doc, p // 2 AS band,
         |    string_agg(CAST(h AS VARCHAR), ',' ORDER BY p) AS bkey
         |  FROM ph2 GROUP BY doc, p // 2),
         |cnd2 AS (
         |  SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
         |  FROM sig2 a JOIN sig2 b ON a.band = b.band
         |    AND a.bkey = b.bkey AND a.doc < b.doc),
         |m2 AS (
         |  SELECT c2.id_a, c2.id_b,
         |    sum(CASE WHEN pa.h = pb.h THEN 1 ELSE 0 END) AS n_match
         |  FROM cnd2 c2
         |  JOIN ph2 pa ON pa.doc = c2.id_a
         |  JOIN ph2 pb ON pb.doc = c2.id_b AND pb.p = pa.p
         |  GROUP BY c2.id_a, c2.id_b),
         |dup2 AS (SELECT DISTINCT id_b AS doc FROM m2
         |  WHERE n_match >= 6),
         |surv2 AS (
         |  SELECT doc, lang, len(kept) AS n_tokens FROM cl2
         |  WHERE doc NOT IN (SELECT doc FROM dup2)),
         |cum2 AS (
         |  SELECT doc, lang, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM surv2)
         |SELECT lang, CAST((cum - 1) // 512 AS BIGINT) AS bin_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
         |FROM cum2 GROUP BY lang, bin_id""".stripMargin
  }

  /** Shared prefix of the q275/q276 oracles: gram-anchored
    * (train position, bench position) candidate pairs with their true
    * capped LCP — ends in `lcx`(doc, bdoc, dpos, lcp). */
  private val DeconCtes: String =
    """WITH d AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
      |  FROM documents),
      |trn AS (SELECT doc_id, a FROM d WHERE doc_id % 10 <> 4),
      |bch AS (SELECT doc_id, a FROM d WHERE doc_id % 10 = 4),
      |tg AS (
      |  SELECT doc_id, i, array_to_string(a[i:i+7], ' ') AS gram
      |  FROM trn, LATERAL (SELECT unnest(generate_series(1,
      |    len(a) - 7)) AS i) t),
      |bgp AS (
      |  SELECT doc_id, i, array_to_string(a[i:i+7], ' ') AS gram
      |  FROM bch, LATERAL (SELECT unnest(generate_series(1,
      |    len(a) - 7)) AS i) t),
      |pr AS (
      |  SELECT tg.doc_id AS doc, tg.i AS dpos,
      |    bgp.doc_id AS bdoc, bgp.i AS bpos
      |  FROM tg JOIN bgp USING (gram)),
      |px AS (
      |  SELECT pr.doc, pr.bdoc, pr.dpos,
      |    ta.a[pr.dpos:pr.dpos+511] AS sa,
      |    tb.a[pr.bpos:pr.bpos+511] AS sb
      |  FROM pr JOIN trn ta ON ta.doc_id = pr.doc
      |          JOIN bch tb ON tb.doc_id = pr.bdoc),
      |lcx AS (
      |  SELECT doc, bdoc, dpos,
      |    least(512, CASE WHEN mism IS NULL OR mism = 0
      |      THEN least(la, lb) ELSE mism - 1 END) AS lcp
      |  FROM (SELECT doc, bdoc, dpos,
      |      list_position(list_transform(list_zip(sa, sb),
      |        x -> x[1] IS NOT DISTINCT FROM x[2]), false) AS mism,
      |      len(sa) AS la, len(sb) AS lb
      |    FROM px))""".stripMargin

  /** Shared by the q269/q271/q272 oracles: q268's adjacent-pair spans
    * (`l`) folded into merge-grouped cut candidates — the larger
    * (doc, pos) occurrence is cut, half-open intervals group when they
    * overlap or touch (gaps-and-islands). Ends in `g3`(doc, f, u, grp). */
  private val SaCutCtes: String =
    """cand AS (
      |  SELECT CASE WHEN (doc_a, pos_a) > (doc_b, pos_b)
      |      THEN doc_a ELSE doc_b END AS doc,
      |    CAST(CASE WHEN (doc_a, pos_a) > (doc_b, pos_b)
      |      THEN pos_a ELSE pos_b END AS BIGINT) AS f,
      |    CAST(CASE WHEN (doc_a, pos_a) > (doc_b, pos_b)
      |      THEN pos_a ELSE pos_b END + lcp AS BIGINT) AS u
      |  FROM l WHERE lcp >= 8),
      |g1 AS (
      |  SELECT doc, f, u, max(u) OVER (PARTITION BY doc
      |    ORDER BY f, u ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND 1 PRECEDING) AS mu
      |  FROM cand),
      |g2 AS (SELECT *, CASE WHEN mu IS NULL OR f > mu THEN 1 ELSE 0
      |    END AS nw
      |  FROM g1),
      |g3 AS (SELECT *, sum(nw) OVER (PARTITION BY doc
      |    ORDER BY f, u ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM g2)""".stripMargin

  /** Shared by the q271/q272 oracles: g3's groups merged to ranges,
    * expanded to covered positions, anti-joined against the token
    * stream, kept tokens re-joined in position order. Ends in
    * `ka`(doc, n_kept, ct). */
  private val SaCleanCtes: String =
    """rng AS (
      |  SELECT doc, min(f) AS cf, max(u) AS cu
      |  FROM g3 GROUP BY doc, grp),
      |cov AS (
      |  SELECT doc, unnest(generate_series(cf, cu - 1)) AS cp
      |  FROM rng),
      |toks AS (
      |  SELECT doc_id AS doc, t.i AS pos, a[t.i] AS tok
      |  FROM d, LATERAL (SELECT unnest(generate_series(1, len(a)))
      |    AS i) t),
      |kept AS (
      |  SELECT t.doc, t.pos, t.tok
      |  FROM toks t LEFT JOIN cov c ON c.doc = t.doc AND c.cp = t.pos
      |  WHERE c.doc IS NULL),
      |ka AS (
      |  SELECT doc, count(*) AS n_kept,
      |    string_agg(tok, ' ' ORDER BY pos) AS ct
      |  FROM kept GROUP BY doc)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q217_rm3" -> Rm3OracleSql,
    "q104_hybrid_topk" -> HybridOracleSql,

    // brute-force suffix sort: DuckDB list comparison is elementwise
    // with missing-element-sorts-first — exactly the operator's
    // rank-0-for-past-the-end convention; ties (identical suffixes)
    // break by (doc, pos) on both sides. LCP = first mismatch index
    // over the EXACT suffixes, capped at 512 like the operator's
    // capped zip_with compare.
    "q268_suffix_spans" -> (SuffixSpansCtes + "\n" +
      """SELECT doc_a, CAST(pos_a AS INT) AS pos_a, doc_b,
        |  CAST(pos_b AS INT) AS pos_b, lcp
        |FROM l WHERE lcp >= 8""".stripMargin),

    // exact-substring decontamination: gram-anchored (train, bench)
    // candidate pairs, true-LCP extension over capped suffix slices
    // (kills any anchor false-positive and finds the maximal span),
    // per-doc interval merge, then the q271-style scan-local rebuild
    "q275_sa_decontaminate" -> (DeconCtes + """,
        |candx AS (
        |  SELECT doc, CAST(dpos AS BIGINT) AS f,
        |    CAST(dpos + lcp AS BIGINT) AS u
        |  FROM lcx WHERE lcp >= 8),
        |g1x AS (
        |  SELECT doc, f, u, max(u) OVER (PARTITION BY doc
        |    ORDER BY f, u ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND 1 PRECEDING) AS mu
        |  FROM candx),
        |g2x AS (SELECT *, CASE WHEN mu IS NULL OR f > mu THEN 1 ELSE 0
        |    END AS nw
        |  FROM g1x),
        |g3x AS (SELECT *, sum(nw) OVER (PARTITION BY doc
        |    ORDER BY f, u ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM g2x),
        |rngx AS (
        |  SELECT doc, min(f) AS cf, max(u) AS cu
        |  FROM g3x GROUP BY doc, grp),
        |covx AS (
        |  SELECT doc, unnest(generate_series(cf, cu - 1)) AS cp
        |  FROM rngx),
        |toksx AS (
        |  SELECT doc_id AS doc, t.i AS pos, a[t.i] AS tok
        |  FROM trn, LATERAL (SELECT unnest(generate_series(1, len(a)))
        |    AS i) t),
        |keptx AS (
        |  SELECT t.doc, t.pos, t.tok
        |  FROM toksx t LEFT JOIN covx c ON c.doc = t.doc AND c.cp = t.pos
        |  WHERE c.doc IS NULL),
        |kax AS (
        |  SELECT doc, count(*) AS n_kept,
        |    string_agg(tok, ' ' ORDER BY pos) AS ct
        |  FROM keptx GROUP BY doc)
        |SELECT trn.doc_id AS doc, CAST(len(trn.a) AS BIGINT) AS n_tokens,
        |  CAST(len(trn.a) - coalesce(kax.n_kept, 0) AS BIGINT)
        |    AS n_removed,
        |  coalesce(kax.ct, '') AS clean_text
        |FROM trn LEFT JOIN kax ON kax.doc = trn.doc_id""".stripMargin),

    // contamination attribution: the same anchor+LCP chain, merged
    // per (train doc, bench doc) pair, aggregated to the audit triple
    "q276_contamination_report" -> (DeconCtes + """,
        |candp AS (
        |  SELECT doc, bdoc, CAST(dpos AS BIGINT) AS f,
        |    CAST(dpos + lcp AS BIGINT) AS u
        |  FROM lcx WHERE lcp >= 8),
        |p1 AS (
        |  SELECT doc, bdoc, f, u, max(u) OVER (PARTITION BY doc, bdoc
        |    ORDER BY f, u ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND 1 PRECEDING) AS mu
        |  FROM candp),
        |p2 AS (SELECT *, CASE WHEN mu IS NULL OR f > mu THEN 1 ELSE 0
        |    END AS nw
        |  FROM p1),
        |p3 AS (SELECT *, sum(nw) OVER (PARTITION BY doc, bdoc
        |    ORDER BY f, u ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM p2),
        |prng AS (
        |  SELECT doc, bdoc, min(f) AS cf, max(u) AS cu
        |  FROM p3 GROUP BY doc, bdoc, grp)
        |SELECT doc, bdoc, CAST(count(*) AS BIGINT) AS n_spans,
        |  CAST(sum(cu - cf) AS BIGINT) AS contaminated_tokens,
        |  CAST(max(cu - cf) AS BIGINT) AS max_run
        |FROM prng GROUP BY doc, bdoc""".stripMargin),

    // SA capstone chain: excise (shared CTEs) -> >=10-kept gate ->
    // portable LSH -> 512-token bin packing, per-language accounting
    "q274_sa_lsh_pack" -> (SuffixSpansCtes + ",\n" + SaCutCtes +
      ",\n" + SaCleanCtes + ",\n" + SaLshPackSql),

    // incremental probe: the same brute suffix sort, but over the
    // probe SCOPE (batch ∪ gram-affected corpus docs), restricted to
    // batch-endpoint pairs — by the block argument this equals the
    // full rebuild restricted the same way (SuffixDedupSpec proves
    // that identity against duplicatedSpans over the union)
    "q273_sa_probe" -> (SaProbeCtes + "\n" +
      """SELECT doc_a, CAST(pos_a AS INT) AS pos_a, doc_b,
        |  CAST(pos_b AS INT) AS pos_b, lcp
        |FROM l WHERE lcp >= 8
        |  AND (doc_a % 4 = 2 OR doc_b % 4 = 2)""".stripMargin),

    // the q268 spans folded to per-doc cut ranges: larger-(doc, pos)
    // occurrence is the cut candidate, half-open intervals merge when
    // they overlap or touch (same gaps-and-islands the operator runs)
    "q269_sa_excise" -> (SuffixSpansCtes + ",\n" + SaCutCtes + "\n" +
      """SELECT doc, CAST(min(f) AS BIGINT) AS cut_from,
        |  CAST(max(u) AS BIGINT) AS cut_until,
        |  CAST(count(*) AS BIGINT) AS n_spans
        |FROM g3 GROUP BY doc, grp""".stripMargin),

    // the ExactSubstr TRANSFORM: q269's merged ranges applied to the
    // text — tokens inside cut ranges dropped, remainder re-joined.
    // string_agg over zero kept rows is NULL (DuckDB) vs '' (Spark
    // concat_ws) → coalesce, per the array_to_string invariant
    "q271_sa_excise_text" -> (SuffixSpansCtes + ",\n" + SaCutCtes +
      ",\n" + SaCleanCtes + "\n" +
      """SELECT d.doc_id AS doc, CAST(len(d.a) AS BIGINT) AS n_tokens,
        |  CAST(len(d.a) - coalesce(ka.n_kept, 0) AS BIGINT)
        |    AS n_removed,
        |  coalesce(ka.ct, '') AS clean_text
        |FROM d LEFT JOIN ka ON ka.doc = d.doc_id""".stripMargin),

    // SA-path curation pipeline: excise -> >= 20 kept tokens gate ->
    // per-language survivor accounting; every stage integer/hash-exact
    "q272_sa_pipeline" -> (SuffixSpansCtes + ",\n" + SaCutCtes +
      ",\n" + SaCleanCtes + ",\n" +
      """fin AS (
        |  SELECT d.doc_id AS doc, CAST(len(d.a) AS BIGINT) AS n_toks,
        |    CAST(coalesce(ka.n_kept, 0) AS BIGINT) AS n_kept
        |  FROM d LEFT JOIN ka ON ka.doc = d.doc_id),
        |sv AS (
        |  SELECT doc, n_kept, n_toks - n_kept AS n_removed
        |  FROM fin WHERE n_kept >= 20)
        |SELECT d0.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(sv.n_kept) AS BIGINT) AS kept_tokens,
        |  CAST(sum(sv.n_removed) AS BIGINT) AS removed_tokens
        |FROM sv JOIN documents d0 ON sv.doc = d0.doc_id
        |GROUP BY d0.lang""".stripMargin),

    "q64_overlap_join" ->
      """WITH a AS (
        |  SELECT o_orderkey,
        |    CAST(o_orderdate AS DATE) AS af,
        |    CAST(o_orderdate AS DATE) + 90 AS au
        |  FROM orders
        |), b AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(l_shipdate AS DATE) AS bf,
        |    CAST(l_shipdate AS DATE) + (1 + l_linenumber % 7) AS bu
        |  FROM lineitem
        |)
        |SELECT a.o_orderkey, b.l_linenumber,
        |  CAST(af AS VARCHAR) AS valid_from,
        |  CAST(au AS VARCHAR) AS valid_until,
        |  CAST(bf AS VARCHAR) AS valid_from_b,
        |  CAST(bu AS VARCHAR) AS valid_until_b,
        |  CAST(greatest(af, bf) AS VARCHAR) AS overlap_from,
        |  CAST(least(au, bu) AS VARCHAR) AS overlap_until
        |FROM a JOIN b ON a.o_orderkey = b.l_orderkey
        |WHERE af < bu AND bf < au
        |""".stripMargin,

    "q65_weighted_mix" ->
      """WITH w(lang, wt) AS (
        |  VALUES ('en', 5), ('zh', 2), ('de', 2), ('fr', 1), ('es', 1)
        |), c AS (
        |  SELECT lang, count(*) AS cnt FROM documents GROUP BY lang
        |), n AS (
        |  SELECT min((c.cnt * 11) // w.wt) AS n FROM c JOIN w USING (lang)
        |), k AS (
        |  SELECT lang, (n.n * wt) // 11 AS keep FROM w, n
        |), r AS (
        |  SELECT doc_id, lang, row_number() OVER (
        |      PARTITION BY lang
        |      ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |                 ::BIGINT % 1000000, doc_id) AS rk
        |  FROM documents
        |)
        |SELECT r.doc_id, r.lang FROM r JOIN k USING (lang)
        |WHERE rk <= keep
        |""".stripMargin,

    "q66_bloom_join" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS ext_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 490000
        |""".stripMargin,

    "q67_histogram" ->
      """WITH v AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v FROM lineitem
        |), b AS (
        |  SELECT l_returnflag, min(v) AS mn,
        |    ((max(v) - min(v)) // 8) + 1 AS wd
        |  FROM v GROUP BY l_returnflag
        |)
        |SELECT v.l_returnflag,
        |  CAST((v - mn) // wd AS INT) AS bucket,
        |  mn + ((v - mn) // wd) * wd AS lo,
        |  mn + (((v - mn) // wd) + 1) * wd AS hi,
        |  count(*) AS n
        |FROM v JOIN b USING (l_returnflag)
        |GROUP BY 1, 2, 3, 4
        |""".stripMargin,

    "q68_quantize" ->
      """WITH sc AS (
        |  SELECT max(av) AS s FROM (
        |    SELECT unnest(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS av
        |    FROM embeddings)
        |), e AS (
        |  SELECT vec_id, embedding, len(embedding) AS l FROM embeddings
        |)
        |SELECT vec_id, CAST(i AS INT) AS pos,
        |  greatest(-127, least(127,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 127.0 / s) AS BIGINT)))
        |    AS q
        |FROM e, sc,
        |  LATERAL (SELECT unnest(generate_series(1, l)) AS i) t
        |""".stripMargin,

    "q69_qmips" ->
      """WITH sc AS (
        |  SELECT max(av) AS s FROM (
        |    SELECT unnest(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS av
        |    FROM embeddings)
        |), q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> greatest(-127, least(127,
        |      CAST(round(CAST(x AS DOUBLE) * 127.0 / sc.s) AS BIGINT)))) AS qv
        |  FROM embeddings, sc
        |), p AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(list_zip(a.qv, b.qv),
        |      x -> x[1] * x[2])) AS BIGINT) AS qdot
        |  FROM q a JOIN q b
        |    ON a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id
        |), r AS (
        |  SELECT query_id, neighbor_id, qdot,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY qdot DESC, neighbor_id) AS rnk
        |  FROM p
        |)
        |SELECT query_id, CAST(rnk AS INT) AS rank, neighbor_id, qdot
        |FROM r WHERE rnk <= 10
        |""".stripMargin,

    // q156: q69's integer-MIPS ranking re-derived, scored against
    // same-label truth pairs with integer recall/RR arithmetic
    "q156_retrieval_eval" ->
      """WITH sc AS (
        |  SELECT max(av) AS s FROM (
        |    SELECT unnest(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS av
        |    FROM embeddings)
        |), q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> greatest(-127, least(127,
        |      CAST(round(CAST(x AS DOUBLE) * 127.0 / sc.s) AS BIGINT)))) AS qv
        |  FROM embeddings, sc
        |), p AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(list_zip(a.qv, b.qv),
        |      x -> x[1] * x[2])) AS BIGINT) AS qdot
        |  FROM q a JOIN q b
        |    ON a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id
        |), r AS (
        |  SELECT query_id, neighbor_id, qdot,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY qdot DESC, neighbor_id) AS rnk
        |  FROM p
        |), tr AS (
        |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS doc_id
        |  FROM embeddings a JOIN embeddings b
        |    ON a.vec_id % 50 = 0 AND a.label = b.label
        |      AND b.vec_id <> a.vec_id
        |), nt AS (
        |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth
        |  FROM tr GROUP BY 1
        |), h AS (
        |  SELECT r.query_id, CAST(count(*) AS BIGINT) AS hits,
        |    CAST(min(r.rnk) AS BIGINT) AS first_rank
        |  FROM r JOIN tr ON r.query_id = tr.query_id
        |    AND r.neighbor_id = tr.doc_id
        |  WHERE r.rnk <= 10 GROUP BY 1
        |)
        |SELECT nt.query_id, nt.n_truth,
        |  coalesce(h.hits, 0) AS hits,
        |  coalesce(h.first_rank, 0) AS first_rank,
        |  (coalesce(h.hits, 0) * 10000) // least(nt.n_truth, 10)
        |    AS recall_bp,
        |  CASE WHEN coalesce(h.first_rank, 0) > 0
        |       THEN 1000000 // h.first_rank ELSE 0 END AS rr_fp
        |FROM nt LEFT JOIN h ON nt.query_id = h.query_id""".stripMargin,

    "q73_training_matrix" ->
      """SELECT o_orderkey, o_custkey AS key_cust,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d,
        |  c_mktsegment AS mktsegment,
        |  count(*) OVER (PARTITION BY o_custkey
        |    ORDER BY CAST(o_orderdate AS DATE)
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS n_orders_to_date
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |""".stripMargin,

    "q154_mutual_link" ->
      """WITH n AS (
        |  SELECT p_name, min(p_partkey) AS id FROM part GROUP BY p_name
        |), p AS (
        |  SELECT id, p_name, string_split(p_name, ' ')[2] AS blk FROM n
        |), a AS (
        |  SELECT id AS id_a, p_name AS name_a, blk FROM p WHERE id % 2 = 0
        |), b AS (
        |  SELECT id AS id_b, p_name AS name_b, blk FROM p WHERE id % 2 = 1
        |), c AS (
        |  SELECT id_a, id_b, levenshtein(name_a, name_b) AS dist
        |  FROM a JOIN b USING (blk)
        |  WHERE levenshtein(name_a, name_b) <= 3
        |), ba AS (
        |  SELECT id_a, id_b, dist FROM (
        |    SELECT *, row_number() OVER (PARTITION BY id_a
        |      ORDER BY dist, id_b) AS rn FROM c) WHERE rn = 1
        |), bb AS (
        |  SELECT id_a, id_b, dist FROM (
        |    SELECT *, row_number() OVER (PARTITION BY id_b
        |      ORDER BY dist, id_a) AS rn FROM c) WHERE rn = 1
        |)
        |SELECT id_a, id_b, CAST(ba.dist AS INT) AS dist
        |FROM ba JOIN bb USING (id_a, id_b, dist)""".stripMargin,

    "q74_fuzzy_parts" ->
      """WITH n AS (
        |  SELECT p_name, min(p_partkey) AS id FROM part GROUP BY p_name
        |), p AS (
        |  SELECT id, p_name, string_split(p_name, ' ')[2] AS blk FROM n
        |)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM p a JOIN p b ON a.blk = b.blk AND a.id < b.id
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |""".stripMargin,

    // Same Morton bit-interleave formula, generated once in Scala and
    // embedded on both sides — exact integer arithmetic throughout.
    "q81_zorder" -> {
      val terms = (0 until 10).flatMap(i => Seq(
        s"((((l_partkey % 1024) >> $i) & 1) << ${2 * i})",
        s"((((l_suppkey % 1024) >> $i) & 1) << ${2 * i + 1})"))
      s"""SELECT l_orderkey,
         |  CAST(l_partkey % 1024 AS BIGINT) AS x,
         |  CAST(l_suppkey % 1024 AS BIGINT) AS y,
         |  CAST(${terms.mkString(" + ")} AS BIGINT) AS zval
         |FROM lineitem""".stripMargin
    },

    "q79_entity_clusters" ->
      """WITH RECURSIVE n AS (
        |  SELECT p_name, min(p_partkey) AS id FROM part GROUP BY p_name
        |), p AS (
        |  SELECT id, p_name, string_split(p_name, ' ')[2] AS blk FROM n
        |), cand AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM p a JOIN p b ON a.blk = b.blk AND a.id < b.id
        |  WHERE levenshtein(a.p_name, b.p_name) <= 2
        |), e AS (
        |  SELECT id_a AS a, id_b AS b FROM cand
        |  UNION
        |  SELECT id_b, id_a FROM cand
        |), r AS (
        |  SELECT a AS id, a AS l FROM e
        |  UNION
        |  SELECT e.a, r.l FROM e JOIN r ON e.b = r.id
        |)
        |SELECT CAST(id AS BIGINT) AS id,
        |  CAST(min(l) AS BIGINT) AS cluster_id
        |FROM r GROUP BY id""".stripMargin,

    "q75_keywords" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT term, doc_id, count(*) AS tf FROM t GROUP BY term, doc_id
        |), d AS (
        |  SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tf DESC, df, term) AS rnk
        |  FROM d
        |)
        |SELECT doc_id, CAST(rnk AS INT) AS rank, term, tf, df
        |FROM r WHERE rnk <= 3
        |""".stripMargin,

    "q76_minmax_scale" ->
      """WITH v AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |), b AS (
        |  SELECT o_orderpriority, min(cents) AS mn, max(cents) AS mx
        |  FROM v GROUP BY o_orderpriority
        |)
        |SELECT o_orderkey, v.o_orderpriority, cents,
        |  CASE WHEN mx = mn THEN 0
        |       ELSE ((cents - mn) * 1000) // (mx - mn) END AS scaled
        |FROM v JOIN b USING (o_orderpriority)
        |""".stripMargin,

    "q70_inverted_index" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT term, doc_id, count(*) AS tf FROM t GROUP BY term, doc_id
        |), d AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term
        |)
        |SELECT tf.term, tf.doc_id, tf.tf
        |FROM tf JOIN d USING (term)
        |WHERE d.df >= 25
        |""".stripMargin,

    "q71_bm25" -> Bm25OracleSql,

    "q84_group_sample" ->
      """WITH r AS (
        |  SELECT doc_id, lang, row_number() OVER (
        |      PARTITION BY lang
        |      ORDER BY ('0x' || substr(md5(
        |          CAST(doc_id AS VARCHAR) || '|r4'), 1, 8))
        |        ::BIGINT % 1000000, doc_id) AS sample_rank
        |  FROM documents
        |)
        |SELECT doc_id, lang, CAST(sample_rank AS INT) AS sample_rank
        |FROM r WHERE sample_rank <= 20
        |""".stripMargin,

    "q85_shard_stats" ->
      """SELECT
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|r4'), 1, 8))
        |    ::BIGINT % 16 AS shard,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents GROUP BY 1
        |""".stripMargin,

    "q86_winsorize" ->
      """WITH v AS (
        |  SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |), r AS (
        |  SELECT g, cents,
        |    row_number() OVER (PARTITION BY g ORDER BY cents) AS rn,
        |    count(*) OVER (PARTITION BY g) AS n
        |  FROM v
        |), b AS (
        |  SELECT g,
        |    max(CASE WHEN rn = greatest(1, (n * 100 + 9999) // 10000)
        |        THEN cents END) AS lo,
        |    max(CASE WHEN rn = greatest(1, (n * 9900 + 9999) // 10000)
        |        THEN cents END) AS hi
        |  FROM r GROUP BY g
        |)
        |SELECT r.g AS l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(least(greatest(r.cents, b.lo), b.hi)) AS BIGINT)
        |    AS lo_cents,
        |  CAST(max(least(greatest(r.cents, b.lo), b.hi)) AS BIGINT)
        |    AS hi_cents,
        |  CAST(sum(CASE WHEN least(greatest(r.cents, b.lo), b.hi)
        |      <> r.cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
        |  CAST(sum(least(greatest(r.cents, b.lo), b.hi)) AS BIGINT)
        |    AS sum_cents
        |FROM r JOIN b USING (g) GROUP BY r.g
        |""".stripMargin,

    "q88_compaction_plan" ->
      """WITH m AS (
        |  SELECT lang, doc_id // 50 AS file_id,
        |    CAST(sum(strlen(text)) AS BIGINT) AS bytes
        |  FROM documents GROUP BY 1, 2
        |), c AS (
        |  SELECT lang, file_id, bytes,
        |    sum(bytes) OVER (PARTITION BY lang ORDER BY file_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM m
        |)
        |SELECT lang, file_id, bytes,
        |  CAST(greatest(0, (cum - 1) // 32768) AS BIGINT) AS target_file
        |FROM c
        |""".stripMargin,

    "q90_table_stats" -> Seq("l_orderkey", "l_returnflag", "l_shipdate",
      "l_linestatus").map { c =>
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_value,
         |  CAST(max($c) AS VARCHAR) AS max_value
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\n"),

    "q91_equidepth" ->
      """WITH v AS (
        |  SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem
        |), t AS (
        |  SELECT g, v,
        |    ntile(8) OVER (PARTITION BY g ORDER BY v) AS bucket
        |  FROM v
        |)
        |SELECT g AS l_returnflag, CAST(bucket AS INT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(v) AS BIGINT) AS lo, CAST(max(v) AS BIGINT) AS hi
        |FROM t GROUP BY 1, 2
        |""".stripMargin,

    "q96_accept_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|q96'),
        |    1, 8))::BIGINT % 10000
        |  < CASE lang WHEN 'en' THEN 10000 WHEN 'zh' THEN 5000
        |      WHEN 'de' THEN 2500 WHEN 'fr' THEN 1000 ELSE 500 END
        |""".stripMargin,

    "q92_heavy_keys" ->
      """WITH c AS (
        |  SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1
        |), t AS (
        |  SELECT l_orderkey, n,
        |    row_number() OVER (ORDER BY n DESC, l_orderkey) AS rank
        |  FROM c
        |), u AS (
        |  SELECT rank, l_orderkey, n,
        |    sum(n) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t WHERE rank <= 20
        |), tot AS (SELECT count(*) AS t FROM lineitem)
        |SELECT CAST(rank AS INT) AS rank, l_orderkey,
        |  CAST(n AS BIGINT) AS n,
        |  CAST((n * 10000) // t AS BIGINT) AS share_bp,
        |  CAST((cum * 10000) // t AS BIGINT) AS cum_share_bp
        |FROM u, tot
        |""".stripMargin,

    // q117: RANK() ties semantics on both engines; sum_cross is an
    // order-independent integer fold over (rank, value) pairs
    "q117_pct_rank" ->
      """WITH v AS (
        |  SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |), r AS (
        |  SELECT g, cents,
        |    rank() OVER (PARTITION BY g ORDER BY cents) AS rk
        |  FROM v
        |)
        |SELECT g AS l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(rk) AS BIGINT) AS sum_rank,
        |  CAST(max(rk) AS BIGINT) AS max_rank,
        |  CAST(sum(rk * (cents % 997)) AS BIGINT) AS sum_cross
        |FROM r GROUP BY g""".stripMargin,

    // q122: every metric is an exact count; dups counted against the
    // duplicate's source under the global canonical-min-id rule
    "q122_dataset_card" ->
      """WITH base AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+')))
        |      AS BIGINT) AS n_tokens,
        |    CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |    CAST(sum(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_empty
        |  FROM documents GROUP BY source
        |), dup AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n FROM (
        |    SELECT source, doc_id,
        |      min(doc_id) OVER (PARTITION BY text) AS canon
        |    FROM documents)
        |  WHERE doc_id <> canon GROUP BY source
        |)
        |SELECT source, 'n_docs' AS metric,
        |  CAST(n_docs AS BIGINT) AS value FROM base
        |UNION ALL SELECT source, 'n_tokens', n_tokens FROM base
        |UNION ALL SELECT source, 'total_chars', total_chars FROM base
        |UNION ALL SELECT source, 'n_empty', n_empty FROM base
        |UNION ALL SELECT source, 'avg_tokens_c',
        |  CAST(n_tokens * 100 // greatest(n_docs, 1) AS BIGINT) FROM base
        |UNION ALL SELECT b.source, 'n_exact_dup',
        |  CAST(coalesce(d.n, 0) AS BIGINT)
        |FROM base b LEFT JOIN dup d USING (source)
        |UNION ALL SELECT source, 'n_lang_' || lang,
        |  CAST(count(*) AS BIGINT)
        |FROM documents GROUP BY source, lang""".stripMargin,

    // q116: same md5 recipe as the Spark side; rank ties broken by
    // neg_id so the top-k is total-ordered on both engines
    "q116_negative_sample" ->
      """WITH q AS (
        |  SELECT doc_id AS query_id FROM documents WHERE doc_id % 50 = 0
        |), p AS (
        |  SELECT doc_id AS neg_id FROM documents WHERE doc_id % 7 = 0
        |), s AS (
        |  SELECT query_id, neg_id,
        |    CAST(('0x' || substr(md5(CAST(query_id AS VARCHAR) || '|' ||
        |      CAST(neg_id AS VARCHAR) || '|neg1'), 1, 8)) AS BIGINT) AS h
        |  FROM q CROSS JOIN p
        |  WHERE neg_id <> query_id
        |), r AS (
        |  SELECT query_id, neg_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY h, neg_id) AS rn
        |  FROM s
        |)
        |SELECT query_id, CAST(rn AS INT) AS neg_rank, neg_id
        |FROM r WHERE rn <= 8""".stripMargin,

    // q113: lower median at rank (n+1)//2 on values, then on absolute
    // deviations; score division is nonnegative, so DuckDB's floor //
    // and Spark's truncating div agree
    "q113_mad_outliers" ->
      """WITH v AS (
        |  SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |), r AS (
        |  SELECT g, cents,
        |    row_number() OVER (PARTITION BY g ORDER BY cents) AS rn,
        |    count(*) OVER (PARTITION BY g) AS n
        |  FROM v
        |), m AS (
        |  SELECT g, max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS med
        |  FROM r GROUP BY g
        |), d AS (
        |  SELECT v.g, cents, med, abs(cents - med) AS dev
        |  FROM v JOIN m USING (g)
        |), r2 AS (
        |  SELECT g, dev,
        |    row_number() OVER (PARTITION BY g ORDER BY dev) AS rn,
        |    count(*) OVER (PARTITION BY g) AS n
        |  FROM d
        |), m2 AS (
        |  SELECT g, max(CASE WHEN rn = (n + 1) // 2 THEN dev END) AS mad
        |  FROM r2 GROUP BY g
        |)
        |SELECT d.g AS l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(max(med) AS BIGINT) AS median_cents,
        |  CAST(max(mad) AS BIGINT) AS mad_cents,
        |  CAST(sum(CASE WHEN dev * 10000 // greatest(mad, 1) >= 20000
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST(max(dev * 10000 // greatest(mad, 1)) AS BIGINT)
        |    AS max_score_bp
        |FROM d JOIN m2 USING (g)
        |GROUP BY d.g""".stripMargin,

    // q130: the same 5 integer power-iteration rounds as a recursive
    // CTE. Single recursive reference (DuckDB/Postgres rule): the
    // contribution aggregate carries `it` forward; the LEFT JOIN is
    // safe because the graph is bidirectional — every node has an
    // in-edge, so every node appears in the aggregate each round.
    "q130_pagerank" ->
      """WITH RECURSIVE
        |p AS (
        |  SELECT DISTINCT l_suppkey + 10000000 AS supp,
        |    o_custkey + 20000000 AS cust
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |),
        |edges AS (
        |  SELECT supp AS src, cust AS dst FROM p
        |  UNION ALL SELECT cust, supp FROM p
        |),
        |nodes AS (
        |  -- explicit outer DISTINCT: under WITH RECURSIVE, DuckDB
        |  -- runs a bare `a UNION b` CTE body as UNION ALL
        |  SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM edges
        |    UNION ALL SELECT dst FROM edges)
        |),
        |od AS (SELECT src, count(*) AS cnt FROM edges GROUP BY src),
        |consts AS (
        |  SELECT CAST(1000000000000 AS BIGINT) AS scale,
        |    (SELECT count(*) FROM nodes) AS n
        |),
        |pr(it, node, r) AS (
        |  SELECT 0, node, CAST(scale // n AS BIGINT)
        |  FROM nodes, consts
        |  UNION ALL
        |  SELECT c.it, nd.node,
        |    CAST((SELECT scale * 1500 // 10000 // n FROM consts)
        |      + coalesce(c.s, 0) AS BIGINT)
        |  FROM nodes nd
        |  LEFT JOIN (
        |    SELECT pr.it + 1 AS it, e.dst AS node,
        |      SUM((pr.r * 8500 // 10000) // od.cnt) AS s
        |    FROM pr JOIN edges e ON pr.node = e.src
        |    JOIN od ON od.src = pr.node
        |    GROUP BY 1, 2) c ON c.node = nd.node
        |  WHERE c.it <= 5
        |)
        |SELECT node, CAST(r AS BIGINT) AS rank
        |FROM pr WHERE it = 5""".stripMargin,

    // q200: SCC = mutual-reachability classes from the transitive
    // closure (UNION-fixpoint recursion, one recursive reference);
    // scc label = min mutually-reachable id (self included)
    "q200_scc" ->
      """WITH RECURSIVE
        |pr AS (
        |  SELECT l_suppkey AS sk, o_custkey AS ck, o_totalprice
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
        |                      WHERE s_nationkey < 5)
        |    AND o_custkey IN (SELECT c_custkey FROM customer
        |                      WHERE c_nationkey < 5)),
        |edges AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT sk + 10000000 AS src, ck + 20000000 AS dst FROM pr
        |    UNION ALL
        |    SELECT ck + 20000000, sk + 10000000 FROM pr
        |    WHERE o_totalprice > 300000)),
        |nodes AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM edges
        |    UNION ALL SELECT dst FROM edges)),
        |reach(s, d) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.s, e.dst FROM reach r JOIN edges e ON r.d = e.src),
        |mutual AS (
        |  SELECT a.s AS u, a.d AS v
        |  FROM reach a JOIN reach b ON b.s = a.d AND b.d = a.s)
        |SELECT n.node,
        |  CAST(least(coalesce(min(m.v), n.node), n.node) AS BIGINT)
        |    AS scc
        |FROM nodes n LEFT JOIN mutual m ON m.u = n.node
        |GROUP BY n.node""".stripMargin,

    // q134: q130's recursive CTE with the teleport restricted to the
    // seed slice — initial mass and the undamped base land only on
    // seed nodes (CASE on the seed flag); the LEFT JOIN stays safe
    // for the same reason as q130 (bidirectional graph: every node
    // takes an aggregate row every round, even at rank 0)
    "q134_trustrank" ->
      """WITH RECURSIVE
        |p AS (
        |  SELECT DISTINCT l_suppkey + 10000000 AS supp,
        |    o_custkey + 20000000 AS cust
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |),
        |edges AS (
        |  SELECT supp AS src, cust AS dst FROM p
        |  UNION ALL SELECT cust, supp FROM p
        |),
        |nodes AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM edges
        |    UNION ALL SELECT dst FROM edges)
        |),
        |seeded AS (
        |  SELECT node, CASE WHEN node IN (
        |    SELECT s_suppkey + 10000000 FROM supplier
        |    WHERE s_nationkey < 5) THEN 1 ELSE 0 END AS sd
        |  FROM nodes
        |),
        |od AS (SELECT src, count(*) AS cnt FROM edges GROUP BY src),
        |consts AS (
        |  SELECT CAST(1000000000000 AS BIGINT) AS scale,
        |    (SELECT CAST(sum(sd) AS BIGINT) FROM seeded) AS ns
        |),
        |pr(it, node, r) AS (
        |  SELECT 0, node, CAST(sd * (scale // ns) AS BIGINT)
        |  FROM seeded, consts
        |  UNION ALL
        |  SELECT c.it, nd.node,
        |    CAST(nd.sd * (SELECT scale * 1500 // 10000 // ns FROM consts)
        |      + coalesce(c.s, 0) AS BIGINT)
        |  FROM seeded nd
        |  LEFT JOIN (
        |    SELECT pr.it + 1 AS it, e.dst AS node,
        |      SUM((pr.r * 8500 // 10000) // od.cnt) AS s
        |    FROM pr JOIN edges e ON pr.node = e.src
        |    JOIN od ON od.src = pr.node
        |    GROUP BY 1, 2) c ON c.node = nd.node
        |  WHERE c.it <= 5
        |)
        |SELECT node, CAST(r AS BIGINT) AS rank
        |FROM pr WHERE it = 5""".stripMargin,

    // q142: HUGEINT promotion before the lift product mirrors the
    // Spark side's decimal(38,0); LIMIT is safe on the total
    // (lift, pair) order
    "q142_assoc_rules" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS b, CAST(l_partkey AS BIGINT) AS i
        |  FROM lineitem),
        |nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM items),
        |sup AS (SELECT i, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY 1),
        |pairs AS (
        |  SELECT a.i AS item_a, b.i AS item_b, CAST(count(*) AS BIGINT) AS c_ab
        |  FROM items a JOIN items b ON a.b = b.b AND a.i < b.i
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT item_a, item_b, sa.c AS c_a, sb.c AS c_b, c_ab,
        |  CAST(CAST(c_ab AS HUGEINT) * (SELECT n FROM nb) * 10000
        |    // (CAST(sa.c AS HUGEINT) * sb.c) AS BIGINT) AS lift_bp
        |FROM pairs JOIN sup sa ON sa.i = item_a JOIN sup sb ON sb.i = item_b
        |ORDER BY lift_bp DESC, item_a, item_b
        |LIMIT 50""".stripMargin,

    "q151_item_jaccard" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS b, CAST(l_partkey AS BIGINT) AS i
        |  FROM lineitem),
        |sup AS (SELECT i, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY 1),
        |pairs AS (
        |  SELECT a.i AS item_a, b.i AS item_b, CAST(count(*) AS BIGINT) AS c_ab
        |  FROM items a JOIN items b ON a.b = b.b AND a.i < b.i
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT item_a, item_b, sa.c AS c_a, sb.c AS c_b, c_ab,
        |  CAST((c_ab * 10000) // (sa.c + sb.c - c_ab) AS BIGINT)
        |    AS jaccard_bp
        |FROM pairs JOIN sup sa ON sa.i = item_a JOIN sup sb ON sb.i = item_b
        |ORDER BY jaccard_bp DESC, item_a, item_b
        |LIMIT 50""".stripMargin,

    "q149_phrase_search" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, generate_subscripts(a, 1) AS pos,
        |    unnest(a) AS term
        |  FROM t),
        |a0 AS (SELECT doc_id, pos AS p0 FROM p WHERE term = 'table'),
        |a1 AS (SELECT doc_id, pos - 1 AS p0 FROM p WHERE term = 'value')
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches
        |FROM a0 JOIN a1 USING (doc_id, p0)
        |GROUP BY doc_id""".stripMargin,

    // q141: ordinal Σ rank·v is permutation-invariant under ties, so
    // a bare row_number over v reproduces the Spark side's min-rank +
    // correction formulation exactly; HUGEINT keeps the products exact
    "q141_gini" ->
      """WITH per AS (
        |  SELECT c_mktsegment AS seg, o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |r AS (SELECT seg, v,
        |  row_number() OVER (PARTITION BY seg ORDER BY v) AS rk FROM per),
        |g AS (SELECT seg, CAST(count(*) AS BIGINT) AS n, sum(v) AS s0,
        |  sum(rk * v) AS s1 FROM r GROUP BY 1)
        |SELECT seg AS c_mktsegment, n, CAST(s0 AS BIGINT) AS total,
        |  CAST((2 * s1 - (n + 1) * s0) * 10000 // (n * s0) AS BIGINT)
        |    AS gini_bp
        |FROM g""".stripMargin,

    // q139: cut values via row_number rank joins (DuckDB cannot use a
    // correlated OFFSET), bucket = 1 + count of cuts strictly below —
    // the same deterministic rule the Spark side folds into literals
    "q139_rfm" ->
      """WITH per AS (
        |  SELECT CAST(o_custkey AS BIGINT) AS cust,
        |    CAST(date_diff('day', max(CAST(o_orderdate AS DATE)),
        |      DATE '1998-12-01') AS BIGINT) AS recency,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS monetary
        |  FROM orders GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per),
        |i4 AS (SELECT unnest(generate_series(1, 4)) AS i),
        |rr AS (SELECT recency AS v,
        |  row_number() OVER (ORDER BY recency) AS rn FROM per),
        |fr AS (SELECT frequency AS v,
        |  row_number() OVER (ORDER BY frequency) AS rn FROM per),
        |mr AS (SELECT monetary AS v,
        |  row_number() OVER (ORDER BY monetary) AS rn FROM per),
        |rc AS (SELECT i, v AS cut FROM i4 JOIN rr
        |  ON rr.rn = greatest(1, (SELECT n FROM n) * i // 5)),
        |fc AS (SELECT i, v AS cut FROM i4 JOIN fr
        |  ON fr.rn = greatest(1, (SELECT n FROM n) * i // 5)),
        |mc AS (SELECT i, v AS cut FROM i4 JOIN mr
        |  ON mr.rn = greatest(1, (SELECT n FROM n) * i // 5)),
        |b AS (
        |  SELECT cust, recency, frequency, monetary,
        |    CAST(1 + (SELECT count(*) FROM rc
        |      WHERE per.recency > rc.cut) AS BIGINT) AS r,
        |    CAST(1 + (SELECT count(*) FROM fc
        |      WHERE per.frequency > fc.cut) AS BIGINT) AS f,
        |    CAST(1 + (SELECT count(*) FROM mc
        |      WHERE per.monetary > mc.cut) AS BIGINT) AS m
        |  FROM per)
        |SELECT cust, recency, frequency, monetary, r, f, m,
        |  r * 100 + f * 10 + m AS segment
        |FROM b""".stripMargin,

    // q136: each rule re-stated as plain SQL; DuckDB sum() is HUGEINT
    // so every count is CAST back to BIGINT. Rule labels must match
    // the Scala constructors byte-for-byte (they are data here).
    "q136_expectations" ->
      """WITH t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM lineitem)
        |SELECT 'not_null(l_orderkey)' AS rule,
        |  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
        |  (SELECT total FROM t) AS total FROM lineitem
        |UNION ALL
        |SELECT 'in_range(l_quantity,1,50)',
        |  CAST(sum(CASE WHEN l_quantity IS NOT NULL
        |    AND (l_quantity < 1 OR l_quantity > 50) THEN 1 ELSE 0 END) AS BIGINT),
        |  (SELECT total FROM t) FROM lineitem
        |UNION ALL
        |SELECT 'in_range(l_linenumber,1,4)',
        |  CAST(sum(CASE WHEN l_linenumber IS NOT NULL
        |    AND (l_linenumber < 1 OR l_linenumber > 4) THEN 1 ELSE 0 END) AS BIGINT),
        |  (SELECT total FROM t) FROM lineitem
        |UNION ALL
        |SELECT 'matches(l_returnflag)',
        |  CAST(sum(CASE WHEN l_returnflag IS NOT NULL
        |    AND NOT regexp_matches(l_returnflag, '^[ARN]$') THEN 1 ELSE 0 END) AS BIGINT),
        |  (SELECT total FROM t) FROM lineitem
        |UNION ALL
        |SELECT 'in_set(l_linestatus)',
        |  CAST(sum(CASE WHEN l_linestatus IS NOT NULL
        |    AND l_linestatus NOT IN ('O', 'F') THEN 1 ELSE 0 END) AS BIGINT),
        |  (SELECT total FROM t) FROM lineitem
        |UNION ALL
        |SELECT 'disc_bound',
        |  CAST(sum(CASE WHEN l_discount > 0.06 THEN 1 ELSE 0 END) AS BIGINT),
        |  (SELECT total FROM t) FROM lineitem
        |UNION ALL
        |SELECT 'pk_unique',
        |  (SELECT total FROM t) - CAST((SELECT count(*) FROM (
        |    SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS BIGINT),
        |  (SELECT total FROM t)
        |UNION ALL
        |SELECT 'fk_orders',
        |  CAST((SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL
        |    AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT),
        |  CAST((SELECT count(*) FROM lineitem
        |    WHERE l_orderkey IS NOT NULL) AS BIGINT)""".stripMargin,

    // q131: canonical u<v part pairs, then the textbook three-way
    // self-join triangle enumeration (u<v<w appears once); per-node
    // membership via a 3-way union. The Spark side's degree-ordered
    // wedge join finds the same set — exact integers both ways.
    "q131_triangles" ->
      """WITH li AS (
        |  SELECT l_orderkey AS ok, CAST(l_partkey AS BIGINT) AS pk
        |  FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (
        |  SELECT node, count(*) AS degree FROM (
        |    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY node),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |tn AS (
        |  SELECT node, count(*) AS t FROM (
        |    SELECT a AS node FROM tri
        |    UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri)
        |  GROUP BY node)
        |SELECT CAST(deg.node AS BIGINT) AS node,
        |  CAST(deg.degree AS BIGINT) AS degree,
        |  CAST(coalesce(tn.t, 0) AS BIGINT) AS triangles,
        |  CAST(CASE WHEN degree >= 2
        |    THEN (20000 * coalesce(tn.t, 0)) // (degree * (degree - 1))
        |    ELSE 0 END AS BIGINT) AS cc_bp
        |FROM deg LEFT JOIN tn USING (node)""".stripMargin,

    // q132: the same 4 normalized HITS rounds as a recursive CTE; the
    // recursive term references r once (the auth half-step), computes
    // the hub half-step from the fresh auths in a nested CTE, and
    // re-joins the halves FULL OUTER (a node absent from one side
    // that round scores 0 there). sum() returns HUGEINT -> every
    // normalized value is CAST back to BIGINT, and greatest(.., 1)
    // guards the all-zero total.
    // eff mirrors Graph.hitsScale EXACTLY: the largest s ≤ 10^6 with
    // s²·dmax ≤ 2⁶³−1, via integer-corrected float sqrt (the ±2 CASE
    // ladder absorbs any double rounding) — so operator and oracle
    // stay in lockstep at ANY max degree, not just dmax < ~9.2e6
    "q132_hits" ->
      """WITH RECURSIVE
        |p AS (
        |  SELECT DISTINCT CAST(l_suppkey + 10000000 AS BIGINT) AS src,
        |    CAST(o_custkey + 20000000 AS BIGINT) AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |nodes AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM p UNION ALL SELECT dst FROM p)),
        |dm AS (
        |  SELECT greatest(max(d), 1) AS dmax FROM (
        |    SELECT node, count(*) AS d FROM (
        |      SELECT src AS node FROM p UNION ALL SELECT dst FROM p)
        |    GROUP BY 1)),
        |effc AS (
        |  SELECT least(1000000, CASE
        |      WHEN (s0 + 2) * (s0 + 2) <= q THEN s0 + 2
        |      WHEN (s0 + 1) * (s0 + 1) <= q THEN s0 + 1
        |      WHEN s0 * s0 <= q THEN s0
        |      WHEN (s0 - 1) * (s0 - 1) <= q THEN s0 - 1
        |      ELSE s0 - 2 END) AS eff
        |  FROM (
        |    SELECT q, CAST(floor(sqrt(CAST(q AS DOUBLE))) AS HUGEINT)
        |      AS s0
        |    FROM (SELECT 9223372036854775807 // dmax AS q FROM dm))),
        |r AS (
        |  SELECT 0 AS it, node,
        |    CAST((SELECT eff FROM effc) AS BIGINT) AS hub,
        |    CAST((SELECT eff FROM effc) AS BIGINT) AS auth
        |  FROM nodes
        |  UNION ALL
        |  SELECT it, node, hub, auth FROM (
        |    WITH a AS (
        |      SELECT r.it + 1 AS it, p.dst AS node, sum(r.hub) AS ra
        |      FROM r JOIN p ON r.node = p.src
        |      WHERE r.it < 4
        |      GROUP BY r.it + 1, p.dst),
        |    na AS (
        |      SELECT it, node, CAST(ra * (SELECT eff FROM effc) //
        |        greatest(sum(ra) OVER (PARTITION BY it), 1) AS BIGINT) AS auth
        |      FROM a),
        |    h AS (
        |      SELECT na.it, p.src AS node, sum(na.auth) AS rh
        |      FROM na JOIN p ON na.node = p.dst
        |      GROUP BY na.it, p.src),
        |    nh AS (
        |      SELECT it, node, CAST(rh * (SELECT eff FROM effc) //
        |        greatest(sum(rh) OVER (PARTITION BY it), 1) AS BIGINT) AS hub
        |      FROM h)
        |    SELECT coalesce(na.it, nh.it) AS it,
        |      coalesce(na.node, nh.node) AS node,
        |      coalesce(nh.hub, 0) AS hub, coalesce(na.auth, 0) AS auth
        |    FROM na FULL OUTER JOIN nh
        |      ON na.it = nh.it AND na.node = nh.node
        |  )
        |)
        |SELECT node, CAST(hub AS BIGINT) AS hub, CAST(auth AS BIGINT) AS auth
        |FROM r WHERE it = 4""".stripMargin,

    // q137: the same 5 LPA rounds as a recursive CTE — neighbor+self
    // label counts (self-loops appended to the propagation list), the
    // argmax resolved by a window ordered (count DESC, label ASC)
    // inside the recursive term
    "q137_communities" ->
      """WITH RECURSIVE
        |li AS (
        |  SELECT l_orderkey AS ok, CAST(l_partkey AS BIGINT) AS pk
        |  FROM lineitem),
        |p0 AS (
        |  SELECT u, v FROM (
        |    SELECT a.pk AS u, b.pk AS v, count(DISTINCT a.ok) AS c
        |    FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |    GROUP BY 1, 2) WHERE c >= 2),
        |nodes AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT u AS node FROM p0 UNION ALL SELECT v FROM p0)),
        |prop AS (
        |  SELECT u AS src, v AS dst FROM p0
        |  UNION ALL SELECT v, u FROM p0
        |  UNION ALL SELECT node, node FROM nodes),
        |r AS (
        |  SELECT 0 AS it, node, node AS label FROM nodes
        |  UNION ALL
        |  SELECT it, node, label FROM (
        |    SELECT c.it, c.node, c.label,
        |      row_number() OVER (PARTITION BY c.it, c.node
        |                         ORDER BY c.cnt DESC, c.label ASC) AS rn
        |    FROM (
        |      SELECT r.it + 1 AS it, p.dst AS node, r.label AS label,
        |        count(*) AS cnt
        |      FROM r JOIN prop p ON r.node = p.src
        |      WHERE r.it < 5
        |      GROUP BY r.it + 1, p.dst, r.label
        |    ) c
        |  ) WHERE rn = 1
        |)
        |SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
        |FROM r WHERE it = 5""".stripMargin,

    // q133: fixed 8 peel rounds over edge-endpoint incidence rows —
    // degree = count per (it, node) window, an edge survives iff
    // min(endpoint degree) >= k; rounds past the fixpoint are no-ops
    // so the Spark loop's early exit matches. Final degree = row
    // count per node at it = 8.
    "q133_kcore" ->
      """WITH RECURSIVE
        |li AS (
        |  SELECT l_orderkey AS ok, CAST(l_partkey AS BIGINT) AS pk
        |  FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |inc AS (
        |  SELECT 0 AS it, u, v, u AS node FROM e
        |  UNION ALL SELECT 0, u, v, v FROM e),
        |r AS (
        |  SELECT * FROM inc
        |  UNION ALL
        |  SELECT it + 1, u, v, node FROM (
        |    SELECT *, min(dn) OVER (PARTITION BY it, u, v) AS mind FROM (
        |      SELECT *, count(*) OVER (PARTITION BY it, node) AS dn FROM r
        |    )
        |  ) WHERE mind >= 80 AND it < 8
        |)
        |SELECT CAST(node AS BIGINT) AS node,
        |  CAST(count(*) AS BIGINT) AS core_degree
        |FROM r WHERE it = 8 GROUP BY node""".stripMargin,

    "q150_shortest_paths" ->
      """WITH li AS (
        |  SELECT CAST(l_suppkey AS BIGINT) AS supp,
        |    CAST(o_custkey AS BIGINT) AS cust, l_orderkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |pc AS (
        |  SELECT supp, cust,
        |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS cnt
        |  FROM li GROUP BY 1, 2),
        |e0 AS (
        |  SELECT supp + 10000000 AS src, cust + 20000000 AS dst,
        |    1000000 // cnt AS w
        |  FROM pc
        |  UNION ALL
        |  SELECT cust + 20000000, supp + 10000000, 1000000 // cnt
        |  FROM pc),
        |e AS (SELECT src, dst, min(w) AS w FROM e0 GROUP BY 1, 2),
        |d0 AS (
        |  SELECT CAST(s_suppkey AS BIGINT) + 10000000 AS node,
        |    CAST(0 AS BIGINT) AS d
        |  FROM supplier WHERE s_nationkey = 0
        |    AND CAST(s_suppkey AS BIGINT) + 10000000 IN
        |      (SELECT src FROM e UNION SELECT dst FROM e)),
        |d1 AS (
        |  SELECT node, min(d) AS d FROM (
        |    SELECT node, d FROM d0
        |    UNION ALL
        |    SELECT e.dst, d0.d + e.w FROM d0 JOIN e ON d0.node = e.src
        |  ) GROUP BY 1),
        |d2 AS (
        |  SELECT node, min(d) AS d FROM (
        |    SELECT node, d FROM d1
        |    UNION ALL
        |    SELECT e.dst, d1.d + e.w FROM d1 JOIN e ON d1.node = e.src
        |  ) GROUP BY 1),
        |d3 AS (
        |  SELECT node, min(d) AS d FROM (
        |    SELECT node, d FROM d2
        |    UNION ALL
        |    SELECT e.dst, d2.d + e.w FROM d2 JOIN e ON d2.node = e.src
        |  ) GROUP BY 1)
        |SELECT CAST(node AS BIGINT) AS node, CAST(d AS BIGINT) AS dist
        |FROM d3""".stripMargin,

    "q152_rollup_report" ->
      """WITH v AS (
        |  SELECT r_name, n_name,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey)
        |SELECT coalesce(r_name, '(all)') AS r_name,
        |  coalesce(n_name, '(all)') AS n_name,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS total
        |FROM v GROUP BY ROLLUP (r_name, n_name)""".stripMargin,

    "q153_snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    CAST(o_orderdate AS VARCHAR) AS odate, o_orderpriority
        |  FROM orders),
        |old AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    cents + CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END
        |      AS cents,
        |    odate, o_orderpriority
        |  FROM base WHERE o_orderkey % 100 <> 0),
        |new AS (SELECT * FROM base WHERE o_orderkey % 101 <> 0),
        |fo AS (
        |  SELECT o_orderkey, md5(concat(
        |    'cents=', CAST(cents AS VARCHAR), chr(1),
        |    'o_custkey=', CAST(o_custkey AS VARCHAR), chr(1),
        |    'o_orderpriority=', o_orderpriority, chr(1),
        |    'o_orderstatus=', o_orderstatus, chr(1),
        |    'odate=', odate)) AS fp_old
        |  FROM old),
        |fn AS (
        |  SELECT o_orderkey, md5(concat(
        |    'cents=', CAST(cents AS VARCHAR), chr(1),
        |    'o_custkey=', CAST(o_custkey AS VARCHAR), chr(1),
        |    'o_orderpriority=', o_orderpriority, chr(1),
        |    'o_orderstatus=', o_orderstatus, chr(1),
        |    'odate=', odate)) AS fp_new
        |  FROM new)
        |SELECT coalesce(fo.o_orderkey, fn.o_orderkey) AS o_orderkey,
        |  CASE WHEN fp_old IS NULL THEN 'added'
        |       WHEN fp_new IS NULL THEN 'removed'
        |       WHEN fp_old = fp_new THEN 'same'
        |       ELSE 'changed' END AS verdict,
        |  fp_old, fp_new
        |FROM fo FULL OUTER JOIN fn ON fo.o_orderkey = fn.o_orderkey
        |""".stripMargin,

    "q145_bfs_hops" ->
      """WITH RECURSIVE
        |li AS (
        |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS supp,
        |    CAST(o_custkey AS BIGINT) AS cust
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (
        |  SELECT supp + 10000000 AS src, cust + 20000000 AS dst FROM li
        |  UNION ALL
        |  SELECT cust + 20000000, supp + 10000000 FROM li),
        |seeds AS (
        |  SELECT CAST(s_suppkey AS BIGINT) + 10000000 AS node
        |  FROM supplier WHERE s_nationkey = 0),
        |walk AS (
        |  SELECT node, 0 AS hops FROM seeds
        |  WHERE node IN (SELECT src FROM e UNION SELECT dst FROM e)
        |  UNION
        |  SELECT e.dst, walk.hops + 1
        |  FROM walk JOIN e ON walk.node = e.src
        |  WHERE walk.hops < 3
        |)
        |SELECT CAST(node AS BIGINT) AS node,
        |  CAST(min(hops) AS BIGINT) AS hops
        |FROM walk GROUP BY node""".stripMargin
  )
}
