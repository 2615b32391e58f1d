package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval: combine per-query rankings from
  * heterogeneous retrievers (BM25 lexical, dense-vector ANN, …) with
  * reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
  * the standard score-free fusion that needs NO calibration between
  * retriever score scales because only ranks enter.
  *
  * Reference analogue: none (beyond-reference retrieval capability,
  * composing the engine's existing BM25 and ANN operators).
  *
  * Exactness: RRF contributions are INTEGER fixed-point —
  * `Scale div (k + rank)` — so fused scores are exact sums, ordering
  * is engine-deterministic (ties broken by doc id), and the fusion is
  * oracle-checkable whenever the input rankings are.
  *
  * Scale: each retriever already emits a top-k per query, so the
  * fusion input is (queries × sources × k) rows — bounded by
  * construction, never corpus-sized. One (query, doc) partial-agg
  * shuffle, then a rank window whose partitions hold ≤ sources·k rows.
  */
object Fusion {

  /** Fixed-point numerator: contribution of rank r is
    * `Scale div (k + r)` — integer-exact on both engines. */
  val Scale = 1000000000L

  /** Fuse rankings, each shaped (queryCol, docCol, rankCol) with
    * 1-based integer ranks. Output per query: top `topK` docs by
    * (rrf_fp DESC, doc) with columns (queryCol, rank, docCol, rrf_fp,
    * n_sources). A doc absent from one source simply gets no
    * contribution from it (standard RRF). */
  def rrfFuse(rankings: Seq[DataFrame], queryCol: String, docCol: String,
              rankCol: String, topK: Int, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val contrib = rankings.map(_.select(
      col(queryCol), col(docCol),
      expr(s"${Scale}L div (${kRrf}L + cast($rankCol as long))")
        .as("__c")))
    val fused = contrib.reduce(_.unionByName(_))
      .groupBy(col(queryCol), col(docCol))
      .agg(sum(col("__c")).as("rrf_fp"), count(lit(1)).as("n_sources"))
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col("rrf_fp").desc, col(docCol))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(queryCol), col("rank"), col(docCol), col("rrf_fp"),
        col("n_sources"))
  }

  /** Hybrid lexical+dense retrieval: BM25 over `text`/`textCol` fused
    * with exact cosine top-k over `emb`/`embCol`, RRF-combined. The
    * two retrievers run on their own tables (ids must agree);
    * `queries` supplies (query_id, query_text) for BM25 and
    * `queryPred` selects the matching query rows in `emb` for the
    * dense side. Per-retriever depth `kEach` defaults to 4× the fused
    * `topK` (fusion can promote a doc ranked deep in one list). */
  def hybridTopK(text: DataFrame, idCol: String, textCol: String,
                 emb: DataFrame, embIdCol: String, embCol: String,
                 queries: Seq[(Long, String)], queryPred: Column,
                 topK: Int, kEach: Int = 0, kRrf: Int = 60): DataFrame = {
    val depth = if (kEach > 0) kEach else topK * 4
    val lexical = TextIndex.bm25TopK(text, idCol, textCol, queries, depth)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val dense = Similarity.topK(emb, embIdCol, embCol, queryPred, depth)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    rrfFuse(Seq(lexical, dense), "query_id", "doc_id", "rank", topK, kRrf)
  }
}
