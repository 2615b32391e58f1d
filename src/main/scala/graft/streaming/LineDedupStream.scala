package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming twin of [[Dedup.dedupLines]] (CCNet-style boilerplate
  * removal) with PREFIX-EXACT semantics: each micro-batch is cleaned
  * with the line document-frequencies of everything seen UP TO AND
  * INCLUDING that batch — i.e. batch `i`'s output rows are exactly
  * what batch `dedupLines` over batches `0..i` emits for those ids
  * (LineDedupStreamSpec proves the law per batch boundary). A line
  * only a FUTURE document will reveal as boilerplate survives in
  * already-emitted docs — that is the price of streaming; re-running
  * the batch operator over the accumulated corpus reconciles.
  *
  * State is the line-frequency INDEX on disk: append-only
  * (line_hash, n_docs, batch_id) partial counts, summed at read time
  * — no per-batch rewrite of a corpus-sized table. Replayed batches
  * are detected by their `batch_id` marker rows and skip the append,
  * so at-least-once delivery never double-counts (and the cleaned
  * output appends through a doc_id anti-join, the
  * [[CurationStream.commitBatch]] idempotence pattern).
  *
  * Scale: per batch, |batch| line hashes shuffle for the distinct +
  * count; the index read is a column-pruned scan aggregated by an
  * 8-byte key (partial-agg shuffle); document text never leaves the
  * batch except for its one cleaned append.
  */
object LineDedupStream {

  /** One commit: fold `batch`'s line frequencies into the index
    * (skipped on replay), then emit the batch cleaned against the
    * updated totals. */
  def commitBatch(batch: DataFrame, indexPath: String, outPath: String,
                  minDocs: Int, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val docs = batch
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .localCheckpoint(true)
    if (docs.isEmpty) return

    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val indexExists = fs.exists(p)
    val replayed = indexExists && !spark.read.parquet(indexPath)
      .filter(col("batch_id") === batchId).isEmpty
    if (!replayed) {
      // a line counts once per doc, summed at read time across batches
      Dedup.lineHashes(docs, "doc_id", "text")
        .select(col("doc_id"), col("__h")).distinct()
        .groupBy(col("__h")).agg(count(lit(1)).as("n_docs"))
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(indexPath)
    }

    val boiler = spark.read.parquet(indexPath)
      .groupBy(col("__h")).agg(sum(col("n_docs")).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(col("__h").as("__bh"))
    val cleaned = Dedup.removeLinesByHash(docs, "doc_id", "text", boiler)
    val outP = new org.apache.hadoop.fs.Path(outPath)
    val fresh =
      if (!fs.exists(outP)) cleaned
      else cleaned.join(
        spark.read.parquet(outPath).select("doc_id"),
        Seq("doc_id"), "left_anti")
    if (!fresh.isEmpty) fresh.write.mode("append").parquet(outPath)
  }

  /** Drive [[commitBatch]] from a stream of (doc_id, text) rows. */
  def run(docs: DataFrame, indexPath: String, outPath: String,
          checkpointDir: String, minDocs: Int)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        commitBatch(batch, indexPath, outPath, minDocs, id)
      }
      .start()
}
