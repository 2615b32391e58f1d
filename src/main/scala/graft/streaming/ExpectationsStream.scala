package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Expectations

/** Streaming twin of [[Expectations.validate]]'s scalar checks: every
  * micro-batch runs the same one-scan conditional-sum aggregate over
  * the batch and appends its per-rule (violations, total) row set to
  * an append-only report table; [[report]] folds the partials into
  * cumulative per-rule counts at read time. Scalar-rule counts are
  * pure sums, so the cumulative report over batches 0..i equals the
  * batch validator over the union of those batches —
  * ExpectationsStreamSpec proves that law per batch boundary.
  * (Uniqueness/referential rules are NOT incremental sums — run them
  * in the periodic batch reconciliation instead.)
  *
  * Replay safety: rows commit through [[Commits.appendIfAbsent]]
  * keyed on (batch_id, rule), so foreachBatch's at-least-once
  * redelivery appends nothing the second time.
  *
  * Scale: per batch, one aggregate over the batch (N rules, one
  * pass); the report table grows by |rules| rows per batch — metadata
  * -sized — and the read-side fold is a partial agg over it. */
object ExpectationsStream {

  def commitBatch(batch: DataFrame, checks: Seq[Expectations.Check],
                  reportPath: String, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val rep = Expectations.validate(batch, checks)
      .withColumn("batch_id", lit(batchId))
      .withColumn("__key",
        concat_ws("|", col("batch_id"), col("rule")))
    Commits.appendIfAbsent(rep, reportPath, "__key")
  }

  /** Cumulative per-rule report over everything committed so far. */
  def report(spark: SparkSession, reportPath: String): DataFrame =
    spark.read.parquet(reportPath)
      .groupBy(col("rule"))
      .agg(sum(col("violations")).as("violations"),
        sum(col("total")).as("total"))

  /** Drive [[commitBatch]] from a stream. */
  def run(rows: DataFrame, checks: Seq[Expectations.Check],
          reportPath: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        commitBatch(batch, checks, reportPath, id)
      }
      .start()
}
