package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Eval

/** Streaming Poisson-bootstrap — the continuous twin of
  * [[graft.operators.Eval.poissonBootstrap]], riding the estimator's
  * defining property: per-(row, replicate) weights depend only on
  * (id, replicate, seed), so per-(group, replicate) partials from
  * disjoint micro-batches MERGE BY ADDITION and the assembled CI is
  * bitwise the batch answer over everything seen so far.
  *
  * State is the LineDedupStream posture: an append-only parquet index
  * of batch-keyed partial rows, summed at read — no corpus-sized
  * rewrite, and [[Commits.appendIfAbsent]] on the batch key makes a
  * replayed (at-least-once) micro-batch a no-op. [[ci]] is the read
  * view: sum partials, then the batch operator's own assembly
  * (replicate means → exact order-statistic endpoints).
  *
  * Rows must arrive exactly once per observation across batches (ids
  * unique per observation — the batch operator's own contract). */
object BootstrapStream {

  /** Fold one micro-batch's partials into the state at `path`.
    * Exposed for tests/backfills; [[run]] drives it per batch. */
  def commitBatch(batch: DataFrame, path: String, batchId: Long,
                  groupCol: String, idCol: String, valueCol: String,
                  b: Int = 48, seed: String = "boot"): Unit = {
    val parts = Eval.bootPartials(batch, groupCol, idCol,
        col(valueCol), b, seed)
      .withColumn("__bk", concat_ws("#", lit(batchId),
        col(groupCol).cast("string"), col("__rep").cast("string")))
    Commits.appendIfAbsent(parts, s"$path/partials", "__bk")
    val pt = Eval.bootPoint(batch, groupCol, idCol, col(valueCol))
      .withColumn("__bk", concat_ws("#", lit(batchId),
        col(groupCol).cast("string")))
    Commits.appendIfAbsent(pt, s"$path/point", "__bk")
  }

  /** The CI over everything committed so far — bitwise equal to
    * `Eval.poissonBootstrap` on the union of all batches. */
  def ci(spark: SparkSession, path: String, groupCol: String,
         alphaBp: Long = 250, scale: Long = 1000000L): DataFrame = {
    val parts = spark.read.parquet(s"$path/partials")
      .groupBy(col(groupCol), col("__rep"))
      .agg(sum(col("__sw")).as("__sw"), sum(col("__swx")).as("__swx"))
    val pt = spark.read.parquet(s"$path/point")
      .groupBy(col(groupCol))
      .agg(sum(col("n")).as("n"), sum(col("__sx")).as("__sx"))
    Eval.bootCi(parts, pt, groupCol, alphaBp, scale)
  }

  /** Drive [[commitBatch]] from a stream of observations. */
  def run(observations: DataFrame, path: String, groupCol: String,
          idCol: String, valueCol: String, checkpointDir: String,
          b: Int = 48, seed: String = "boot"): StreamingQuery =
    observations.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        commitBatch(batch.toDF(), path, id, groupCol, idCol, valueCol,
          b, seed)
      }
      .start()
}
