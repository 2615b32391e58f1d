package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Eval

/** Streaming split-conformal calibration — the continuous twin of
  * [[graft.operators.Eval.conformal]]: as calibration scores stream
  * in, the threshold `q̂` tracks the growing calibration set, so a
  * deployed predictor's prediction sets stay valid under data that
  * keeps arriving (the online-recalibration deployment loop).
  *
  * The estimator is an ORDER STATISTIC, which merges through value
  * TALLIES: per-(group, score) counts from disjoint micro-batches sum,
  * and the weighted rank walk over summed tallies is exactly the
  * raw-row order statistic. State is the LineDedupStream posture — an
  * append-only parquet index of batch-keyed tally rows, summed at
  * read; [[Commits.appendIfAbsent]] on the batch key makes replays
  * no-ops. [[thresholds]] is the read view and is BITWISE the batch
  * operator over everything seen. */
object ConformalStream {

  /** Fold one micro-batch's score tallies into the state at `path`. */
  def commitBatch(batch: DataFrame, path: String, batchId: Long,
                  groupCol: String, scoreCol: String): Unit = {
    val tal = batch
      .select(col(groupCol), col(scoreCol).cast("long").as("__s"))
      .filter(col("__s").isNotNull)
      .groupBy(col(groupCol), col("__s"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__bk", concat_ws("#", lit(batchId),
        col(groupCol).cast("string"), col("__s").cast("string")))
    Commits.appendIfAbsent(tal, s"$path/tallies", "__bk")
  }

  /** Calibration thresholds + realized coverage over everything
    * committed so far — bitwise `Eval.conformal` on the union. */
  def thresholds(spark: SparkSession, path: String, groupCol: String,
                 alphaBp: Long = 1000): DataFrame =
    Eval.conformalFromTallies(
      spark.read.parquet(s"$path/tallies")
        .groupBy(col(groupCol), col("__s"))
        .agg(sum(col("__c")).as("__c")),
      groupCol, alphaBp)

  /** Drive [[commitBatch]] from a stream of calibration scores. */
  def run(scores: DataFrame, path: String, groupCol: String,
          scoreCol: String, checkpointDir: String): StreamingQuery =
    scores.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        commitBatch(batch.toDF(), path, id, groupCol, scoreCol)
      }
      .start()
}
