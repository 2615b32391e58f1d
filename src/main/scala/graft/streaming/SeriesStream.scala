package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Intervals

/** Incrementally-maintained prevalence/incidence series under
  * continuous ingest — the streaming twin of `KeyJoinFeatures` for the
  * ADDITIVE aggregators (count/sum; min/max are not delta-mergeable).
  *
  * The insight that makes this cheap: the series is a prefix sum over
  * the per-(date, strata) DELTA AGGREGATE (+n at `valid_from`, −n at
  * `valid_until`), and that aggregate is mergeable — a new batch of
  * feature intervals contributes its own tiny delta frame, merged by
  * per-group addition. So the materialized state is the delta table
  * (one row per date × strata — grid-sized, independent of raw data
  * volume), and `series()` rebuilds the cumsum from it in one
  * grid-sized window pass. 100 TB of history compresses to a
  * date×strata grid; each micro-batch costs one scan of ITSELF plus a
  * grid-sized merge.
  *
  * Batch-id markers make the merge idempotent under foreachBatch
  * replay (the additive merge itself is not).
  *
  * The incoming rows must already carry the stratification columns
  * (pre-joined); streaming truncate-interlace of separate strat feeds
  * is out of scope.
  */
class SeriesStream(
    spark: SparkSession,
    statePath: String,
    feature: String,
    stratCols: Seq[String],
    start: String,
    endInclusive: String,
    countAgg: Boolean = true) {

  private val deltaPath = s"$statePath/delta"
  private def fs = new Path(statePath)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val startD = to_date(lit(start))
  private val endD = to_date(lit(endInclusive))
  private val endExcl = date_add(endD, 1)

  /** A batch of feature intervals → its delta-aggregate contribution. */
  private[streaming] def deltaOf(batch: DataFrame): DataFrame = {
    val sc = stratCols.map(col)
    val featC = if (countAgg) lit(1L) else col(feature).cast("long")
    batch
      .filter(Intervals.overlapsPeriod(startD, endD))
      .withColumn(Intervals.ValidFrom,
        greatest(col(Intervals.ValidFrom), startD))
      .withColumn(Intervals.ValidUntil,
        least(coalesce(col(Intervals.ValidUntil), endExcl), endExcl))
      .select(sc :+ explode(array(
        struct(col(Intervals.ValidFrom).as("date"),
          featC.as("add"), lit(0L).as("remove")),
        struct(col(Intervals.ValidUntil).as("date"),
          lit(0L).as("add"), featC.as("remove")))).as("__d"): _*)
      .groupBy((sc :+ col("__d.date").as("date")): _*)
      .agg(sum(col("__d.add")).as("n_add"),
        sum(col("__d.remove")).as("n_remove"))
  }

  /** Merge one batch into the materialized delta table; idempotent per
    * `batchId` (replays are skipped via commit markers). */
  def commitBatch(batch: DataFrame, batchId: Long): Unit = {
    val marker = new Path(s"$statePath/_committed_$batchId")
    if (fs.exists(marker)) return
    val incoming = deltaOf(batch)
    val merged =
      if (fs.exists(new Path(deltaPath)))
        spark.read.parquet(deltaPath)
          .unionByName(incoming)
          .groupBy((stratCols.map(col) :+ col("date")): _*)
          .agg(sum(col("n_add")).as("n_add"),
            sum(col("n_remove")).as("n_remove"))
      else incoming
    val tmp = new Path(s"$deltaPath.tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    val dst = new Path(deltaPath)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(tmp, dst)
    fs.create(marker, true).close()
  }

  /** Continuous ingest: one delta merge per micro-batch. */
  def ingest(rows: DataFrame, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty) commitBatch(batch, id)
      }
      .start()

  /** The current series: date grid × strata, prefix sum over the
    * materialized delta — grid-sized work, no raw-data access. */
  def series(observableName: String): DataFrame = {
    val sc = stratCols.map(col)
    val delta = spark.read.parquet(deltaPath)
    val dates = spark.range(1).select(
      explode(sequence(startD, endD)).as("date"))
    val grid =
      if (stratCols.isEmpty) dates
      else delta.select(sc: _*).distinct().crossJoin(dates)
    val deltaR = ("date" +: stratCols).foldLeft(delta) { (d, c) =>
      d.withColumnRenamed(c, s"__d_$c")
    }
    val joinCond = (col("date") === col("__d_date")) +:
      stratCols.map(c => col(c) <=> col(s"__d_$c"))
    val joined = grid.join(deltaR, joinCond.reduce(_ && _), "left")
      .select((col("date") +: sc) ++ Seq(
        coalesce(col("n_add"), lit(0L)).as("n_add"),
        coalesce(col("n_remove"), lit(0L)).as("n_remove")): _*)
    val w = Window.partitionBy(stratCols.map(joined(_)): _*)
      .orderBy(joined("date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn(observableName,
        sum(col("n_add")).over(w) - sum(col("n_remove")).over(w))
      .select((col("date") +: sc) :+ col(observableName): _*)
  }
}
