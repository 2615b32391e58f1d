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
  * Exactly-once: commit markers are written INSIDE the delta directory
  * and published by the same atomic rename as the data, so a crash
  * between write and publish replays cleanly (an additive merge cannot
  * self-correct a double-apply the way a checksum merge can). Marker
  * ids are micro-batch ids, which are only meaningful within one
  * checkpoint lineage — `ingest` records the checkpoint identity in
  * the state and refuses to resume under a different one (silently
  * reusing old markers would drop new batches; remerging would double
  * count).
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
  private val endExclStr =
    java.time.LocalDate.parse(endInclusive).plusDays(1).toString

  /** A batch of feature intervals → its delta-aggregate contribution. */
  private[streaming] def deltaOf(batch: DataFrame): DataFrame = {
    val sc = stratCols.map(col)
    val featC = if (countAgg) lit(1L) else col(feature).cast("long")
    Intervals.clamp(
        batch.filter(Intervals.overlapsPeriod(startD, endD)),
        start, endExclStr)
      .select(sc :+ explode(array(
        struct(col(Intervals.ValidFrom).as("date"),
          featC.as("add"), lit(0L).as("remove")),
        struct(col(Intervals.ValidUntil).as("date"),
          lit(0L).as("add"), featC.as("remove")))).as("__d"): _*)
      .groupBy((sc :+ col("__d.date").as("date")): _*)
      .agg(sum(col("__d.add")).as("n_add"),
        sum(col("__d.remove")).as("n_remove"))
  }

  private def markerName(batchId: Long) = s"_committed_$batchId"

  private def committedMarkers(): Seq[String] =
    if (fs.exists(new Path(deltaPath)))
      fs.listStatus(new Path(deltaPath)).map(_.getPath.getName)
        .filter(_.startsWith("_committed_")).toSeq
    else Seq.empty

  /** Merge one batch into the materialized delta table; idempotent per
    * `batchId`. Single-writer per statePath within the JVM (same
    * read-modify-write clobbering FeatureStore.withTableLock guards
    * against); cross-process streams must not share a statePath. */
  def commitBatch(batch: DataFrame, batchId: Long): Unit =
    SeriesStream.withStateLock(statePath) {
      val markers = committedMarkers()
      if (!markers.contains(markerName(batchId))) {
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
      // markers travel with the data through ONE rename: either the new
      // delta AND its marker are visible, or neither — no crash window
      // in which the data is committed but the batch looks unapplied
      (markers :+ markerName(batchId)).foreach { m =>
        fs.create(new Path(tmp, m), true).close()
      }
      val dst = new Path(deltaPath)
      if (fs.exists(dst)) fs.delete(dst, true)
      fs.rename(tmp, dst)
      }
    }

  /** Continuous ingest: one delta merge per micro-batch. Refuses to
    * resume existing state under a different checkpoint lineage (batch
    * ids would restart at 0: old markers would silently drop the new
    * batches, and clearing them would double-merge — reset statePath
    * together with the checkpoint, or keep both). */
  def ingest(rows: DataFrame, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val epoch = new Path(s"$statePath/_epoch")
    val id = java.util.UUID.nameUUIDFromBytes(
      checkpointDir.getBytes("UTF-8")).toString
    if (fs.exists(epoch)) {
      val in = fs.open(epoch)
      val prev =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      require(prev == id,
        s"state at $statePath was built under a different checkpoint " +
          "lineage; reset the state together with the checkpoint")
    } else {
      fs.mkdirs(new Path(statePath))
      val out = fs.create(epoch, true)
      out.write(id.getBytes("UTF-8")); out.close()
    }
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], bid: Long) =>
        if (!batch.isEmpty) commitBatch(batch, bid)
      }
      .start()
  }

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

object SeriesStream {
  private val locks = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.locks.ReentrantLock]

  private def withStateLock[T](statePath: String)(body: => T): T = {
    val l = locks.getOrElseUpdate(statePath,
      new java.util.concurrent.locks.ReentrantLock)
    l.lock()
    try body finally l.unlock()
  }
}
