package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.{Aggregators, Intervals, KeyJoinFeatures}
import graft.streaming.SeriesStream

/** Incremental series maintenance: the streamed delta-merge series must
  * equal the batch KeyJoinFeatures over the union of all batches. */
class SeriesStreamSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private val batch1 = Seq(
    (10L, "A", d("2024-01-02"), Option(d("2024-01-05"))),
    (11L, "B", d("2024-01-03"), Option(d("2024-01-10"))),
    (12L, "A", d("2024-01-01"), None: Option[java.sql.Date]))
  private val batch2 = Seq(
    (13L, "A", d("2024-01-04"), Option(d("2024-01-06"))),
    (14L, "B", d("2023-12-20"), Option(d("2024-01-03"))), // clamps in
    (15L, "B", d("2024-02-09"), Option(d("2024-02-20")))) // clamps out

  private def toDf(rows: Seq[(Long, String, java.sql.Date, Option[java.sql.Date])]) =
    rows.toDF("key_id", "grp", "valid_from", "valid_until")

  test("streamed delta merge equals batch pipeline; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val state = Files.createTempDirectory("graft-series").toString
    val ss = new SeriesStream(spark, state, feature = "key_id",
      stratCols = Seq("grp"), start = "2024-01-01",
      endInclusive = "2024-01-31")
    val ms = MemoryStream[(Long, String, java.sql.Date, java.sql.Date)]
    val q = ss.ingest(ms.toDF().toDF("key_id", "grp", "valid_from",
      "valid_until"), Files.createTempDirectory("graft-series-ckpt").toString)
    try {
      ms.addData(batch1.map(r => (r._1, r._2, r._3, r._4.orNull)): _*)
      q.processAllAvailable()
      ms.addData(batch2.map(r => (r._1, r._2, r._3, r._4.orNull)): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = ss.series("n_active")
      .select(col("date").cast("string"), col("grp"), col("n_active"))
      .as[(String, String, Long)].collect().toSet

    val batchRes = KeyJoinFeatures(
      observable = toDf(batch1 ++ batch2),
      observableName = "n_active", feature = "key_id",
      agg = Aggregators.Count,
      stratifications = Seq.empty, stratCols = Seq.empty,
      start = "2024-01-01", endInclusive = "2024-01-31")
    // KeyJoinFeatures without strat tables can't stratify by grp (it
    // lives on the observable) — use the expression form
    val batchStrat = KeyJoinFeatures.withExprs(
      observable = Intervals.slice(toDf(batch1 ++ batch2),
        "2024-01-01", "2024-01-31"),
      observableName = "n_active", feature = "key_id",
      agg = Aggregators.Count,
      stratifications = Seq.empty, stratExprs = Seq("grp" -> col("grp")),
      start = "2024-01-01", endInclusive = "2024-01-31")
      .select(col("date").cast("string"), col("grp"), col("n_active"))
      .as[(String, String, Long)].collect().toSet
    assert(streamed == batchStrat && streamed.nonEmpty)

    // replaying an already-committed batch id changes nothing
    val before = streamed
    ss.commitBatch(toDf(batch2), batchId = 1L)
    val after = ss.series("n_active")
      .select(col("date").cast("string"), col("grp"), col("n_active"))
      .as[(String, String, Long)].collect().toSet
    assert(after == before)
    assert(batchRes.count() > 0)
  }

  test("resuming state under a different checkpoint lineage is refused") {
    implicit val sqlCtx = spark.sqlContext
    val state = Files.createTempDirectory("graft-series3").toString
    val ss = new SeriesStream(spark, state, feature = "key_id",
      stratCols = Seq.empty, start = "2024-01-01",
      endInclusive = "2024-01-31")
    val ms = MemoryStream[(Long, String, java.sql.Date, java.sql.Date)]
    val rows = ms.toDF().toDF("key_id", "grp", "valid_from", "valid_until")
    val q = ss.ingest(rows,
      Files.createTempDirectory("graft-series3-ckptA").toString)
    q.stop()
    val err = intercept[IllegalArgumentException] {
      ss.ingest(rows,
        Files.createTempDirectory("graft-series3-ckptB").toString)
    }
    assert(err.getMessage.contains("checkpoint lineage"))
  }

  test("crash mid-swap recovers: previous state restored, replay applies") {
    val state = Files.createTempDirectory("graft-series4").toString
    val ss = new SeriesStream(spark, state, feature = "key_id",
      stratCols = Seq.empty, start = "2024-01-01",
      endInclusive = "2024-01-31")
    ss.commitBatch(toDf(batch1), 0L)
    val good = ss.series("n_active")
      .select(col("date").cast("string"), col("n_active"))
      .as[(String, Long)].collect().toSet
    // simulate a crash between the two publish renames: dst moved away,
    // new state never landed
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$state/delta"),
      new org.apache.hadoop.fs.Path(s"$state/delta.prev"))
    // series() rolls back to the previous state instead of failing
    val recovered = ss.series("n_active")
      .select(col("date").cast("string"), col("n_active"))
      .as[(String, Long)].collect().toSet
    assert(recovered == good)
    // and the next batch applies on the recovered state
    ss.commitBatch(toDf(batch2), 1L)
    val after = ss.series("n_active")
      .select(col("date").cast("string"), col("n_active"))
      .as[(String, Long)].collect().toSet
    assert(after != good)
  }

  test("unstratified series matches and stays grid-sized") {
    val state = Files.createTempDirectory("graft-series2").toString
    val ss = new SeriesStream(spark, state, feature = "key_id",
      stratCols = Seq.empty, start = "2024-01-01",
      endInclusive = "2024-01-31")
    ss.commitBatch(toDf(batch1), 0L)
    ss.commitBatch(toDf(batch2), 1L)
    val streamed = ss.series("n_active")
      .select(col("date").cast("string"), col("n_active"))
      .as[(String, Long)].collect().toSet
    val batch = KeyJoinFeatures(
      observable = Intervals.slice(toDf(batch1 ++ batch2),
        "2024-01-01", "2024-01-31"),
      observableName = "n_active", feature = "key_id",
      agg = Aggregators.Count,
      stratifications = Seq.empty, stratCols = Seq.empty,
      start = "2024-01-01", endInclusive = "2024-01-31")
      .select(col("date").cast("string"), col("n_active"))
      .as[(String, Long)].collect().toSet
    assert(streamed == batch)
    // the materialized state is delta rows ≤ dates × strata, not raw rows
    val stateRows = spark.read.parquet(s"$state/delta").count()
    assert(stateRows <= 31)
  }
}
