package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Scd2
import graft.streaming.Scd2Stream

/** Streaming SCD2 maintenance: event-sourced snapshot merges must
  * reproduce the batch updateSnapshot fold exactly — lifecycle rows,
  * multiset occurrence pairing, and time travel — and stay idempotent
  * under foreachBatch replay. */
class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  private val DataCols = Seq("id", "val")

  private val snap1 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (3L, "c"))
  private val snap2 = Seq((1L, "a"), (2L, "B"), (3L, "c"))
  private val snap3 = Seq((1L, "a"), (2L, "B"), (4L, "d"))
  private val ts = Seq("2024-01-01 00:00:00", "2024-01-02 00:00:00",
    "2024-01-03 00:00:00")

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF(DataCols: _*)

  private def rowsOf(t: DataFrame): Seq[(Long, String, String, Option[String])] =
    t.select(col("id"), col("val"), col(Scd2.FromTs), col(Scd2.UntilTs))
      .as[(Long, String, String, Option[String])].collect().toSeq.sorted

  private def batchFold(): DataFrame =
    Seq(snap2, snap3).zip(ts.tail).foldLeft(
      Scd2.updateSnapshot(None, df(snap1), ts.head, DataCols)) {
      case (cur, (snap, t)) =>
        Scd2.updateSnapshot(Some(cur), df(snap), t, DataCols)
    }

  test("commitBatch fold reproduces updateSnapshot exactly") {
    val dir = java.nio.file.Files
      .createTempDirectory("scd2stream").toString
    Seq(snap1, snap2, snap3).zip(ts).foreach { case (snap, t) =>
      Scd2Stream.commitBatch(df(snap), dir, t, DataCols)
    }
    val got = Scd2Stream.table(spark, dir)
    assert(rowsOf(got) == rowsOf(batchFold()))
    // time travel parity at every transaction time
    for (t <- ts) {
      val g = Scd2.sliceAt(got, t).select("id", "val")
        .as[(Long, String)].collect().toSeq.sorted
      val w = Scd2.sliceAt(batchFold(), t).select("id", "val")
        .as[(Long, String)].collect().toSeq.sorted
      assert(g == w, s"slice at $t")
    }
    // the duplicate (3, c) pairs as TWO versions, one closed at t2
    val dups = rowsOf(got).filter(r => r._1 == 3L)
    assert(dups.size == 2)
    assert(dups.count(_._4.contains(ts(1))) == 1)
  }

  test("commitBatch replay is a no-op (at-least-once contract)") {
    val dir = java.nio.file.Files
      .createTempDirectory("scd2replay").toString
    Scd2Stream.commitBatch(df(snap1), dir, ts.head, DataCols)
    Scd2Stream.commitBatch(df(snap2), dir, ts(1), DataCols)
    val before = rowsOf(Scd2Stream.table(spark, dir))
    Scd2Stream.commitBatch(df(snap2), dir, ts(1), DataCols) // replay
    assert(rowsOf(Scd2Stream.table(spark, dir)) == before)
    // and a replay at a LATER ts with identical data churns nothing
    Scd2Stream.commitBatch(df(snap2), dir, ts(2), DataCols)
    assert(rowsOf(Scd2Stream.table(spark, dir)) == before)
  }

  test("run() maintains the table from a snapshot stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("scd2run").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("scd2ckpt").toString
    val ms = MemoryStream[Scd2StreamSpec.Snap]
    val q = Scd2Stream.run(ms.toDS().toDF(DataCols: _*), dir, DataCols,
      tsOf = id => f"2024-02-${id + 1}%02d 00:00:00",
      checkpointDir = ckpt)
    try {
      ms.addData(snap1.map { case (i, v) =>
        Scd2StreamSpec.Snap(i, v) }: _*)
      q.processAllAvailable()
      ms.addData(snap3.map { case (i, v) =>
        Scd2StreamSpec.Snap(i, v) }: _*)
      q.processAllAvailable()
    } finally q.stop()
    val want = Scd2.updateSnapshot(
      Some(Scd2.updateSnapshot(None, df(snap1),
        "2024-02-01 00:00:00", DataCols)),
      df(snap3), "2024-02-02 00:00:00", DataCols)
    assert(rowsOf(Scd2Stream.table(spark, dir)) == rowsOf(want))
  }
}

object Scd2StreamSpec {
  case class Snap(id: Long, value: String)
}
