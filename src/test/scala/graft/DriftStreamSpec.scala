package graft

import org.apache.spark.sql.functions._

import graft.streaming.DriftStream
import graft.streaming.DriftStream.DayEvent

/** Cross-batch parity of the streaming drift twins with their batch
  * operators under OUT-OF-ORDER delivery (late events within the
  * watermark horizon must land in their not-yet-closed day). */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int) = new java.sql.Timestamp(
    day * 86400000L + hour * 3600000L)

  // group a: days 0..7 with varying counts (ref = first 3 days);
  // group b: only 2 days — reference never completes, no emissions
  private val rows: Seq[(String, java.sql.Timestamp)] =
    Seq.tabulate(8) { d => ("a", d, 1 + (d * 3) % 5) }
      .flatMap { case (g, d, n) =>
        (0 until n).map(i => (g, ts(d, 1 + i)))
      } ++ Seq(("b", ts(0, 4)), ("b", ts(1, 4)))

  // deliver in three day-banded batches, each shuffled internally,
  // with one genuinely LATE (but inside the 2-day horizon) event held
  // back into the next batch; sentinel far ahead closes everything
  private def drive[O](makeQuery: org.apache.spark.sql.Dataset[DayEvent] =>
      org.apache.spark.sql.Dataset[O], sink: String): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[DayEvent]
    val q = makeQuery(ms.toDS()).writeStream.format("memory")
      .queryName(sink).outputMode("append").start()
    try {
      val rnd = new scala.util.Random(7)
      def dayOf(t: java.sql.Timestamp): Long = t.getTime / 86400000L
      val evs = rows.map { case (g, t) => DayEvent(g, t) }
      val lateD1 = evs.find(e => e.group == "a" && dayOf(e.ts) == 1).get
      val lateD5 = evs.find(e => e.group == "a" && dayOf(e.ts) == 5).get
      val b1 = rnd.shuffle(evs.filter(e =>
        dayOf(e.ts) <= 2 && e != lateD1))
      val b2 = rnd.shuffle(evs.filter(e =>
        dayOf(e.ts) >= 3 && dayOf(e.ts) <= 5 && e != lateD5) :+ lateD1)
      val b3 = rnd.shuffle(evs.filter(e =>
        dayOf(e.ts) >= 6) :+ lateD5)
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
      ms.addData(b3: _*); q.processAllAvailable()
      ms.addData(DayEvent("a", ts(40, 0)), DayEvent("b", ts(40, 0)))
      q.processAllAvailable()
    } finally q.stop()
  }

  test("cusumStream matches Rolling.cusum on out-of-order delivery") {
    drive(ds => DriftStream.cusumStream(ds, watermark = "2 days",
      refDays = 3), "cusumstream")
    val got = spark.table("cusumstream")
      .as[DriftStream.CusumOut].collect()
      .map(o => (o.group, o.day, o.n, o.s_up, o.s_dn)).toSet
    val batch = graft.operators.Rolling.cusum(
        rows.toDF("g", "ts"), "g", "ts", refDays = 3)
      .select(col("g"),
        datediff(col("date"), lit("1970-01-01")).cast("long"),
        col("n"), col("s_up"), col("s_dn"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == batch)
    assert(got.nonEmpty && !got.exists(_._1 == "b")) // ref incomplete
    assert(!got.exists(_._2 == 40L)) // open sentinel day never emitted
  }

  test("seasonalStream is prefix-parity with Rolling.seasonalProfile") {
    drive(ds => DriftStream.seasonalStream(ds, watermark = "2 days"),
      "seasonalstream")
    val got = spark.table("seasonalstream")
      .as[DriftStream.SeasonalOut].collect()
    assert(got.nonEmpty)
    // PREQUENTIAL contract: each emitted day matches the batch
    // operator run over the closed prefix (days <= that day)
    got.foreach { o =>
      val prefix = rows.filter { case (g, t) =>
        g == o.group && t.getTime < (o.day + 1) * 86400000L }
      val b = graft.operators.Rolling.seasonalProfile(
          prefix.toDF("g", "ts"), "g", "ts")
        .filter(datediff(col("date"), lit("1970-01-01")) === o.day)
        .select(col("isodow").cast("int"), col("n"),
          col("expected_fp"), col("residual_fp"))
        .as[(Int, Long, Long, Long)].head()
      assert(b === ((o.isodow, o.n, o.expected_fp, o.residual_fp)),
        s"day ${o.day} of ${o.group}")
    }
    // and the final weekday cells equal the full-batch baseline over
    // every closed day (day 40 sentinel stays open)
    val closedRows = rows
    val batchBase = graft.operators.Rolling.seasonalProfile(
        closedRows.toDF("g", "ts"), "g", "ts")
      .groupBy(col("g"), col("isodow"))
      .agg(max(col("expected_fp")).as("e"))
      .as[(String, Int, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val lastPerDow = got.groupBy(o => (o.group, o.isodow))
      .map { case (k, os) => k -> os.maxBy(_.day).expected_fp }
    lastPerDow.foreach { case (k, e) =>
      assert(batchBase(k) === e, s"final baseline cell $k")
    }
  }

  test("holtStream matches Rolling.holtDaily on out-of-order delivery") {
    drive(ds => DriftStream.holtStream(ds, watermark = "2 days"),
      "holtstream")
    val got = spark.table("holtstream")
      .as[DriftStream.HoltOut].collect()
      .map(o => (o.group, o.day, o.n, o.level_scaled, o.trend_scaled,
        o.forecast_scaled)).toSet
    val batch = graft.operators.Rolling.holtDaily(
        rows.toDF("g", "ts"), "g", "ts")
      .select(col("g"),
        datediff(col("date"), lit("1970-01-01")).cast("long"),
        col("n"), col("level_scaled"), col("trend_scaled"),
        col("forecast_scaled"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == batch)
    assert(got.nonEmpty && !got.exists(_._2 == 40L))
  }
}
