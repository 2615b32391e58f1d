package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.core.Tables
import graft.streaming.Sessions

/** The driver's testdata has shipped `events.ts` under several parquet
  * encodings over time (INT64 nanos in r1-r5, µs TIMESTAMP_NTZ in r6).
  * Tables.events must normalize all of them to the same session-TZ
  * timestamp so every downstream consumer — incl. TZ-strict functions
  * like unix_micros — behaves identically. This spec round-trips one
  * event sample through all three encodings and asserts identical
  * sessionization output. */
class TablesEncodingSpec extends SparkSpec {
  import spark.implicits._

  private def sessionized(events: DataFrame): Seq[(String, Long, Long, Long, Long)] = {
    val withUs = events.withColumn("ts_us", unix_micros(col("ts")))
    Sessions.aggregate(withUs, "user_id", "ts_us", "event_id", 1800)
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("start_us"), col("end_us"))
      .as[(String, Long, Long, Long, Long)]
      .collect().toSeq.sorted
  }

  test("Tables.events normalizes ns-long, us-NTZ and us-TZ encodings identically") {
    val baseUs = 1700000000000000L // 2023-11-14T22:13:20Z
    val rows = Seq(
      ("u1", 1L, baseUs),
      ("u1", 2L, baseUs + 60L * 1000000),          // same session
      ("u1", 3L, baseUs + 4000L * 1000000),        // gap > 1800s -> new session
      ("u2", 4L, baseUs + 7L * 1000000)
    ).toDF("user_id", "event_id", "ts_us_raw")

    val dir = Files.createTempDirectory("graft-ts-enc").toString

    // INT64 nanoseconds (the legacy nanosAsLong read path)
    rows.select(col("user_id"), col("event_id"),
        (col("ts_us_raw") * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ns/events.parquet")
    // µs TIMESTAMP_NTZ (parquet timestamp[us], isAdjustedToUTC=false)
    rows.select(col("user_id"), col("event_id"),
        timestamp_micros(col("ts_us_raw")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")
    // µs session-TZ timestamp (parquet timestamp[us], isAdjustedToUTC=true)
    rows.select(col("user_id"), col("event_id"),
        timestamp_micros(col("ts_us_raw")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/tz/events.parquet")

    val byEncoding = Seq("ns", "ntz", "tz").map { enc =>
      val df = Tables.events(spark, s"$dir/$enc")
      assert(df.schema("ts").dataType == TimestampType,
        s"$enc: expected normalized TimestampType, got ${df.schema("ts").dataType}")
      enc -> sessionized(df)
    }.toMap

    // Sanity: the raw reads really exercised three distinct source types.
    assert(spark.read.parquet(s"$dir/ns/events.parquet")
      .schema("ts").dataType == LongType)
    assert(spark.read.parquet(s"$dir/ntz/events.parquet")
      .schema("ts").dataType == TimestampNTZType)

    assert(byEncoding("ns") == byEncoding("tz"))
    assert(byEncoding("ntz") == byEncoding("tz"))
    assert(byEncoding("tz").map(_._2).max == 2) // the gap split happened
  }
}
