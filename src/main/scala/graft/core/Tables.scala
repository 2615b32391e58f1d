package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The driver has shipped events.parquet with several `ts` encodings over
    * time: INT64 nanoseconds (readable only with
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set in our session
    * builders), and µs timestamps without UTC adjustment (Spark reads those
    * as TIMESTAMP_NTZ, which TZ-strict functions like `unix_micros` reject).
    * Normalize `ts` to a session-TZ timestamp (µs precision) whichever way
    * it was stored; sessions are pinned to UTC so the wall-clock values are
    * identical across encodings. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
