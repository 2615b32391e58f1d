package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source ingestion helpers (the reference pulls CSVs from remote buckets
  * via source_conn helpers — R/source_conn_helpers.R; here sources are
  * local/cluster paths in any Spark-supported format).
  */
object Sources {

  /** Schema-enforced CSV read (no runtime inference pass at scale). */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .csv(path)

  /** Write `df` as a bucketed catalog table: rows are hash-partitioned
    * into `numBuckets` files by `keys` and sorted within buckets. Two
    * tables bucketed the same way join WITHOUT a shuffle (the scan
    * itself provides the hash partitioning) — the co-located-join
    * building block for repeated fact-fact joins at warehouse scale.
    * BucketedJoinSpec asserts the shuffle-free plan. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Wide → long unpivot of metric columns (the Ecdc/Google `by-age`
    * pivot_longer ingest shape): keeps `idCols`, melts `metricCols` into
    * (metric, value) rows. */
  def unpivot(df: DataFrame, idCols: Seq[String],
              metricCols: Seq[String]): DataFrame = {
    val arms = metricCols.map(m =>
      s"'$m', cast(`$m` as double)").mkString(", ")
    df.selectExpr(idCols.map(c => s"`$c`") :+
      s"stack(${metricCols.size}, $arms) as (metric, value)": _*)
  }
}
