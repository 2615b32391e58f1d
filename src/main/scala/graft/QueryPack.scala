package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries: each entry couples the Spark
  * implementation with (optionally) its DuckDB oracle SQL. */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
