package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._

/** Query catalog: each SURVEY.md §2 capability exercised on the driver's
  * TPC-H-ish testdata, with DuckDB oracle SQL where expressible.
  *
  * Conventions used to derive bitemporal feature tables from the testdata:
  *  - an order is "active" for 30 days from its order date:
  *    key_cust = o_custkey, valid_from = o_orderdate,
  *    valid_until = o_orderdate + 30 (exclusive)
  *  - a customer's market segment is a slowly-changing attribute:
  *    key_cust = c_custkey, feature mktsegment, open-ended validity.
  */
object Queries {

  /** Orders as interval-valid feature rows (synthetic "episode" table). */
  def orderIntervals(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders").select(
      col("o_custkey").as("key_cust"),
      col("o_orderkey"),
      col("o_totalprice"),
      to_date(col("o_orderdate")).as("valid_from"),
      date_add(to_date(col("o_orderdate")), 30).as("valid_until"))

  val orderIntervalsSql: String =
    """SELECT o_custkey AS key_cust, o_orderkey, o_totalprice,
      |  CAST(o_orderdate AS DATE) AS valid_from,
      |  CAST(o_orderdate AS DATE) + 30 AS valid_until
      |FROM orders""".stripMargin

  /** Customer market segment as an open-ended stratification feature. */
  def segmentFeature(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer").select(
      col("c_custkey").as("key_cust"),
      col("c_mktsegment").as("mktsegment"),
      to_date(lit("1990-01-01")).as("valid_from"),
      lit(null).cast("date").as("valid_until"))

  val segmentFeatureSql: String =
    """SELECT c_custkey AS key_cust, c_mktsegment AS mktsegment,
      |  DATE '1990-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_until
      |FROM customer""".stripMargin

  /** Customer birth dates derived deterministically from the key. */
  def births(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer").select(
      col("c_custkey"),
      date_add(to_date(lit("1950-01-01")),
        pmod(col("c_custkey") * 37, lit(21915)).cast("int")).as("birth"))

  val birthsSql: String =
    """SELECT c_custkey,
      |  DATE '1950-01-01' + CAST((c_custkey * 37) % 21915 AS INT) AS birth
      |FROM customer""".stripMargin
}
