package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Which date sub-ranges of [start, end] are NOT covered yet?
  * (reference: R/DiseasystoreBase.R:522-605 `determine_missing_ranges` —
  * log-parsing → date set difference → contiguous segments.)
  *
  * Gaps-and-islands on the missing dates: island id = date − row_number
  * (constant within each consecutive run). The window is unpartitioned,
  * but its input is at most the number of days in the requested span —
  * bounded and tiny regardless of data scale.
  */
object MissingRanges {

  /** @param covered single-column DataFrame of covered dates ("date") */
  def apply(covered: DataFrame, start: String, endInclusive: String): DataFrame = {
    val spark = covered.sparkSession
    val requested = spark.range(1).select(
      explode(sequence(to_date(lit(start)), to_date(lit(endInclusive)))).as("date"))
    val missing = requested.join(covered.select(to_date(col("date")).as("date")),
      Seq("date"), "left_anti")
    val w = Window.orderBy(col("date"))
    missing
      .withColumn("__island", date_sub(col("date"), row_number().over(w)))
      .groupBy("__island")
      .agg(min(col("date")).as("start_date"), max(col("date")).as("end_date"))
      .select("start_date", "end_date")
  }
}
