package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Which date sub-ranges of [start, end] are NOT covered yet?
  * (reference: R/DiseasystoreBase.R:522-605 `determine_missing_ranges` —
  * log-parsing → date set difference → contiguous segments.)
  *
  * Gaps-and-islands on the missing dates, segmented in two levels so no
  * window ever sees an unpartitioned day-grained input: island id =
  * date − row_number PER YEAR (parallel, skew-free), then runs that
  * touch across a Dec-31→Jan-1 boundary are merged by a second pass
  * whose input is one row per (year, island) — a few dozen rows for any
  * realistic study period, so its single-partition window is bounded by
  * construction (not by data volume).
  */
object MissingRanges {

  /** @param covered single-column DataFrame of covered dates ("date") */
  def apply(covered: DataFrame, start: String, endInclusive: String): DataFrame = {
    val spark = covered.sparkSession
    val requested = spark.range(1).select(
      explode(sequence(to_date(lit(start)), to_date(lit(endInclusive)))).as("date"))
    val missing = requested.join(covered.select(to_date(col("date")).as("date")),
      Seq("date"), "left_anti")
    // level 1: consecutive runs within each year (partitioned window)
    val wYear = Window.partitionBy(col("__y")).orderBy(col("date"))
    val perYear = missing
      .withColumn("__y", year(col("date")))
      .withColumn("__island", date_sub(col("date"), row_number().over(wYear)))
      .groupBy("__y", "__island")
      .agg(min(col("date")).as("start_date"), max(col("date")).as("end_date"))
    // level 2: merge ranges touching across year boundaries; input is
    // range-grained (disjoint, sorted), so "new island" = a gap of >1 day
    // after the previous range's end
    val wPrev = Window.orderBy(col("start_date"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.orderBy(col("start_date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perYear
      .withColumn("__prevEnd", max(col("end_date")).over(wPrev))
      .withColumn("__new",
        when(col("__prevEnd").isNull ||
          col("start_date") > date_add(col("__prevEnd"), 1), 1).otherwise(0))
      .withColumn("__grp", sum(col("__new")).over(wRun))
      .groupBy("__grp")
      .agg(min(col("start_date")).as("start_date"),
        max(col("end_date")).as("end_date"))
      .select("start_date", "end_date")
  }
}
