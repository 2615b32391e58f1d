package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling (trailing-window) feature engineering over event time — the
  * "n events in the last k days per key" features a feature store
  * typically serves next to the interval-valid ones.
  *
  * One shuffle (groupBy key+day), then a RANGE window over the per-day
  * aggregates — the window input is bounded by (keys × active days), not
  * by raw events, so skewed users don't blow up the sort.
  */
object Rolling {

  /** Trailing `days`-day count and sum per (key, active day).
    * @param valueCents integral value column to sum (exact arithmetic) */
  def trailing(df: DataFrame, keyCol: String, dateCol: String,
               valueCents: Column, days: Int): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), col(dateCol).as("date"))
      .agg(count(lit(1)).as("n"), sum(valueCents).as("cents"))
      .withColumn("__d", datediff(col("date"), lit("1970-01-01")))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__d"))
      .rangeBetween(-(days - 1), Window.currentRow)
    daily
      .withColumn(s"n_${days}d", sum(col("n")).over(w))
      .withColumn(s"cents_${days}d", sum(col("cents")).over(w))
      .drop("__d")
  }
}
