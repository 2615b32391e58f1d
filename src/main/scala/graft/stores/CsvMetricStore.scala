package graft.stores

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core._
import graft.sources.Sources

/** An EcdcRespiratoryViruses-style store: the source is a long-format
  * CSV of per-location daily metrics (reference:
  * R/DiseasystoreEcdcRespiratoryViruses.R — `source_conn` CSVs with one
  * row per (date, location, indicator, value)). One loader per
  * indicator; each row becomes a 1-day-validity feature row, the
  * semi-aggregated shape `key_join_features`'s delta pipeline consumes
  * directly.
  *
  * @param csvPath directory containing `metrics.csv` with header
  *                `date,location,indicator,value`
  */
class CsvMetricStore(spark: SparkSession, csvPath: String, storePath: String,
                     indicators: Seq[String] = Seq("cases", "admissions"))
    extends FeatureStore(
      spark, csvPath, storePath,
      dsMap = indicators.map(i => s"n_$i" -> s"metric_$i") :+
        ("location" -> "locations"),
      loaders = {
        import CsvMetricStore.metricRows
        indicators.map { ind =>
          s"metric_$ind" -> FeatureHandler(
            (st, s0, e0) => Intervals.slice(
              metricRows(st)
                .filter(col("indicator") === ind)
                .select(col("location").as("key_loc"),
                  col("value").as(s"n_$ind"),
                  col("date").as(Intervals.ValidFrom),
                  date_add(col("date"), 1).as(Intervals.ValidUntil)),
              s0, e0),
            Aggregators.Sum, s"n_$ind")
        }.toMap + ("locations" -> FeatureHandler(
          (st, s0, e0) =>
            metricRows(st)
              .select(col("location").as("key_loc")).distinct()
              .select(col("key_loc"), col("key_loc").as("location"),
                to_date(lit("1900-01-01")).as(Intervals.ValidFrom),
                lit(null).cast("date").as(Intervals.ValidUntil)),
          Aggregators.Sum, ""))
      })

object CsvMetricStore {
  private val schema = StructType(Seq(
    StructField("date", DateType),
    StructField("location", StringType),
    StructField("indicator", StringType),
    StructField("value", LongType)))

  private def metricRows(st: FeatureStore) =
    Sources.csv(st.spark, st.sfDir, schema)
}
