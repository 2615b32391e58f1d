package graft.stores

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._

/** A GoogleCovid19-style store over semi-aggregated data: the same event
  * is reported at several aggregation levels (here: global "all" and
  * per-user), so naive aggregation double-counts. The `keyJoinFilter`
  * override keeps exactly one level depending on the requested
  * stratification (reference: R/DiseasystoreGoogleCovid19.R:241-277).
  */
class SemiAggStore(spark: SparkSession, sfDir: String, storePath: String,
                   commitProtocol: Committer = Committer.Rename)
    extends FeatureStore(
      spark, sfDir, storePath,
      commitProtocol = commitProtocol,
      storeScope = Some("SemiAggEvents"), // registry label, not class name
      dsMap = Seq(
        "n_events" -> "leveled_events",
        "loc" -> "locations"),
      loaders = Map(
        "leveled_events" -> FeatureHandler(
          (st, s0, e0) => {
            val ev = Tables.events(st.spark, st.sfDir)
              .select(col("event_id"), to_date(col("ts")).as("valid_from"))
              .withColumn("valid_until", date_add(col("valid_from"), 1))
            val leveled = ev
              .withColumn("key_loc", lit("all")).withColumn("level", lit(0))
              .unionByName(ev
                .withColumn("key_loc", concat(lit("u"), col("event_id") % 100))
                .withColumn("level", lit(1)))
            Intervals.slice(leveled, s0, e0)
          },
          Aggregators.Count, ""),
        "locations" -> FeatureHandler(
          (st, s0, e0) => {
            val ids = st.spark.range(100)
            ids.select(concat(lit("u"), col("id")).as("key_loc"),
              concat(lit("u"), col("id")).as("loc"),
              to_date(lit("1990-01-01")).as("valid_from"),
              lit(null).cast("date").as("valid_until"))
          },
          Aggregators.Count, ""))) {

  /** No location stratification requested → keep the aggregate level;
    * location stratification requested → keep the per-location level. */
  override protected def keyJoinFilter(
      data: DataFrame, stratFeatures: Seq[String],
      start: String, end: String): DataFrame =
    if (stratFeatures.contains("loc")) data.filter(col("level") === 1)
    else data.filter(col("level") === 0)
}
