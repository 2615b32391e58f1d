package graft.packs

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Queries, QueryPack}
import graft.core._
import graft.functions.Ages
import graft.stores.TpchFeatureStore

/** Full-store composition: registry-driven keyJoinFeatures through the
  * SCD2-persisting getFeature path, key_join_filter, long-pivot ingest. */
object StorePack extends QueryPack {

  private val Start = "1995-01-01"
  private val End = "1995-03-31"

  private def freshStore(s: SparkSession, dir: String) =
    TpchFeatureStore(s, dir,
      Files.createTempDirectory("graft-store").toString)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Same series as q08, but through the store machinery: registry →
    // compute-if-missing getFeature → SCD2 persist → slice → pipeline.
    "q16_store_composed" -> ((s, dir) =>
      freshStore(s, dir)
        .keyJoinFeatures("n_orders", Seq("mktsegment"), Start, End)
        .withColumn("date", col("date").cast("string"))),

    // Two stratifications → two-table truncate + breakpoint interlace.
    "q17_store_two_strat" -> ((s, dir) =>
      freshStore(s, dir)
        .keyJoinFeatures("n_first_order", Seq("mktsegment", "age_group"),
          Start, End)
        .withColumn("date", col("date").cast("string"))),

    // Expression stratification (reference: quosure stratifications):
    // stratify the q08 series by a DERIVED column — the first letter of
    // the market segment — with the mktsegment feature dependency
    // auto-detected from the expression and fetched through the store.
    "q47_expr_strat" -> ((s, dir) =>
      freshStore(s, dir)
        .keyJoinFeaturesExpr("n_orders",
          Seq("seg_initial" -> substring(col("mktsegment"), 1, 1)),
          Start, End)
        .withColumn("date", col("date").cast("string"))),

    // key_join_filter: drop semi-aggregated double counting before the
    // series aggregation (reference: GoogleCovid19 key_join_filter).
    "q19_key_join_filter" -> ((s, dir) => {
      val events = Tables.events(s, dir)
        .select(col("event_id"), to_date(col("ts")).as("valid_from"))
        .withColumn("valid_until", date_add(col("valid_from"), 1))
      // each event appears at two aggregation levels → double counted
      val leveled = events
        .withColumn("key_loc", lit("all")).withColumn("level", lit(0))
        .unionByName(events
          .withColumn("key_loc", concat(lit("u"), col("event_id") % 100))
          .withColumn("level", lit(1)))
      val filtered = leveled.filter(col("level") === 0) // the filter hook
      graft.core.KeyJoinFeatures(
        Intervals.slice(filtered, "2024-01-05", "2024-02-03"),
        "n_events", "event_id", Aggregators.Count,
        Seq.empty, Seq.empty, "2024-01-05", "2024-02-03")
        .withColumn("date", col("date").cast("string"))
    }),

    // Long-format pivot ingest (wide metric columns → rows).
    "q18_pivot_long" -> ((s, dir) =>
      Tables.load(s, dir, "part").selectExpr("p_partkey",
        "stack(2, 'size', cast(p_size as double), " +
          "'retailprice', p_retailprice) as (metric, value)"))
  )

  private val AgeLabels = Ages.ageLabels(TpchFeatureStore.AgeCuts)

  def oracleSql: Map[String, String] = Map(
    // identical series to q08, reached through the store machinery
    "q16_store_composed" -> CorePack.oracleSql("q08_prevalence_strat"),

    // the q08 series stratified by a derived expression over mktsegment
    "q47_expr_strat" ->
      s"""WITH iv AS (${Queries.orderIntervalsSql}),
         |seg AS (${Queries.segmentFeatureSql}),
         |obs AS (
         |  SELECT key_cust, o_orderkey,
         |         greatest(valid_from, DATE '$Start') AS vf,
         |         least(valid_until, DATE '$End' + 1) AS vu
         |  FROM iv
         |  WHERE valid_from <= DATE '$End' AND valid_until > DATE '$Start'
         |),
         |strat AS (
         |  SELECT key_cust, mktsegment,
         |         greatest(valid_from, DATE '$Start') AS vf,
         |         least(coalesce(valid_until, DATE '$End' + 1), DATE '$End' + 1) AS vu
         |  FROM seg
         |  WHERE valid_from <= DATE '$End'
         |    AND (valid_until > DATE '$Start' OR valid_until IS NULL)
         |),
         |interlaced AS (
         |  SELECT o.o_orderkey, substr(s.mktsegment, 1, 1) AS seg_initial,
         |         CASE WHEN o.vf >= s.vf THEN o.vf ELSE s.vf END AS vf,
         |         CASE WHEN o.vu <= s.vu THEN o.vu ELSE s.vu END AS vu
         |  FROM obs o JOIN strat s ON o.key_cust = s.key_cust
         |   AND o.vf < s.vu AND o.vu > s.vf
         |),
         |deltas AS (
         |  SELECT seg_initial, d,
         |         count(CASE WHEN is_add THEN 1 END) AS n_add,
         |         count(CASE WHEN NOT is_add THEN 1 END) AS n_remove
         |  FROM (
         |    SELECT seg_initial, vf AS d, TRUE AS is_add FROM interlaced
         |    UNION ALL
         |    SELECT seg_initial, vu AS d, FALSE AS is_add FROM interlaced
         |  ) GROUP BY 1, 2
         |),
         |grid AS (
         |  SELECT m.seg_initial, CAST(d.d AS DATE) AS date
         |  FROM (SELECT DISTINCT seg_initial FROM interlaced) m
         |  CROSS JOIN (SELECT unnest(generate_series(
         |    DATE '$Start', DATE '$End', INTERVAL 1 DAY)) AS d) d
         |)
         |SELECT CAST(g.date AS VARCHAR) AS date, g.seg_initial,
         |  CAST(sum(coalesce(n_add, 0)) OVER (PARTITION BY g.seg_initial ORDER BY g.date)
         |     - sum(coalesce(n_remove, 0)) OVER (PARTITION BY g.seg_initial ORDER BY g.date)
         |    AS BIGINT) AS n_orders
         |FROM grid g
         |LEFT JOIN deltas x
         |  ON g.date = x.d AND g.seg_initial IS NOT DISTINCT FROM x.seg_initial
         |""".stripMargin,

    "q17_store_two_strat" -> {
      val ageCase = TpchFeatureStore.AgeCuts.zip(AgeLabels.init)
        .map { case (cut, lbl) => s"WHEN age < $cut THEN '$lbl'" }
        .mkString(" ")
      s"""WITH iv AS (${Queries.orderIntervalsSql}),
         |b AS (${Queries.birthsSql}),
         |obs0 AS (
         |  SELECT key_cust, o_orderkey, valid_from, valid_until FROM iv
         |  WHERE valid_from <= DATE '$End' AND valid_until > DATE '$Start'
         |),
         |obs1 AS (
         |  SELECT *, row_number() OVER (PARTITION BY key_cust
         |    ORDER BY valid_from, o_orderkey) AS rn
         |  FROM obs0
         |),
         |obsc AS (
         |  SELECT key_cust, o_orderkey,
         |    greatest(valid_from, DATE '$Start') AS vf,
         |    least(valid_until, DATE '$End' + 1) AS vu
         |  FROM obs1 WHERE rn = 1
         |),
         |segc AS (
         |  SELECT c_custkey AS key_cust, c_mktsegment AS mktsegment,
         |    greatest(DATE '1990-01-01', DATE '$Start') AS vf,
         |    DATE '$End' + 1 AS vu
         |  FROM customer
         |),
         |ages AS (
         |  SELECT c_custkey AS key_cust, birth, age0 + i AS age
         |  FROM (
         |    SELECT c_custkey, birth,
         |      year(DATE '$Start') - year(birth)
         |        - CASE WHEN month(DATE '$Start') * 100 + day(DATE '$Start')
         |            < month(birth) * 100 + day(birth) THEN 1 ELSE 0 END AS age0
         |    FROM b
         |  ), (SELECT unnest(generate_series(0, 2)) AS i)
         |),
         |agef AS (
         |  SELECT key_cust,
         |    CASE $ageCase ELSE '${AgeLabels.last}' END AS age_group,
         |    CAST(birth + to_years(CAST(age AS INT)) AS DATE) AS avf,
         |    CAST(birth + to_years(CAST(age + 1 AS INT)) AS DATE) AS avu
         |  FROM ages
         |),
         |agec AS (
         |  SELECT key_cust, age_group,
         |    greatest(avf, DATE '$Start') AS vf,
         |    least(avu, DATE '$End' + 1) AS vu
         |  FROM agef
         |  WHERE avf <= DATE '$End' AND avu > DATE '$Start'
         |),
         |t1 AS (
         |  SELECT o.key_cust, o.o_orderkey, s.mktsegment,
         |    CASE WHEN o.vf >= s.vf THEN o.vf ELSE s.vf END AS vf,
         |    CASE WHEN o.vu <= s.vu THEN o.vu ELSE s.vu END AS vu
         |  FROM obsc o JOIN segc s ON o.key_cust = s.key_cust
         |    AND o.vf < s.vu AND o.vu > s.vf
         |),
         |t2 AS (
         |  SELECT o.key_cust, o.o_orderkey, a.age_group,
         |    CASE WHEN o.vf >= a.vf THEN o.vf ELSE a.vf END AS vf,
         |    CASE WHEN o.vu <= a.vu THEN o.vu ELSE a.vu END AS vu
         |  FROM obsc o JOIN agec a ON o.key_cust = a.key_cust
         |    AND o.vf < a.vu AND o.vu > a.vf
         |),
         |pts AS (
         |  SELECT key_cust, vf AS p FROM t1
         |  UNION SELECT key_cust, vu FROM t1
         |  UNION SELECT key_cust, vf FROM t2
         |  UNION SELECT key_cust, vu FROM t2
         |),
         |segs AS (
         |  SELECT key_cust, p AS seg_from,
         |    lead(p) OVER (PARTITION BY key_cust ORDER BY p) AS seg_until
         |  FROM pts
         |),
         |interlaced AS (
         |  SELECT s.key_cust, t1.mktsegment, t2.age_group,
         |    s.seg_from AS vf, s.seg_until AS vu
         |  FROM segs s
         |  LEFT JOIN t1 ON s.key_cust = t1.key_cust
         |    AND t1.vf <= s.seg_from AND t1.vu > s.seg_from
         |  LEFT JOIN t2 ON s.key_cust = t2.key_cust
         |    AND t2.vf <= s.seg_from AND t2.vu > s.seg_from
         |  WHERE t1.key_cust IS NOT NULL OR t2.key_cust IS NOT NULL
         |),
         |deltas AS (
         |  SELECT mktsegment, age_group, d,
         |    count(CASE WHEN is_add THEN 1 END) AS n_add,
         |    count(CASE WHEN NOT is_add THEN 1 END) AS n_remove
         |  FROM (
         |    SELECT mktsegment, age_group, vf AS d, TRUE AS is_add
         |    FROM interlaced
         |    UNION ALL
         |    SELECT mktsegment, age_group, vu AS d, FALSE AS is_add
         |    FROM interlaced
         |  ) GROUP BY 1, 2, 3
         |),
         |grid AS (
         |  SELECT m.mktsegment, m.age_group, CAST(d.d AS DATE) AS date
         |  FROM (SELECT DISTINCT mktsegment, age_group FROM interlaced) m
         |  CROSS JOIN (SELECT unnest(generate_series(
         |    DATE '$Start', DATE '$End', INTERVAL 1 DAY)) AS d) d
         |)
         |SELECT CAST(g.date AS VARCHAR) AS date, g.mktsegment, g.age_group,
         |  CAST(sum(coalesce(n_add, 0)) OVER (
         |      PARTITION BY g.mktsegment, g.age_group ORDER BY g.date)
         |    - sum(coalesce(n_remove, 0)) OVER (
         |      PARTITION BY g.mktsegment, g.age_group ORDER BY g.date)
         |    AS BIGINT) AS n_first_order
         |FROM grid g
         |LEFT JOIN deltas x ON g.date = x.d
         |  AND g.mktsegment IS NOT DISTINCT FROM x.mktsegment
         |  AND g.age_group IS NOT DISTINCT FROM x.age_group
         |""".stripMargin
    },

    "q19_key_join_filter" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events
        |  GROUP BY 1
        |),
        |grid AS (
        |  SELECT CAST(unnest(generate_series(
        |    DATE '2024-01-05', DATE '2024-02-03', INTERVAL 1 DAY)) AS DATE)
        |    AS date
        |)
        |SELECT CAST(g.date AS VARCHAR) AS date,
        |  CAST(coalesce(n, 0) AS BIGINT) AS n_events
        |FROM grid g LEFT JOIN daily ON g.date = daily.d
        |""".stripMargin,

    "q18_pivot_long" ->
      """SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
        |FROM part
        |UNION ALL
        |SELECT p_partkey, 'retailprice', p_retailprice FROM part
        |""".stripMargin
  )
}
