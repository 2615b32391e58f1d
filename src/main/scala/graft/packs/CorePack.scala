package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Queries, QueryPack}
import graft.core._

/** Aggregators, interval slicing, and the flagship key_join_features
  * prevalence queries. */
object CorePack extends QueryPack {

  private val Start = "1995-01-01"
  private val End = "1995-03-31"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_key_join_sum" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(Aggregators.Sum.agg(col("l_quantity")).as("n"))),

    "q02_key_join_count" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(Aggregators.Count.agg(lit(1)).as("n"))),

    "q03_key_join_minmax" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          Aggregators.Min.agg(col("l_extendedprice")).as("n_min"),
          Aggregators.Max.agg(col("l_extendedprice")).as("n_max"))),

    "q04_feature_slice" -> ((s, dir) =>
      Intervals.slice(Queries.orderIntervals(s, dir), Start, End)
        .select(col("key_cust"), col("o_orderkey"),
          col("valid_from").cast("string").as("valid_from"),
          col("valid_until").cast("string").as("valid_until"))),

    "q07_prevalence" -> ((s, dir) =>
      KeyJoinFeatures(
        observable = Intervals.slice(Queries.orderIntervals(s, dir), Start, End),
        observableName = "n_orders",
        feature = "o_orderkey",
        agg = Aggregators.Count,
        stratifications = Seq.empty,
        stratCols = Seq.empty,
        start = Start, endInclusive = End)
        .withColumn("date", col("date").cast("string"))),

    "q08_prevalence_strat" -> ((s, dir) =>
      KeyJoinFeatures(
        observable = Intervals.slice(Queries.orderIntervals(s, dir), Start, End),
        observableName = "n_orders",
        feature = "o_orderkey",
        agg = Aggregators.Count,
        stratifications = Seq(
          Intervals.slice(Queries.segmentFeature(s, dir), Start, End)),
        stratCols = Seq("mktsegment"),
        start = Start, endInclusive = End)
        .withColumn("date", col("date").cast("string"))),

    // interval UNION per key (gaps-and-islands merge): per customer,
    // merged order-validity spans and total covered days. CLOSED spans
    // only, filtered on BOTH sides — the oracle's running-max has no
    // open-end (NULL) absorption, and covered_days is undefined for an
    // open span (mergePerKey itself handles NULL ends; CoreOpsSpec).
    "q55_interval_union" -> ((s, dir) =>
      Intervals.mergePerKey(
        Queries.orderIntervals(s, dir)
          .filter(col("valid_until").isNotNull), Seq("key_cust"))
        .groupBy("key_cust")
        .agg(count(lit(1)).as("n_spans"),
          sum(datediff(col("valid_until"), col("valid_from")))
            .as("covered_days"))),

    // interval DIFFERENCE per key: order-validity days NOT covered by
    // the customer's first-order episode. The oracle evaluates the same
    // semantics by brute-force day explosion + EXCEPT — an independent
    // formulation, not a mirror of the segmentation algorithm.
    "q57_interval_diff" -> ((s, dir) => {
      val iv = Queries.orderIntervals(s, dir)
        .select("key_cust", "o_orderkey", "valid_from", "valid_until")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key_cust"))
        .orderBy(col("valid_from"), col("o_orderkey"))
      val first = iv.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select("key_cust", "valid_from", "valid_until")
      Intervals.subtractPerKey(
        iv.select("key_cust", "valid_from", "valid_until"),
        first, Seq("key_cust"))
        .groupBy("key_cust")
        .agg(sum(datediff(col("valid_until"), col("valid_from")))
          .as("uncovered_days"))
    }),

    // daily NON-INVERTIBLE aggregates over multi-day intervals: min /
    // max / distinct-keys per active day (the general path where the
    // delta+prefix-sum trick cannot apply)
    "q58_minmax_multiday" -> ((s, dir) =>
      Intervals.dailyAgg(Queries.orderIntervals(s, dir), Start, End,
        Seq.empty, Seq(
          min(col("o_orderkey")).as("min_order"),
          max(col("o_orderkey")).as("max_order"),
          count_distinct(col("key_cust")).as("n_customers")))
        .withColumn("date", col("date").cast("string"))),

    // the stratified path: same non-invertible daily aggregates broken
    // out by a broadcast-joined dimension
    "q59_minmax_strat" -> ((s, dir) => {
      val iv = Queries.orderIntervals(s, dir)
      val seg = Queries.segmentFeature(s, dir)
        .select("key_cust", "mktsegment")
      Intervals.dailyAgg(iv.join(broadcast(seg), "key_cust"),
        Start, End, Seq("mktsegment"), Seq(
          max(col("o_orderkey")).as("max_order"),
          count_distinct(col("key_cust")).as("n_customers")))
        .withColumn("date", col("date").cast("string"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q58_minmax_multiday" ->
      s"""WITH iv AS (${Queries.orderIntervalsSql}),
         |days AS (
         |  SELECT CAST(gs.d AS DATE) AS d
         |  FROM generate_series(TIMESTAMP '$Start',
         |    TIMESTAMP '$End', INTERVAL 1 DAY) gs(d)
         |)
         |SELECT CAST(d AS VARCHAR) AS date,
         |  min(o_orderkey) AS min_order,
         |  max(o_orderkey) AS max_order,
         |  CAST(count(DISTINCT key_cust) AS BIGINT) AS n_customers
         |FROM days JOIN iv ON d >= valid_from AND d < valid_until
         |GROUP BY d""".stripMargin,

    "q59_minmax_strat" ->
      s"""WITH iv AS (${Queries.orderIntervalsSql}),
         |seg AS (${Queries.segmentFeatureSql}),
         |days AS (
         |  SELECT CAST(gs.d AS DATE) AS d
         |  FROM generate_series(TIMESTAMP '$Start',
         |    TIMESTAMP '$End', INTERVAL 1 DAY) gs(d)
         |)
         |SELECT CAST(d AS VARCHAR) AS date, seg.mktsegment,
         |  max(iv.o_orderkey) AS max_order,
         |  CAST(count(DISTINCT iv.key_cust) AS BIGINT) AS n_customers
         |FROM days
         |JOIN iv ON d >= iv.valid_from AND d < iv.valid_until
         |JOIN seg ON seg.key_cust = iv.key_cust
         |GROUP BY d, seg.mktsegment""".stripMargin,

    "q57_interval_diff" ->
      s"""WITH iv AS (${Queries.orderIntervalsSql}),
         |f AS (
         |  SELECT key_cust, valid_from, valid_until
         |  FROM (SELECT key_cust, valid_from, valid_until,
         |          row_number() OVER (PARTITION BY key_cust
         |            ORDER BY valid_from, o_orderkey) AS rn
         |        FROM iv) r
         |  WHERE rn = 1
         |),
         |days AS (
         |  SELECT CAST(gs.d AS DATE) AS d
         |  FROM generate_series(TIMESTAMP '1990-01-01',
         |    TIMESTAMP '2010-12-31', INTERVAL 1 DAY) gs(d)
         |),
         |ad AS (
         |  SELECT DISTINCT key_cust, d
         |  FROM iv JOIN days ON d >= valid_from AND d < valid_until
         |),
         |bd AS (
         |  SELECT DISTINCT key_cust, d
         |  FROM f JOIN days ON d >= valid_from AND d < valid_until
         |),
         |diff AS (SELECT key_cust, d FROM ad EXCEPT SELECT key_cust, d FROM bd)
         |SELECT key_cust, CAST(count(*) AS BIGINT) AS uncovered_days
         |FROM diff GROUP BY key_cust""".stripMargin,

    "q55_interval_union" ->
      s"""WITH iv AS (
         |  SELECT * FROM (${Queries.orderIntervalsSql}) iv0
         |  WHERE valid_until IS NOT NULL
         |),
         |o AS (
         |  SELECT key_cust, valid_from, valid_until,
         |    max(valid_until) OVER (PARTITION BY key_cust
         |      ORDER BY valid_from, valid_until
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
         |  FROM iv
         |),
         |i AS (
         |  SELECT *, CASE WHEN prev_max IS NULL OR valid_from > prev_max
         |    THEN 1 ELSE 0 END AS ni
         |  FROM o
         |),
         |c AS (
         |  SELECT *, sum(ni) OVER (PARTITION BY key_cust
         |    ORDER BY valid_from, valid_until
         |    ROWS UNBOUNDED PRECEDING) AS island
         |  FROM i
         |),
         |m AS (
         |  SELECT key_cust, island, min(valid_from) AS f,
         |    max(valid_until) AS u
         |  FROM c GROUP BY key_cust, island
         |)
         |SELECT key_cust, CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(u - f) AS BIGINT) AS covered_days
         |FROM m GROUP BY key_cust""".stripMargin,
    "q01_key_join_sum" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS n
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q02_key_join_count" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,

    "q03_key_join_minmax" ->
      """SELECT l_returnflag, min(l_extendedprice) AS n_min,
        |  max(l_extendedprice) AS n_max
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q04_feature_slice" ->
      s"""WITH iv AS (${Queries.orderIntervalsSql})
         |SELECT key_cust, o_orderkey, CAST(valid_from AS VARCHAR) AS valid_from,
         |  CAST(valid_until AS VARCHAR) AS valid_until
         |FROM iv
         |WHERE valid_from <= DATE '$End' AND valid_until > DATE '$Start'
         |""".stripMargin,

    "q07_prevalence" ->
      s"""WITH iv AS (${Queries.orderIntervalsSql}),
         |sliced AS (
         |  SELECT greatest(valid_from, DATE '$Start') AS vf,
         |         least(valid_until, DATE '$End' + 1) AS vu
         |  FROM iv
         |  WHERE valid_from <= DATE '$End' AND valid_until > DATE '$Start'
         |),
         |deltas AS (
         |  SELECT d, count(CASE WHEN is_add THEN 1 END) AS n_add,
         |         count(CASE WHEN NOT is_add THEN 1 END) AS n_remove
         |  FROM (
         |    SELECT vf AS d, TRUE AS is_add FROM sliced
         |    UNION ALL
         |    SELECT vu AS d, FALSE AS is_add FROM sliced
         |  ) GROUP BY d
         |),
         |grid AS (
         |  SELECT CAST(unnest(generate_series(
         |    DATE '$Start', DATE '$End', INTERVAL 1 DAY)) AS DATE) AS date
         |)
         |SELECT CAST(g.date AS VARCHAR) AS date,
         |  CAST(sum(coalesce(n_add, 0)) OVER (ORDER BY g.date)
         |     - sum(coalesce(n_remove, 0)) OVER (ORDER BY g.date)
         |    AS BIGINT) AS n_orders
         |FROM grid g LEFT JOIN deltas ON g.date = deltas.d
         |""".stripMargin,

    "q08_prevalence_strat" ->
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
         |  SELECT o.o_orderkey, s.mktsegment,
         |         CASE WHEN o.vf >= s.vf THEN o.vf ELSE s.vf END AS vf,
         |         CASE WHEN o.vu <= s.vu THEN o.vu ELSE s.vu END AS vu
         |  FROM obs o JOIN strat s ON o.key_cust = s.key_cust
         |   AND o.vf < s.vu AND o.vu > s.vf
         |),
         |deltas AS (
         |  SELECT mktsegment, d,
         |         count(CASE WHEN is_add THEN 1 END) AS n_add,
         |         count(CASE WHEN NOT is_add THEN 1 END) AS n_remove
         |  FROM (
         |    SELECT mktsegment, vf AS d, TRUE AS is_add FROM interlaced
         |    UNION ALL
         |    SELECT mktsegment, vu AS d, FALSE AS is_add FROM interlaced
         |  ) GROUP BY 1, 2
         |),
         |grid AS (
         |  SELECT m.mktsegment, CAST(d.d AS DATE) AS date
         |  FROM (SELECT DISTINCT mktsegment FROM interlaced) m
         |  CROSS JOIN (SELECT unnest(generate_series(
         |    DATE '$Start', DATE '$End', INTERVAL 1 DAY)) AS d) d
         |)
         |SELECT CAST(g.date AS VARCHAR) AS date, g.mktsegment,
         |  CAST(sum(coalesce(n_add, 0)) OVER (PARTITION BY g.mktsegment ORDER BY g.date)
         |     - sum(coalesce(n_remove, 0)) OVER (PARTITION BY g.mktsegment ORDER BY g.date)
         |    AS BIGINT) AS n_orders
         |FROM grid g
         |LEFT JOIN deltas x
         |  ON g.date = x.d AND g.mktsegment IS NOT DISTINCT FROM x.mktsegment
         |""".stripMargin
  )
}
