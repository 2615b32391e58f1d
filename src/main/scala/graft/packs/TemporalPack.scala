package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Queries, QueryPack}
import graft.core._
import graft.functions.Ages
import graft.operators.Interlace

/** Bitemporal machinery: truncate/interlace, SCD2 snapshots + time
  * travel, missing-range computation, age arithmetic. */
object TemporalPack extends QueryPack {

  private val Start = "1995-01-01"
  private val End = "1995-03-31"
  private val Ts1 = "2024-01-01 00:00:00"
  private val Ts2 = "2024-02-01 00:00:00"
  private val ScdCols = Seq("o_orderkey", "o_orderstatus", "o_orderpriority")

  /** Per-customer segment attribute with data-dependent validity. */
  private def segA(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer").select(
      col("c_custkey").as("key_cust"),
      col("c_mktsegment").as("mktsegment"),
      date_add(to_date(lit("1992-01-01")),
        pmod(col("c_custkey"), lit(300)).cast("int")).as("valid_from"))
      .withColumn("valid_until", date_add(col("valid_from"), 900))

  private val segASql =
    """SELECT c_custkey AS key_cust, c_mktsegment AS mktsegment,
      |  DATE '1992-01-01' + CAST(c_custkey % 300 AS INT) AS valid_from,
      |  DATE '1992-01-01' + CAST(c_custkey % 300 AS INT) + 900 AS valid_until
      |FROM customer""".stripMargin

  /** Per-customer balance bucket; one third open-ended. */
  private def segB(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer").select(
      col("c_custkey").as("key_cust"),
      when(col("c_acctbal") < 0, "neg")
        .when(col("c_acctbal") < 5000, "mid")
        .otherwise("high").as("bal_bucket"),
      date_add(to_date(lit("1993-01-01")),
        pmod(col("c_custkey") * 3, lit(400)).cast("int")).as("valid_from"))
      .withColumn("valid_until",
        when(pmod(col("key_cust"), lit(3)) === 0, lit(null).cast("date"))
          .otherwise(date_add(col("valid_from"), 700)))

  private val segBSql =
    """SELECT c_custkey AS key_cust,
      |  CASE WHEN c_acctbal < 0 THEN 'neg'
      |       WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_bucket,
      |  DATE '1993-01-01' + CAST((c_custkey * 3) % 400 AS INT) AS valid_from,
      |  CASE WHEN c_custkey % 3 = 0 THEN NULL
      |       ELSE DATE '1993-01-01' + CAST((c_custkey * 3) % 400 AS INT) + 700
      |  END AS valid_until
      |FROM customer""".stripMargin

  private def scdV1(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .filter(to_date(col("o_orderdate")) < lit("1996-01-01"))
      .select(ScdCols.map(col): _*)

  private def scdV2(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .filter(to_date(col("o_orderdate")) < lit("1997-01-01"))
      .select(
        col("o_orderkey"),
        when(pmod(col("o_orderkey"), lit(7)) === 0, "Z")
          .otherwise(col("o_orderstatus")).as("o_orderstatus"),
        col("o_orderpriority"))

  private val scdV1Sql =
    """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
      |WHERE CAST(o_orderdate AS DATE) < DATE '1996-01-01'""".stripMargin
  private val scdV2Sql =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 7 = 0 THEN 'Z' ELSE o_orderstatus END AS o_orderstatus,
      |  o_orderpriority FROM orders
      |WHERE CAST(o_orderdate AS DATE) < DATE '1997-01-01'""".stripMargin

  private def scd2Result(s: SparkSession, dir: String): DataFrame = {
    val snap1 = Scd2.updateSnapshot(None, scdV1(s, dir), Ts1, ScdCols)
    Scd2.updateSnapshot(Some(snap1), scdV2(s, dir), Ts2, ScdCols)
  }

  private val AgeCuts = Seq(5, 12, 20, 30, 45, 65, 80)

  /** Two-version balance-bucket feature (non-overlapping per customer;
    * second version open-ended for every third customer). */
  private def versionedBucket(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val v1 = c.select(
      col("c_custkey").as("key_cust"),
      when(col("c_acctbal") < 0, "neg")
        .when(col("c_acctbal") < 5000, "mid").otherwise("high").as("bucket"),
      date_add(to_date(lit("1992-01-01")),
        pmod(col("c_custkey"), lit(300)).cast("int")).as("valid_from"),
      date_add(to_date(lit("1994-01-01")),
        pmod(col("c_custkey") * 7, lit(300)).cast("int")).as("valid_until"))
    val v2 = c.select(
      col("c_custkey").as("key_cust"),
      when(col("c_acctbal") < 2500, "low2").otherwise("high2").as("bucket"),
      date_add(to_date(lit("1994-01-01")),
        pmod(col("c_custkey") * 7, lit(300)).cast("int")).as("valid_from"))
      .withColumn("valid_until",
        when(pmod(col("key_cust"), lit(3)) === 0, lit(null).cast("date"))
          .otherwise(date_add(col("valid_from"), 700)))
    v1.unionByName(v2)
  }

  private val versionedBucketSql =
    """SELECT c_custkey AS key_cust,
      |  CASE WHEN c_acctbal < 0 THEN 'neg'
      |       WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bucket,
      |  DATE '1992-01-01' + CAST(c_custkey % 300 AS INT) AS valid_from,
      |  DATE '1994-01-01' + CAST((c_custkey * 7) % 300 AS INT) AS valid_until
      |FROM customer
      |UNION ALL
      |SELECT c_custkey,
      |  CASE WHEN c_acctbal < 2500 THEN 'low2' ELSE 'high2' END,
      |  DATE '1994-01-01' + CAST((c_custkey * 7) % 300 AS INT),
      |  CASE WHEN c_custkey % 3 = 0 THEN NULL
      |       ELSE DATE '1994-01-01' + CAST((c_custkey * 7) % 300 AS INT) + 700
      |  END
      |FROM customer""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_asof_join" -> ((s, dir) => {
      val probes = Tables.load(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey").as("key_cust"),
        to_date(col("o_orderdate")).as("ts"))
      graft.operators.AsOf.join(probes, versionedBucket(s, dir),
        Seq("key_cust"), "ts")
        .select(col("o_orderkey"), col("key_cust"),
          col("ts").cast("string").as("ts"), col("bucket"))
    }),

    // as-of with a staleness TTL: versions older than 30 days at the
    // probe's ts read as missing even while still valid
    "q60_asof_tolerance" -> ((s, dir) => {
      val probes = Tables.load(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey").as("key_cust"),
        to_date(col("o_orderdate")).as("ts"))
      graft.operators.AsOf.joinWithTolerance(probes, versionedBucket(s, dir),
        Seq("key_cust"), "ts", toleranceDays = Some(30))
        .select(col("o_orderkey"), col("key_cust"),
          col("ts").cast("string").as("ts"), col("bucket"))
    }),

    "q05_truncate_interlace" -> ((s, dir) =>
      Interlace.truncateOne(
        Intervals.slice(Queries.orderIntervals(s, dir), Start, End),
        Queries.segmentFeature(s, dir),
        Seq("key_cust"))
        .select(col("key_cust"), col("o_orderkey"), col("mktsegment"),
          col("valid_from").cast("string").as("valid_from"),
          col("valid_until").cast("string").as("valid_until"))),

    "q06_interlace" -> ((s, dir) =>
      Interlace.interlace(Seq(segA(s, dir), segB(s, dir)), Seq("key_cust"))
        .select(col("key_cust"), col("mktsegment"), col("bal_bucket"),
          col("valid_from").cast("string").as("valid_from"),
          col("valid_until").cast("string").as("valid_until"))),

    "q09_incidence_sum" -> ((s, dir) =>
      KeyJoinFeatures(
        observable = Intervals.slice(Queries.orderIntervals(s, dir), Start, End)
          .withColumn("open_value", floor(col("o_totalprice")).cast("double")),
        observableName = "total_open_value",
        feature = "open_value",
        agg = Aggregators.Sum,
        stratifications = Seq(
          Intervals.slice(Queries.segmentFeature(s, dir), Start, End)),
        stratCols = Seq("mktsegment"),
        start = Start, endInclusive = End)
        .withColumn("date", col("date").cast("string"))),

    "q10_minmax_daily" -> ((s, dir) => {
      val obs = Tables.events(s, dir).select(
        col("user_id").as("key_user"),
        round(col("value") * 100, 0).cast("long").as("value_cents"),
        to_date(col("ts")).as("valid_from"))
        .withColumn("valid_until", date_add(col("valid_from"), 1))
      KeyJoinFeatures(
        observable = Intervals.slice(obs, "2024-01-05", "2024-02-03"),
        observableName = "min_value_cents",
        feature = "value_cents",
        agg = Aggregators.Min,
        stratifications = Seq.empty, stratCols = Seq.empty,
        start = "2024-01-05", endInclusive = "2024-02-03")
        .withColumn("date", col("date").cast("string"))
        .withColumn("min_value_cents", col("min_value_cents").cast("long"))
    }),

    "q11_missing_ranges" -> ((s, dir) => {
      val covered = Tables.events(s, dir)
        .filter(col("event_type") === "purchase" &&
          pmod(col("user_id"), lit(17)) === 3)
        .select(to_date(col("ts")).as("date")).distinct()
      MissingRanges(covered, "2024-01-01", "2024-02-29")
        .select(col("start_date").cast("string").as("start_date"),
          col("end_date").cast("string").as("end_date"))
    }),

    "q12_scd2_snapshot" -> ((s, dir) =>
      scd2Result(s, dir).select(
        (ScdCols.map(col) :+ col(Scd2.FromTs)) :+ col(Scd2.UntilTs): _*)),

    "q13_scd2_time_travel" -> ((s, dir) =>
      Scd2.sliceAt(scd2Result(s, dir), "2024-01-15 00:00:00")
        .select(ScdCols.map(col): _*)),

    "q14_age_on_date" -> ((s, dir) =>
      Queries.births(s, dir).select(
        col("c_custkey"),
        col("birth").cast("string").as("birth"),
        Ages.ageOnDate(col("birth"), to_date(lit("2024-06-15"))).as("age"))),

    "q15_age_groups" -> ((s, dir) =>
      Queries.births(s, dir)
        .select(Ages.cutAges(
          Ages.ageOnDate(col("birth"), to_date(lit("2024-06-15"))),
          AgeCuts).as("age_group"))
        .groupBy("age_group")
        .agg(Aggregators.Count.agg(lit(1)).as("n")))
  )

  def oracleSql: Map[String, String] = Map(
    "q60_asof_tolerance" ->
      s"""WITH f AS ($versionedBucketSql),
         |p AS (
         |  SELECT o_orderkey, o_custkey AS key_cust,
         |    CAST(o_orderdate AS DATE) AS ts
         |  FROM orders
         |)
         |SELECT p.o_orderkey, p.key_cust, CAST(p.ts AS VARCHAR) AS ts,
         |  f.bucket
         |FROM p LEFT JOIN f ON p.key_cust = f.key_cust
         |  AND f.valid_from <= p.ts
         |  AND (f.valid_until IS NULL OR f.valid_until > p.ts)
         |  AND f.valid_from >= p.ts - 30
         |""".stripMargin,

    "q34_asof_join" ->
      s"""WITH f AS ($versionedBucketSql),
         |p AS (
         |  SELECT o_orderkey, o_custkey AS key_cust,
         |    CAST(o_orderdate AS DATE) AS ts
         |  FROM orders
         |)
         |SELECT p.o_orderkey, p.key_cust, CAST(p.ts AS VARCHAR) AS ts,
         |  f.bucket
         |FROM p LEFT JOIN f ON p.key_cust = f.key_cust
         |  AND f.valid_from <= p.ts
         |  AND (f.valid_until IS NULL OR f.valid_until > p.ts)
         |""".stripMargin,

    "q05_truncate_interlace" ->
      s"""WITH iv AS (${Queries.orderIntervalsSql}),
         |seg AS (${Queries.segmentFeatureSql}),
         |p AS (
         |  SELECT * FROM iv
         |  WHERE valid_from <= DATE '$End' AND valid_until > DATE '$Start'
         |)
         |SELECT p.key_cust, p.o_orderkey, s.mktsegment,
         |  CAST(CASE WHEN p.valid_from >= s.valid_from THEN p.valid_from
         |       ELSE s.valid_from END AS VARCHAR) AS valid_from,
         |  CAST(CASE WHEN p.valid_until <= s.valid_until THEN p.valid_until
         |       ELSE s.valid_until END AS VARCHAR) AS valid_until
         |FROM p JOIN seg s ON p.key_cust = s.key_cust
         |  AND (p.valid_from < s.valid_until OR s.valid_until IS NULL)
         |  AND (p.valid_until > s.valid_from OR p.valid_until IS NULL)
         |""".stripMargin,

    "q06_interlace" ->
      s"""WITH a AS ($segASql),
         |b AS ($segBSql),
         |pts AS (
         |  SELECT key_cust, valid_from AS p FROM a
         |  UNION SELECT key_cust, valid_until FROM a WHERE valid_until IS NOT NULL
         |  UNION SELECT key_cust, valid_from FROM b
         |  UNION SELECT key_cust, valid_until FROM b WHERE valid_until IS NOT NULL
         |),
         |segs AS (
         |  SELECT key_cust, p AS seg_from,
         |    lead(p) OVER (PARTITION BY key_cust ORDER BY p) AS seg_until
         |  FROM pts
         |)
         |SELECT s.key_cust, a.mktsegment, b.bal_bucket,
         |  CAST(s.seg_from AS VARCHAR) AS valid_from,
         |  CAST(s.seg_until AS VARCHAR) AS valid_until
         |FROM segs s
         |LEFT JOIN a ON s.key_cust = a.key_cust AND a.valid_from <= s.seg_from
         |  AND (a.valid_until > s.seg_from OR a.valid_until IS NULL)
         |LEFT JOIN b ON s.key_cust = b.key_cust AND b.valid_from <= s.seg_from
         |  AND (b.valid_until > s.seg_from OR b.valid_until IS NULL)
         |WHERE a.key_cust IS NOT NULL OR b.key_cust IS NOT NULL
         |""".stripMargin,

    "q09_incidence_sum" ->
      s"""WITH iv AS (${Queries.orderIntervalsSql}),
         |seg AS (${Queries.segmentFeatureSql}),
         |obs AS (
         |  SELECT key_cust, floor(o_totalprice) AS open_value,
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
         |  SELECT o.open_value, s.mktsegment,
         |         CASE WHEN o.vf >= s.vf THEN o.vf ELSE s.vf END AS vf,
         |         CASE WHEN o.vu <= s.vu THEN o.vu ELSE s.vu END AS vu
         |  FROM obs o JOIN strat s ON o.key_cust = s.key_cust
         |   AND o.vf < s.vu AND o.vu > s.vf
         |),
         |deltas AS (
         |  SELECT mktsegment, d,
         |         sum(CASE WHEN is_add THEN open_value END) AS n_add,
         |         sum(CASE WHEN NOT is_add THEN open_value END) AS n_remove
         |  FROM (
         |    SELECT mktsegment, open_value, vf AS d, TRUE AS is_add FROM interlaced
         |    UNION ALL
         |    SELECT mktsegment, open_value, vu AS d, FALSE AS is_add FROM interlaced
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
         |    AS DOUBLE) AS total_open_value
         |FROM grid g
         |LEFT JOIN deltas x
         |  ON g.date = x.d AND g.mktsegment IS NOT DISTINCT FROM x.mktsegment
         |""".stripMargin,

    "q10_minmax_daily" ->
      """WITH obs AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS value_cents,
        |         CAST(ts AS DATE) AS vf0
        |  FROM events
        |),
        |sliced AS (
        |  SELECT value_cents,
        |         greatest(vf0, DATE '2024-01-05') AS vf,
        |         least(vf0 + 1, DATE '2024-02-03' + 1) AS vu
        |  FROM obs
        |  WHERE vf0 <= DATE '2024-02-03' AND vf0 + 1 > DATE '2024-01-05'
        |),
        |deltas AS (
        |  SELECT d, min(CASE WHEN is_add THEN value_cents END) AS n_add,
        |         min(CASE WHEN NOT is_add THEN value_cents END) AS n_remove
        |  FROM (
        |    SELECT value_cents, vf AS d, TRUE AS is_add FROM sliced
        |    UNION ALL
        |    SELECT value_cents, vu AS d, FALSE AS is_add FROM sliced
        |  ) GROUP BY d
        |),
        |grid AS (
        |  SELECT CAST(unnest(generate_series(
        |    DATE '2024-01-05', DATE '2024-02-03', INTERVAL 1 DAY)) AS DATE) AS date
        |)
        |SELECT CAST(g.date AS VARCHAR) AS date,
        |  CAST(sum(coalesce(n_add, 0)) OVER (ORDER BY g.date)
        |     - sum(coalesce(n_remove, 0)) OVER (ORDER BY g.date)
        |    AS BIGINT) AS min_value_cents
        |FROM grid g LEFT JOIN deltas ON g.date = deltas.d
        |""".stripMargin,

    "q11_missing_ranges" ->
      """WITH covered AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS d FROM events
        |  WHERE event_type = 'purchase' AND user_id % 17 = 3
        |),
        |req AS (
        |  SELECT CAST(unnest(generate_series(
        |    DATE '2024-01-01', DATE '2024-02-29', INTERVAL 1 DAY)) AS DATE) AS date
        |),
        |miss AS (
        |  SELECT date FROM req LEFT JOIN covered ON req.date = covered.d
        |  WHERE covered.d IS NULL
        |),
        |isl AS (
        |  SELECT date,
        |    date - CAST(row_number() OVER (ORDER BY date) AS INT) AS island
        |  FROM miss
        |)
        |SELECT CAST(min(date) AS VARCHAR) AS start_date,
        |       CAST(max(date) AS VARCHAR) AS end_date
        |FROM isl GROUP BY island
        |""".stripMargin,

    "q12_scd2_snapshot" ->
      s"""WITH v1 AS ($scdV1Sql),
         |v2 AS ($scdV2Sql)
         |SELECT v1.o_orderkey, v1.o_orderstatus, v1.o_orderpriority,
         |  '2024-01-01 00:00:00' AS from_ts,
         |  CASE WHEN EXISTS (
         |    SELECT 1 FROM v2 WHERE v2.o_orderkey = v1.o_orderkey
         |      AND v2.o_orderstatus = v1.o_orderstatus
         |      AND v2.o_orderpriority = v1.o_orderpriority)
         |  THEN NULL ELSE '2024-02-01 00:00:00' END AS until_ts
         |FROM v1
         |UNION ALL
         |SELECT v2.o_orderkey, v2.o_orderstatus, v2.o_orderpriority,
         |  '2024-02-01 00:00:00', NULL
         |FROM v2
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM v1 WHERE v1.o_orderkey = v2.o_orderkey
         |    AND v1.o_orderstatus = v2.o_orderstatus
         |    AND v1.o_orderpriority = v2.o_orderpriority)
         |""".stripMargin,

    "q13_scd2_time_travel" -> scdV1Sql,

    "q14_age_on_date" ->
      s"""WITH b AS (${Queries.birthsSql})
         |SELECT c_custkey, CAST(birth AS VARCHAR) AS birth,
         |  CAST(year(DATE '2024-06-15') - year(birth)
         |    - CASE WHEN month(DATE '2024-06-15') * 100 + day(DATE '2024-06-15')
         |             < month(birth) * 100 + day(birth) THEN 1 ELSE 0 END
         |    AS INT) AS age
         |FROM b""".stripMargin,

    "q15_age_groups" -> {
      val labels = Ages.ageLabels(AgeCuts)
      val cases = AgeCuts.zip(labels.init)
        .map { case (cut, label) => s"WHEN age < $cut THEN '$label'" }
        .mkString("\n         |    ")
      s"""WITH b AS (${Queries.birthsSql}),
         |ages AS (
         |  SELECT year(DATE '2024-06-15') - year(birth)
         |    - CASE WHEN month(DATE '2024-06-15') * 100 + day(DATE '2024-06-15')
         |             < month(birth) * 100 + day(birth) THEN 1 ELSE 0 END AS age
         |  FROM b
         |)
         |SELECT CASE
         |    $cases
         |    ELSE '${labels.last}' END AS age_group,
         |  count(*) AS n
         |FROM ages GROUP BY 1
         |""".stripMargin
    }
  )
}
