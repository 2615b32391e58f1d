package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.core.Tables
import graft.operators.Rolling
import graft.streaming.{Sessions, Windows}

/** Event-stream operators in batch form (streaming parity is covered by
  * the EventsStream specs). */
object EventsPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_events_window" -> ((s, dir) =>
      Windows.tumbling(
        Tables.events(s, dir), "ts", "1 hour", Seq("event_type"),
        Seq(count(lit(1)).as("n"),
          sum(round(col("value") * 100, 0).cast("long")).as("sum_cents")))
        .select(
          col("window_start").cast("string").as("window_start"),
          col("event_type"), col("n"), col("sum_cents"))),

    "q28_sessionize" -> ((s, dir) =>
      Sessions.aggregate(
        Tables.events(s, dir)
          .withColumn("ts_us", unix_micros(col("ts"))),
        "user_id", "ts_us", "event_id", gapSeconds = 1800)),

    // exact SLA latency quantiles: p50/p90/p99 of same-type inter-
    // event gaps per event_type, resolved through ONE multi-target
    // valueAtRanks call (bucket-histogram ranks, no per-type sort);
    // gap derivation is a (user, type)-partitioned lag window
    "q143_latency_quantiles" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("ts_us", unix_micros(col("ts")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts_us"), col("event_id"))
      val gaps = e.withColumn("__prev", lag(col("ts_us"), 1).over(w))
        .filter(col("__prev").isNotNull)
        .select(col("event_type"),
          (col("ts_us") - col("__prev")).as("gap"))
      graft.operators.Selection.valueAtRanks(gaps, "event_type", "gap",
        Seq(
          "p50" -> "greatest(1L, (__n * 50L) div 100L)",
          "p90" -> "greatest(1L, (__n * 90L) div 100L)",
          "p99" -> "greatest(1L, (__n * 99L) div 100L)"))
    }),

    // time-constrained sequential funnel (windowFunnel): deepest of
    // view -> click -> purchase reached per user, each step within
    // 30 min of the previous, first-match semantics — a pure min-
    // recurrence, exact integers, no per-user ordered traversal
    "q140_window_funnel" -> ((s, dir) =>
      graft.operators.Funnels.windowFunnel(
        Tables.events(s, dir)
          .withColumn("ts_us", unix_micros(col("ts"))),
        "user_id", "ts_us", "event_type",
        Seq("view", "click", "purchase"),
        windowUs = 1800L * 1000000)),

    // top-20 in-session event trigrams (the "common user journeys"
    // report): lead() over the session window, partial-agg count,
    // TakeOrdered cut with a fully deterministic tie order
    "q138_event_paths" -> ((s, dir) =>
      graft.streaming.Paths.topTrigrams(
        Tables.events(s, dir)
          .withColumn("ts_us", unix_micros(col("ts"))),
        "user_id", "ts_us", "event_id", "event_type",
        gapSeconds = 1800, k = 20)),

    // temporal split with a 1-day purge embargo: earliest 80% of
    // events by time are train, the embargo day after the exact
    // rank-resolved cut is excluded, the rest is test — the
    // leakage-safe time-series split; labels hash-check from the
    // tie-invariant cut value
    "q146_temporal_split" -> ((s, dir) =>
      graft.operators.Splits.temporalSplit(
        Tables.events(s, dir)
          .select(col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("ts_us")),
        "ts_us", trainBp = 8000, embargoUs = 86400L * 1000000)
        .select(col("event_id"), col("event_type"), col("split"))),

    // two-sided exact-integer CUSUM drift statistic per event type:
    // first 7 observed days are the reference, later days accumulate
    // cross-multiplied deviations — the change-point detector, all
    // integer so the whole series hash-checks
    "q147_cusum" -> ((s, dir) =>
      Rolling.cusum(Tables.events(s, dir), "event_type", "ts",
        refDays = 7)
        .select(col("event_type"), col("date").cast("string").as("date"),
          col("n"), col("s_up"), col("s_dn"))),

    // index of dispersion (Fano factor) of each event type's daily
    // count series in basis points — burstiness next to q147's CUSUM
    // level shifts; cross-multiplied exact integers on decimal(38,0)
    "q155_dispersion" -> ((s, dir) =>
      graft.operators.Profile.dispersionIndex(
        Tables.events(s, dir), "event_type", "ts")),

    // first-order in-session Markov transition matrix: (from, to)
    // event-type counts + row-normalized probability in basis points
    // — "what users do next"; session gap 30 min, all integer
    "q148_transitions" -> ((s, dir) =>
      graft.streaming.Paths.transitionMatrix(
        Tables.events(s, dir)
          .withColumn("ts_us", unix_micros(col("ts"))),
        "user_id", "ts_us", "event_id", "event_type",
        gapSeconds = 1800)),

    // exact lower-median per group via distributed rank-pick (engine-
    // portable, no interpolation-semantics ambiguity). Selection
    // resolves the rank on bucket histograms — no full-group sort, so
    // a dominant event_type can't serialize the job.
    "q44_group_median" -> ((s, dir) =>
      graft.operators.Selection.valueAtRanks(
        Tables.events(s, dir)
          .select(col("event_type"),
            round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents",
        Seq("median" -> "(__n + 1) div 2"))
        .select(col("event_type"), col("value").as("median_cents"))),

    "q43_rolling_features" -> ((s, dir) =>
      Rolling.trailing(
        Tables.events(s, dir).withColumn("d", to_date(col("ts"))),
        "user_id", "d",
        round(col("value") * 100, 0).cast("long"), days = 7)
        .select(col("user_id"), col("date").cast("string").as("date"),
          col("n"), col("cents"), col("n_7d"), col("cents_7d"))),

    // Semi-structured extraction: typed from_json over the props JSON
    // column (schema'd parse — one vectorized pass, stays in codegen),
    // then an integer aggregate per (event_type, k-bucket).
    "q48_json_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
            .getField("k").as("k"))
        .groupBy(col("event_type"), expr("k div 10").as("k_bucket"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("k_min"),
          max(col("k")).as("k_max"))),

    "q41_cohort_retention" -> ((s, dir) => {
      val weekly = Tables.events(s, dir).select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("w")).distinct()
      val firsts = weekly.groupBy("user_id")
        .agg(min(col("w")).as("cohort_w"))
      weekly.join(firsts, "user_id")
        .withColumn("k", expr("datediff(w, cohort_w) div 7").cast("int"))
        .groupBy(col("cohort_w").cast("string").as("cohort_week"), col("k"))
        .agg(count_distinct(col("user_id")).as("n_users"))
    }),

    // trailing 7-day active users: exact distinct over a rolling window
    // is not window-expressible — each (user, day) contributes to the 7
    // trailing dates (bounded explode), then one distinct-count per day
    "q61_trailing_dau" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
        .withColumn("date",
          explode(sequence(col("d"), date_add(col("d"), 6))))
        .groupBy("date")
        .agg(count_distinct(col("user_id")).as("dau7"))
        .select(col("date").cast("string").as("date"), col("dau7"))),

    // funnel step conversion: clicks within 10 minutes after a view by
    // the same user, per day — per-user equi-join with a time bound,
    // clicks deduped by event id so fanout cannot double count
    "q62_funnel" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      // both legs derive from the same scan: rename the join key on each
      // side so the equi-join predicate never needs Spark's dataset-id
      // self-join disambiguation (which can silently degrade to a cross
      // join if the heuristic misses)
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("click_id"))
      val converted = clicks.join(views,
        col("c_user") === col("v_user") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"))
        .select(col("click_id"), to_date(col("c_ts")).as("date"))
        .distinct()
      val perDayClicks = clicks
        .groupBy(to_date(col("c_ts")).as("date"))
        .agg(count(lit(1)).as("n_clicks"))
      converted.groupBy("date")
        .agg(count(lit(1)).as("n_converted"))
        .join(perDayClicks, Seq("date"), "right")
        .select(col("date").cast("string").as("date"),
          coalesce(col("n_converted"), lit(0L)).as("n_converted"),
          col("n_clicks"))
    }),

    // exact-integer EWMA trend per event type (α=1/4 at 256× scale):
    // a sequential recurrence folded once per group — oracle-checked
    // against DuckDB's independent WITH RECURSIVE formulation
    "q95_ewma" -> ((s, dir) =>
      Rolling.ewmaDaily(Tables.events(s, dir), "event_type", "ts")
        .select(col("event_type"), col("date").cast("string").as("date"),
          col("n"), col("ewma_scaled"))),

    // exact OLS drift fit of the daily count series per event type:
    // slope/intercept as integer numerator-denominator pairs
    "q97_trend_fit" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Profile.trendFit(daily, "event_type", "day", "cnt")
    }),

    // leakage-safe split: every USER's events land in one split (a
    // row-hash split would let one user's near-identical events
    // straddle train and eval); manifest of achieved proportions
    "q100_group_split" -> ((s, dir) =>
      graft.operators.Splits.splitByGroup(
          Tables.events(s, dir).select(col("user_id"), col("event_id")),
          "user_id", Seq("train" -> 80, "val" -> 10, "test" -> 10),
          seed = "gs")
        .groupBy(col("split"))
        .agg(count_distinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_rows")))
  )

  def oracleSql: Map[String, String] = Map(
    "q155_dispersion" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(x) AS BIGINT) AS total,
        |    CAST(sum(x * x) AS BIGINT) AS sq
        |  FROM d GROUP BY 1
        |)
        |SELECT event_type, n_days, total,
        |  CAST(CAST(10000 AS HUGEINT) *
        |    (n_days * CAST(sq AS HUGEINT) - CAST(total AS HUGEINT) * total)
        |    // (n_days * CAST(total AS HUGEINT)) AS BIGINT) AS fano_bp
        |FROM g""".stripMargin,

    // q146: the cut is the VALUE at rank greatest(1, n*8000 div 10000)
    // ascending — tie-invariant, so row_number's tie order is moot
    "q146_temporal_split" ->
      """WITH v AS (
        |  SELECT event_id, event_type, epoch_us(ts) AS us FROM events
        |),
        |r AS (
        |  SELECT us, row_number() OVER (ORDER BY us) AS rn,
        |    count(*) OVER () AS n
        |  FROM v
        |),
        |c AS (
        |  SELECT us AS cut FROM r
        |  WHERE rn = greatest(1, (n * 8000) // 10000)
        |)
        |SELECT event_id, event_type,
        |  CASE WHEN us <= c.cut THEN 'train'
        |       WHEN us > c.cut + 86400000000 THEN 'test'
        |       ELSE 'embargo' END AS split
        |FROM v, c""".stripMargin,

    // q147: identical window formulation — cumsum of cross-multiplied
    // deviations, closed-form one-sided CUSUMs from running min/max
    "q147_cusum" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS date, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY date) AS rn
        |  FROM d
        |),
        |ref AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS refn,
        |    CAST(sum(n) AS BIGINT) AS refsum
        |  FROM r WHERE rn <= 7 GROUP BY 1
        |),
        |m AS (
        |  SELECT r.event_type, r.date, r.n,
        |    ref.refn * r.n - ref.refsum AS dd
        |  FROM r JOIN ref USING (event_type) WHERE r.rn > 7
        |),
        |c AS (
        |  SELECT event_type, date, n,
        |    CAST(sum(dd) OVER w AS BIGINT) AS cc
        |  FROM m
        |  WINDOW w AS (PARTITION BY event_type ORDER BY date
        |    ROWS UNBOUNDED PRECEDING)
        |)
        |SELECT event_type, CAST(date AS VARCHAR) AS date,
        |  CAST(n AS BIGINT) AS n,
        |  CAST(cc - least(0, min(cc) OVER w) AS BIGINT) AS s_up,
        |  CAST(greatest(0, max(cc) OVER w) - cc AS BIGINT) AS s_dn
        |FROM c
        |WINDOW w AS (PARTITION BY event_type ORDER BY date
        |  ROWS UNBOUNDED PRECEDING)""".stripMargin,

    // q148: q28's sessionization CTE, one lead, pair counts + floored
    // bp normalization over the aggregated matrix
    "q148_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events
        |),
        |l AS (
        |  SELECT user_id, event_id, event_type, ts_us,
        |    lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |      AS prev
        |  FROM e
        |),
        |s AS (
        |  SELECT user_id, event_id, event_type, ts_us,
        |    sum(CASE WHEN prev IS NULL OR ts_us - prev > 1800000000
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
        |      AS session_idx
        |  FROM l
        |),
        |p AS (
        |  SELECT event_type AS "from",
        |    lead(event_type, 1) OVER (PARTITION BY user_id, session_idx
        |      ORDER BY ts_us, event_id) AS "to"
        |  FROM s
        |),
        |m AS (
        |  SELECT "from", "to", CAST(count(*) AS BIGINT) AS cnt
        |  FROM p WHERE "to" IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT "from", "to", cnt,
        |  CAST((cnt * 10000) // CAST(sum(cnt) OVER
        |    (PARTITION BY "from") AS BIGINT) AS BIGINT) AS p_bp
        |FROM m""".stripMargin,

    "q100_group_split" ->
      """WITH a AS (
        |  SELECT user_id, event_id,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|gs'),
        |      1, 8)) AS BIGINT) % 100 AS b
        |  FROM events
        |)
        |SELECT CASE WHEN b < 80 THEN 'train'
        |            WHEN b < 90 THEN 'val'
        |            ELSE 'test' END AS split,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM a GROUP BY 1
        |""".stripMargin,

    "q97_trend_fit" ->
      """WITH d0 AS (
        |  SELECT event_type,
        |    CAST(ts AS DATE) - DATE '1970-01-01' AS day,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |), d AS (
        |  -- x centered at the per-group minimum, like the operator
        |  SELECT event_type,
        |    day - min(day) OVER (PARTITION BY event_type) AS day, cnt
        |  FROM d0
        |), s AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(day) AS sx, sum(cnt) AS sy,
        |    sum(day * cnt) AS sxy, sum(day * day) AS sxx
        |  FROM d GROUP BY 1
        |)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
        |  CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
        |  CAST(sy * sxx - sx * sxy AS BIGINT) AS intercept_num
        |FROM s
        |""".stripMargin,

    "q95_ewma" ->
      """WITH RECURSIVE d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS date, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), o AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY date) AS rn
        |  FROM d
        |), r AS (
        |  SELECT event_type, date, n, rn, n * 256 AS ew
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.event_type, o.date, o.n, o.rn,
        |    (r.ew * 3 + o.n * 256) // 4
        |  FROM o JOIN r ON o.event_type = r.event_type
        |    AND o.rn = r.rn + 1
        |)
        |SELECT event_type, CAST(date AS VARCHAR) AS date,
        |  CAST(n AS BIGINT) AS n, CAST(ew AS BIGINT) AS ewma_scaled
        |FROM r
        |""".stripMargin,

    "q62_funnel" ->
      """WITH v AS (
        |  SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'
        |),
        |c AS (
        |  SELECT user_id, ts AS c_ts, event_id AS click_id
        |  FROM events WHERE event_type = 'click'
        |),
        |conv AS (
        |  SELECT DISTINCT c.click_id, CAST(c.c_ts AS DATE) AS date
        |  FROM c JOIN v ON c.user_id = v.user_id
        |    AND c.c_ts >= v.v_ts
        |    AND c.c_ts <= v.v_ts + INTERVAL 10 MINUTE
        |),
        |pd AS (
        |  SELECT CAST(c_ts AS DATE) AS date,
        |    CAST(count(*) AS BIGINT) AS n_clicks
        |  FROM c GROUP BY 1
        |)
        |SELECT CAST(pd.date AS VARCHAR) AS date,
        |  CAST(coalesce(cv.n_converted, 0) AS BIGINT) AS n_converted,
        |  pd.n_clicks
        |FROM pd LEFT JOIN (
        |  SELECT date, CAST(count(*) AS BIGINT) AS n_converted
        |  FROM conv GROUP BY 1
        |) cv ON cv.date = pd.date""".stripMargin,

    "q61_trailing_dau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        |),
        |x AS (
        |  SELECT user_id, d + CAST(i AS INT) AS date FROM ud, range(0, 7) t(i)
        |)
        |SELECT CAST(date AS VARCHAR) AS date,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS dau7
        |FROM x GROUP BY date""".stripMargin,

    "q27_events_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q44_group_median" ->
      """WITH t AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |),
        |r AS (
        |  SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM t
        |)
        |SELECT event_type, cents AS median_cents
        |FROM r WHERE rn = (n + 1) // 2""".stripMargin,

    "q43_rolling_features" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS date, count(*) AS n,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
        |    CAST(ts AS DATE) - DATE '1970-01-01' AS dnum
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT user_id, CAST(date AS VARCHAR) AS date, n, cents,
        |  CAST(sum(n) OVER (PARTITION BY user_id ORDER BY dnum
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d,
        |  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY dnum
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cents_7d
        |FROM daily""".stripMargin,

    "q48_json_extract" ->
      """SELECT event_type,
        |  CAST(props->>'$.k' AS BIGINT) // 10 AS k_bucket,
        |  count(*) AS n,
        |  min(CAST(props->>'$.k' AS BIGINT)) AS k_min,
        |  max(CAST(props->>'$.k' AS BIGINT)) AS k_max
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q41_cohort_retention" ->
      """WITH weekly AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
        |  FROM events
        |),
        |firsts AS (
        |  SELECT user_id, min(w) AS cohort_w FROM weekly GROUP BY 1
        |)
        |SELECT CAST(f.cohort_w AS VARCHAR) AS cohort_week,
        |  CAST((weekly.w - f.cohort_w) // 7 AS INT) AS k,
        |  count(DISTINCT weekly.user_id) AS n_users
        |FROM weekly JOIN firsts f ON weekly.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin,

    // q143: value at rank k = greatest(1, n*pct div 100) ascending —
    // identical rank arithmetic to valueAtRanks; row_number tie order
    // is irrelevant because the VALUE at a rank is tie-invariant
    "q143_latency_quantiles" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts
        |  FROM events
        |),
        |g AS (
        |  SELECT event_type, ts - lag(ts) OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY ts, event_id) AS gap
        |  FROM e),
        |gg AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL),
        |r AS (SELECT event_type, gap,
        |  row_number() OVER (PARTITION BY event_type ORDER BY gap) AS rk,
        |  count(*) OVER (PARTITION BY event_type) AS n
        |  FROM gg),
        |t AS (SELECT * FROM (
        |  VALUES ('p50', 50), ('p90', 90), ('p99', 99)) q(label, pct))
        |SELECT r.event_type, t.label, CAST(r.gap AS BIGINT) AS value,
        |  CAST(r.n AS BIGINT) AS n
        |FROM r JOIN t ON r.rk = greatest(1, (r.n * t.pct) // 100)""".stripMargin,

    // q140: the same min-recurrence as chained aggregates; each step
    // joins only that step's events against the previous step's times
    "q140_window_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts FROM events
        |),
        |s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1
        |),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |    AND e.ts - s1.t1 <= 1800000000
        |  GROUP BY 1
        |),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |    AND e.ts - s2.t2 <= 1800000000
        |  GROUP BY 1
        |)
        |SELECT s1.user_id, s1.t1 AS t1,
        |  coalesce(s2.t2, -1) AS t2, coalesce(s3.t3, -1) AS t3,
        |  CAST(1 + CASE WHEN s2.t2 IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN s3.t3 IS NULL THEN 0 ELSE 1 END AS BIGINT)
        |    AS stage
        |FROM s1 LEFT JOIN s2 USING (user_id)
        |LEFT JOIN s3 USING (user_id)""".stripMargin,

    // q138: q28's sessionization CTE carrying event_type, then two
    // leads over the (user, session) window; the LIMIT cut is safe
    // because the ORDER BY is a total order on both engines
    "q138_event_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events
        |),
        |l AS (
        |  SELECT user_id, event_id, event_type, ts_us,
        |    lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |      AS prev
        |  FROM e
        |),
        |f AS (
        |  SELECT user_id, event_id, event_type, ts_us,
        |    CASE WHEN prev IS NULL OR ts_us - prev > 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM l
        |),
        |s AS (
        |  SELECT user_id, event_id, event_type, ts_us,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM f
        |),
        |g AS (
        |  SELECT event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id, session_idx
        |      ORDER BY ts_us, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id, session_idx
        |      ORDER BY ts_us, event_id) AS e3
        |  FROM s
        |)
        |SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS cnt
        |FROM g WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY cnt DESC, e1, e2, e3
        |LIMIT 20""".stripMargin,

    "q28_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        |),
        |l AS (
        |  SELECT user_id, ts_us,
        |    lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |      AS prev
        |  FROM e
        |),
        |f AS (
        |  SELECT user_id, ts_us,
        |    CASE WHEN prev IS NULL OR ts_us - prev > 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM l
        |),
        |s AS (
        |  SELECT user_id, ts_us,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
        |      ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM f
        |)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  count(*) AS n_events, min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM s GROUP BY 1, 2""".stripMargin
  )
}
