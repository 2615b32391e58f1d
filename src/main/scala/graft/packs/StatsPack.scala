package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.core.Tables
import graft.operators.{Eval, Funnels, Profile, Rolling, Survival}

/** Exact-integer statistics & evaluation: ROC-AUC, Kaplan–Meier
  * survival, central moments, k-anonymity, conversion attribution,
  * Benford audit, Cohen's kappa, seasonal decomposition. Every query
  * is fixed-point integer arithmetic with an explicit division order,
  * so DuckDB reproduces each result bit-for-bit. */
object StatsPack extends QueryPack {

  private val AttributionWindowUs = 7L * 86400L * 1000000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact tie-aware ROC-AUC of "doc length predicts English" per
    // source — rank-sum over score-value tallies, never a global sort
    "q157_auc" -> ((s, dir) =>
      Eval.rocAuc(Tables.load(s, dir, "documents")
          .withColumn("__lbl", when(col("lang") === "en", 1).otherwise(0)),
        "source", "n_chars", "__lbl")),

    // Kaplan–Meier time-to-first-purchase per user cohort, days from
    // first event; users without a purchase censor at their last event
    "q158_survival" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("ts_us", unix_micros(col("ts")))
      val perUser = e.groupBy(col("user_id"))
        .agg(min(col("ts_us")).as("__t0"),
          min(when(col("event_type") === "purchase", col("ts_us")))
            .as("__fp"),
          max(col("ts_us")).as("__tl"))
        .select(
          concat(lit("c"), pmod(col("user_id"), lit(2)).cast("string"))
            .as("cohort"),
          expr("(coalesce(__fp, __tl) - __t0) div 86400000000")
            .as("dur"),
          when(col("__fp").isNotNull, 1).otherwise(0).as("ev"))
      Survival.kaplanMeier(perUser, "cohort", "dur", "ev")
    }),

    // exact central moments (mean/var/m3/m4, fixed point) of quantity
    "q159_moments" -> ((s, dir) =>
      Profile.moments(Tables.load(s, dir, "lineitem"),
        "l_returnflag", "l_quantity")),

    // k-anonymity audit over (segment, nation, balance-bucket); the
    // +10^9-cent offset keeps the bucket division on positive ints
    "q160_k_anonymity" -> ((s, dir) =>
      Profile.kAnonymity(Tables.load(s, dir, "customer")
          .select(col("c_mktsegment"), col("c_nationkey"),
            expr("(cast(round(c_acctbal*100) as bigint) + 1000000000) div 100000")
              .as("bal_bucket")),
        Seq("c_mktsegment", "c_nationkey", "bal_bucket"), k = 5)),

    // last-touch attribution: purchases credited to the latest
    // click/view/signup strictly before them, 7-day lookback
    "q161_attribution" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("ts_us", unix_micros(col("ts")))
      val conv = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"),
          expr("cast(round(value*100) as long)").as("cents"))
      val tch = e.filter(col("event_type").isin("click", "view", "signup"))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("event_type").as("chan"))
      Funnels.lastTouch(conv, tch, "user_id", "ts_us", "event_id",
          "chan", AttributionWindowUs)
        .groupBy(coalesce(col("channel"), lit("organic")).as("channel"))
        .agg(count(lit(1)).as("n_conv"),
          sum(col("cents")).as("revenue_cents"))
    }),

    // Benford first-digit audit of order totals (cents) per priority
    "q162_benford" -> ((s, dir) =>
      Profile.benford(Tables.load(s, dir, "orders")
          .select(col("o_orderpriority"),
            expr("cast(round(o_totalprice*100) as bigint)").as("cents")),
        "o_orderpriority", "cents")),

    // Cohen's kappa between two deterministic doc-quality raters
    "q163_kappa" -> ((s, dir) =>
      Eval.cohenKappa(Tables.load(s, dir, "documents"), "lang",
        col("n_chars") >= 300,
        expr("length(text) - length(replace(text, ' ', ''))") >= 60)),

    // day-of-week seasonal baseline + deseasonalized residuals of the
    // per-event-type daily count series
    "q164_seasonality" -> ((s, dir) =>
      Rolling.seasonalProfile(Tables.events(s, dir), "event_type", "ts")
        .select(col("event_type"), col("date").cast("string").as("d"),
          col("isodow"), col("n"), col("expected_fp"),
          col("residual_fp"))),
  )

  private val benfordCase: String =
    (1 to 9).zip(Profile.BenfordFp)
      .map { case (d, p) => s"WHEN $d THEN $p" }.mkString(" ")

  def oracleSql: Map[String, String] = Map(
    "q157_auc" ->
      """WITH b AS (
        |  SELECT source, n_chars AS s,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS neg
        |  FROM documents GROUP BY 1, 2),
        |c AS (
        |  SELECT source, pos, neg,
        |    CAST(COALESCE(sum(neg) OVER (PARTITION BY source ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cneg
        |  FROM b),
        |a AS (
        |  SELECT source, CAST(sum(pos) AS BIGINT) AS n_pos,
        |    CAST(sum(neg) AS BIGINT) AS n_neg,
        |    CAST(sum(pos * (2 * cneg + neg)) AS HUGEINT) AS u2
        |  FROM c GROUP BY 1)
        |SELECT source, n_pos, n_neg,
        |  CAST((1000000 * u2) // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT) AS auc_fp
        |FROM a WHERE n_pos > 0 AND n_neg > 0""".stripMargin,

    "q158_survival" ->
      """WITH RECURSIVE per_user AS (
        |  SELECT 'c' || CAST(user_id % 2 AS VARCHAR) AS g,
        |    (epoch_us(coalesce(min(ts) FILTER (WHERE event_type = 'purchase'),
        |                       max(ts))) - epoch_us(min(ts))) // 86400000000 AS t,
        |    CASE WHEN min(ts) FILTER (WHERE event_type = 'purchase') IS NOT NULL
        |      THEN 1 ELSE 0 END AS ev
        |  FROM events GROUP BY user_id),
        |agg AS (
        |  SELECT g, t, CAST(sum(ev) AS BIGINT) AS d,
        |    CAST(sum(1 - ev) AS BIGINT) AS c
        |  FROM per_user GROUP BY 1, 2),
        |ser AS (
        |  SELECT g, t, d, c,
        |    CAST(sum(d + c) OVER (PARTITION BY g ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(d + c) OVER (PARTITION BY g) AS BIGINT) AS tot,
        |    CAST(row_number() OVER (PARTITION BY g ORDER BY t) AS BIGINT) AS idx
        |  FROM agg),
        |s2 AS (
        |  SELECT g, t, d, c, tot - cum + d + c AS n_risk, idx FROM ser),
        |km AS (
        |  SELECT g, idx, t, n_risk, d, c,
        |    CAST((1000000 * (n_risk - d)) // n_risk AS BIGINT) AS surv_fp
        |  FROM s2 WHERE idx = 1
        |  UNION ALL
        |  SELECT s.g, s.idx, s.t, s.n_risk, s.d, s.c,
        |    CAST((km.surv_fp * (s.n_risk - s.d)) // s.n_risk AS BIGINT)
        |  FROM km JOIN s2 s ON s.g = km.g AND s.idx = km.idx + 1)
        |SELECT g AS cohort, t, n_risk, d AS n_event, c AS n_censor, surv_fp
        |FROM km""".stripMargin,

    "q159_moments" ->
      """WITH v AS (
        |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS val
        |  FROM lineitem),
        |m AS (SELECT g, min(val) AS mn FROM v GROUP BY 1),
        |sh AS (SELECT v.g, v.val - m.mn AS x, m.mn AS mn
        |       FROM v JOIN m USING (g)),
        |p AS (
        |  SELECT g, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(min(mn) AS HUGEINT) AS mn,
        |    CAST(sum(x) AS HUGEINT) AS s1, CAST(sum(x*x) AS HUGEINT) AS s2,
        |    CAST(sum(x*x*x) AS HUGEINT) AS s3,
        |    CAST(sum(x*x*x*x) AS HUGEINT) AS s4
        |  FROM sh GROUP BY 1)
        |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN mn*n + s1 >= 0
        |    THEN (10000 * (mn*n + s1)) // n
        |    ELSE -((10000 * -(mn*n + s1)) // n) END AS BIGINT) AS mean_fp,
        |  CAST((10000 * (n*s2 - s1*s1)) // (n*n) AS BIGINT) AS var_fp,
        |  CAST(CASE WHEN n*n*s3 - 3*n*s1*s2 + 2*s1*s1*s1 >= 0
        |    THEN (10000 * (n*n*s3 - 3*n*s1*s2 + 2*s1*s1*s1)) // (n*n*n)
        |    ELSE -((10000 * -(n*n*s3 - 3*n*s1*s2 + 2*s1*s1*s1)) // (n*n*n))
        |    END AS BIGINT) AS m3_fp,
        |  CAST((10000 * (n*n*n*s4 - 4*n*n*s1*s3 + 6*n*s1*s1*s2 -
        |    3*s1*s1*s1*s1)) // (n*n*n*n) AS BIGINT) AS m4_fp
        |FROM p""".stripMargin,

    "q160_k_anonymity" ->
      """WITH q AS (
        |  SELECT c_mktsegment, c_nationkey,
        |    (CAST(round(c_acctbal * 100) AS BIGINT) + 1000000000) // 100000
        |      AS bal_bucket
        |  FROM customer)
        |SELECT c_mktsegment, c_nationkey, bal_bucket,
        |  CAST(count(*) AS BIGINT) AS group_size,
        |  count(*) < 5 AS at_risk
        |FROM q GROUP BY 1, 2, 3""".stripMargin,

    "q161_attribution" ->
      s"""WITH conv AS (
         |  SELECT event_id, user_id, ts, value FROM events
         |  WHERE event_type = 'purchase'),
         |tch AS (
         |  SELECT event_id, user_id, ts, event_type FROM events
         |  WHERE event_type IN ('click', 'view', 'signup')),
         |att AS (
         |  SELECT c.event_id, c.value,
         |    (SELECT t.event_type FROM tch t
         |     WHERE t.user_id = c.user_id AND t.ts < c.ts
         |       AND epoch_us(c.ts) - epoch_us(t.ts) <= $AttributionWindowUs
         |     ORDER BY t.ts DESC, t.event_id DESC LIMIT 1) AS channel
         |  FROM conv c)
         |SELECT coalesce(channel, 'organic') AS channel,
         |  CAST(count(*) AS BIGINT) AS n_conv,
         |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         |    AS revenue_cents
         |FROM att GROUP BY 1""".stripMargin,

    "q162_benford" ->
      s"""WITH vals AS (
         |  SELECT o_orderpriority AS g,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
         |  FROM orders
         |  WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0),
         |d AS (
         |  SELECT g, CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
         |    CAST(count(*) AS BIGINT) AS n_digit
         |  FROM vals GROUP BY 1, 2),
         |t AS (SELECT g, CAST(sum(n_digit) AS BIGINT) AS n FROM d GROUP BY 1),
         |j AS (
         |  SELECT d.g, d.digit, d.n_digit, t.n,
         |    CASE d.digit $benfordCase END AS p_fp
         |  FROM d JOIN t USING (g))
         |SELECT g AS o_orderpriority, digit, n_digit, n, p_fp,
         |  CAST(((1000000 * CAST(n_digit AS HUGEINT) - CAST(n AS HUGEINT) * p_fp) *
         |        (1000000 * CAST(n_digit AS HUGEINT) - CAST(n AS HUGEINT) * p_fp))
         |    // (CAST(n AS HUGEINT) * p_fp) // 1000000 AS BIGINT) AS chi2_fp
         |FROM j""".stripMargin,

    "q163_kappa" ->
      """WITH r AS (
        |  SELECT lang,
        |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
        |    CASE WHEN length(text) - length(replace(text, ' ', '')) >= 60
        |      THEN 1 ELSE 0 END AS b
        |  FROM documents),
        |g AS (
        |  SELECT lang, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS HUGEINT) AS agree,
        |    CAST(sum(a) AS HUGEINT) AS a1, CAST(sum(b) AS HUGEINT) AS b1
        |  FROM r GROUP BY 1),
        |k AS (
        |  SELECT lang, n, agree,
        |    n * agree - (a1*b1 + (n-a1)*(n-b1)) AS num,
        |    n * n - (a1*b1 + (n-a1)*(n-b1)) AS den
        |  FROM g)
        |SELECT lang, CAST(n AS BIGINT) AS n, CAST(agree AS BIGINT) AS n_agree,
        |  CAST(CASE WHEN den = 0 THEN NULL
        |    WHEN num >= 0 THEN (1000000 * num) // den
        |    ELSE -((1000000 * (-num)) // den) END AS BIGINT) AS kappa_fp
        |FROM k""".stripMargin,

    "q164_seasonality" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS dd,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |dw AS (
        |  SELECT event_type, dd, n, CAST(isodow(dd) AS INT) AS isodow
        |  FROM daily),
        |base AS (
        |  SELECT event_type, isodow,
        |    CAST((10000 * CAST(sum(n) AS HUGEINT)) //
        |      CAST(count(*) AS HUGEINT) AS BIGINT) AS expected_fp
        |  FROM dw GROUP BY 1, 2)
        |SELECT dw.event_type, CAST(dw.dd AS VARCHAR) AS d, dw.isodow, dw.n,
        |  base.expected_fp, 10000 * dw.n - base.expected_fp AS residual_fp
        |FROM dw JOIN base USING (event_type, isodow)""".stripMargin,
  )
}
