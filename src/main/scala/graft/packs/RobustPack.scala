package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.core.{Intervals, Tables}
import graft.operators.{Chunking, Eval, Graph, Profile, Rolling,
  Splits, Survival, TextAnalysis}

/** Robust / nonparametric statistics, interval algebra, seeded graph
  * centrality, and training-export plumbing (round-10 additions).
  * Every query is fixed-point integer or exact string/date work with a
  * declared operation order, so DuckDB reproduces each bit-for-bit. */
object RobustPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pettitt changepoint of each event type's daily count series —
    // rank-identity increments + day-ordered cumsum, no pair join
    "q240_pettitt" -> ((s, dir) =>
      Rolling.pettitt(Tables.events(s, dir), "event_type", "ts")),

    // Mann-Kendall S + Theil-Sen slope of daily revenue cents per
    // event type — day-pair join quadratic in DAYS, median from a
    // distinct-slope tally cumsum
    "q241_mann_kendall" -> ((s, dir) =>
      Rolling.mannKendall(Tables.events(s, dir), "event_type", "ts",
        expr("cast(round(value*100) as long)"))),

    // Hodges-Lehmann robust location of quantity per return flag —
    // Walsh-average median on value-cell tallies (quadratic in CELLS)
    "q242_hodges_lehmann" -> ((s, dir) =>
      Profile.hodgesLehmann(Tables.load(s, dir, "lineitem"),
        "l_returnflag", "l_quantity")),

    // Nelson-Aalen cumulative hazard, q158's exact cohort/duration
    // construction — floored per-step hazards, plain integer cumsum
    "q243_nelson_aalen" -> ((s, dir) => {
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
      Survival.nelsonAalen(perUser, "cohort", "dur", "ev")
    }),

    // Benjamini-Hochberg FDR gate over a deterministic portable-hash
    // p-value panel (doc_id%7 tests carry planted small p's) — the
    // step-up threshold resolved by exact cross-multiplication
    "q244_bh_fdr" -> ((s, dir) => {
      val tests = Tables.load(s, dir, "part")
        .filter(pmod(col("p_partkey"), lit(5)) === 0)
        .withColumn("__b", Splits.bucket(
          concat(lit("pv|"), col("p_partkey").cast("string")), 1000000))
        .withColumn("p_fp", when(pmod(col("p_partkey"), lit(7)) === 0,
            expr("__b div 1000")).otherwise(col("__b")))
        .select(col("p_partkey"), col("p_fp"))
      Eval.bhFdr(tests, "p_fp", alphaFp = 50000L)
        .select(col("p_partkey"), col("p_fp"), col("m"), col("k_star"),
          col("p_threshold_fp"), col("rejected"))
    }),

    // Allen's 13 interval relations over each order's line shipping
    // windows — per-key pair classification, exact date CASE ladder
    "q245_allen" -> ((s, dir) => {
      val iv = Tables.load(s, dir, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(3)) === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          to_date(col("l_shipdate")).as(Intervals.ValidFrom),
          date_add(to_date(col("l_shipdate")),
            (pmod(col("l_quantity").cast("int"), lit(5)) + 1))
            .as(Intervals.ValidUntil))
      Intervals.allenRelations(iv, Seq("l_orderkey"), "l_linenumber")
        .select(col("l_orderkey"), col("id_a").cast("long").as("id_a"),
          col("id_b").cast("long").as("id_b"), col("relation"))
    }),

    // harmonic closeness from a fixed low-suppkey seed panel over
    // the bipartite trade graph, 3 hops — per-seed BFS state
    "q246_closeness" -> ((s, dir) => {
      val pairs = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").cast("long").as("supp"),
          col("o_custkey").cast("long").as("cust"))
        .distinct()
      val edges = pairs.select(
          (col("supp") + 10000000L).as("src"),
          (col("cust") + 20000000L).as("dst"))
        .union(pairs.select((col("cust") + 20000000L).as("src"),
          (col("supp") + 10000000L).as("dst")))
      // SF-INVARIANT seed panel (the q260 posture): the low-key slice
      // is the SAME 16 seeds at every SF ≥ 0.01, never overflowing the
      // maxSeeds REQUIRE the way an s_nationkey predicate would
      val seeds = Tables.load(s, dir, "supplier")
        .filter(col("s_suppkey") <= 80 &&
          pmod(col("s_suppkey"), lit(5)) === 2)
        .select((col("s_suppkey").cast("long") + 10000000L).as("id"))
      Graph.closenessFromSeeds(edges, "src", "dst", seeds, "id",
        maxHops = 3)
    }),

    // token-shard binarization: portable md5 word ids packed as u16-BE
    // hex payloads, md5 sharding, exact byte offsets via the two-level
    // prefix-sum kernel (no per-shard sort)
    "q247_token_shards" -> ((s, dir) => {
      val ids = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          transform(TextAnalysis.words(col("text")),
            w => graft.functions.NativeExprs.portableBucket(w, 65536L)
              .cast("int")).as("__ids"))
      Chunking.binarizeTokenShards(ids, "doc_id", "__ids", shards = 8)
    }),

    // group-aware 5-fold CV assignment (portable md5 fold of the
    // seeded source key — every doc of a source in the same fold)
    "q248_kfold" -> ((s, dir) =>
      Splits.kfoldByGroup(Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source")),
        "source", k = 5, seed = "cv")),

    // canonical-URL dedup over a deterministic synthetic URL fixture
    // (mixed case, default ports, tracking params, fragments,
    // trailing slashes) — the full canonicalization chain both engines
    // run from the same pattern constants
    "q249_url_canon" -> ((s, dir) => {
      val urls = Tables.load(s, dir, "documents").select(col("doc_id"),
        concat(
          when(pmod(col("doc_id"), lit(3)) === 0, lit("HTTP://"))
            .otherwise(lit("https://")),
          lit("WWW."), col("source"), lit(".Example.COM"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit(":80"))
            .when(pmod(col("doc_id"), lit(3)) === 1, lit(":443"))
            .otherwise(lit("")),
          lit("/Path/"), pmod(col("doc_id"), lit(7)).cast("string"),
          when(pmod(col("doc_id"), lit(2)) === 0, lit("/"))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(4)) === 0,
              concat(lit("?utm_source=feed&id="),
                pmod(col("doc_id"), lit(13)).cast("string"),
                lit("&utm_campaign=x")))
            .when(pmod(col("doc_id"), lit(4)) === 1, lit("?ref=abc"))
            .when(pmod(col("doc_id"), lit(4)) === 2,
              concat(lit("?id="), pmod(col("doc_id"), lit(13))
                .cast("string"), lit("&fbclid=XYZ")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0, lit("#Frag"))
            .otherwise(lit(""))).as("url"))
      TextAnalysis.urlDedupStats(urls, "doc_id", "url")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q240_pettitt" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS date,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, n AS v, CAST(count(*) AS BIGINT) AS c
        |      FROM d GROUP BY 1, 2),
        |ct AS (
        |  SELECT event_type, v, c,
        |    CAST(COALESCE(SUM(c) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS lt,
        |    CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS nd
        |  FROM t),
        |dv AS (
        |  SELECT d.event_type, d.date, ct.nd,
        |    ct.nd - ct.c - 2 * ct.lt AS inc
        |  FROM d JOIN ct ON d.event_type = ct.event_type AND d.n = ct.v),
        |u AS (
        |  SELECT event_type, date, nd,
        |    CAST(SUM(inc) OVER (PARTITION BY event_type ORDER BY date
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS uu,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY date) AS BIGINT) AS rn
        |  FROM dv),
        |f AS (SELECT * FROM u WHERE rn < nd),
        |k AS (SELECT event_type, CAST(max(nd) AS BIGINT) AS n_days,
        |        CAST(max(abs(uu)) AS BIGINT) AS k_u
        |      FROM f GROUP BY 1),
        |cp AS (SELECT f.event_type, min(f.date) AS cpd
        |       FROM f JOIN k ON f.event_type = k.event_type
        |         AND abs(f.uu) = k.k_u
        |       GROUP BY 1)
        |SELECT k.event_type, k.n_days, CAST(cp.cpd AS VARCHAR) AS cp_date,
        |  k.k_u, f.uu AS u_cp
        |FROM k JOIN cp ON k.event_type = cp.event_type
        |JOIN f ON f.event_type = k.event_type AND f.date = cp.cpd
        |UNION ALL
        |SELECT event_type, CAST(1 AS BIGINT), CAST(NULL AS VARCHAR),
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        |FROM d GROUP BY event_type HAVING count(*) = 1""".stripMargin,

    "q241_mann_kendall" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS date,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type, b.v - a.v AS dy,
        |    CAST(b.date - a.date AS BIGINT) AS dx
        |  FROM d a JOIN d b
        |    ON a.event_type = b.event_type AND a.date < b.date),
        |s AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CASE WHEN dy > 0 THEN 1 WHEN dy < 0 THEN -1
        |      ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM p GROUP BY 1),
        |sl AS (
        |  SELECT event_type,
        |    CASE WHEN dy >= 0 THEN (dy * 1000000) // dx
        |      ELSE -(((-dy) * 1000000) // dx) END AS slope
        |  FROM p),
        |t AS (SELECT event_type, slope, CAST(count(*) AS BIGINT) AS c
        |      FROM sl GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, slope,
        |    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY slope
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ce
        |  FROM t),
        |m AS (
        |  SELECT c.event_type, CAST(min(c.slope) AS BIGINT) AS slope_fp
        |  FROM c JOIN s ON c.event_type = s.event_type
        |  WHERE c.ce >= (s.n_pairs + 1) // 2 GROUP BY 1),
        |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        |       FROM d GROUP BY 1)
        |SELECT nd.event_type, nd.n_days,
        |  COALESCE(s.n_pairs, 0) AS n_pairs,
        |  COALESCE(s.s_stat, 0) AS s_stat, m.slope_fp
        |FROM nd LEFT JOIN s ON nd.event_type = s.event_type
        |LEFT JOIN m ON nd.event_type = m.event_type""".stripMargin,

    "q242_hodges_lehmann" ->
      """WITH t AS (
        |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |p AS (
        |  SELECT a.g, a.v + b.v AS s,
        |    CASE WHEN a.v = b.v
        |      THEN (CAST(a.c AS HUGEINT) * (a.c + 1)) // 2
        |      ELSE CAST(a.c AS HUGEINT) * b.c END AS w
        |  FROM t a JOIN t b ON a.g = b.g AND a.v <= b.v),
        |ps AS (SELECT g, s, SUM(w) AS sw FROM p GROUP BY 1, 2),
        |tot AS (
        |  SELECT g, CAST(SUM(c) AS BIGINT) AS n,
        |    (CAST(SUM(c) AS HUGEINT) * (SUM(c) + 1)) // 2 AS pp
        |  FROM t GROUP BY 1),
        |cum AS (
        |  SELECT g, s, SUM(sw) OVER (PARTITION BY g ORDER BY s
        |    ROWS UNBOUNDED PRECEDING) AS ce
        |  FROM ps)
        |SELECT tot.g AS l_returnflag, tot.n,
        |  CAST(tot.pp AS BIGINT) AS n_pairs,
        |  CAST(min(cum.s) AS BIGINT) AS med_sum2,
        |  CAST(min(cum.s) * 500000 AS BIGINT) AS hl_fp
        |FROM cum JOIN tot ON cum.g = tot.g
        |WHERE cum.ce >= (tot.pp + 1) // 2
        |GROUP BY tot.g, tot.n, tot.pp""".stripMargin,

    "q243_nelson_aalen" ->
      """WITH per_user AS (
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
        |    CAST(sum(d + c) OVER (PARTITION BY g) AS BIGINT) AS tot
        |  FROM agg),
        |s2 AS (
        |  SELECT g, t, d, c, tot - cum + d + c AS n_risk FROM ser),
        |hz AS (
        |  SELECT g, t, n_risk, d, c,
        |    CAST((1000000 * d) // n_risk AS BIGINT) AS hazard_fp
        |  FROM s2)
        |SELECT g AS cohort, t, n_risk, d AS n_event, c AS n_censor,
        |  hazard_fp,
        |  CAST(SUM(hazard_fp) OVER (PARTITION BY g ORDER BY t
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumhaz_fp
        |FROM hz""".stripMargin,

    "q244_bh_fdr" ->
      """WITH t AS (
        |  SELECT p_partkey,
        |    ('0x' || substr(md5('pv|' || CAST(p_partkey AS VARCHAR)), 1, 8))
        |      ::BIGINT % 1000000 AS b
        |  FROM part WHERE p_partkey % 5 = 0),
        |p AS (
        |  SELECT p_partkey,
        |    CASE WHEN p_partkey % 7 = 0 THEN b // 1000 ELSE b END AS p_fp
        |  FROM t),
        |o AS (SELECT p_fp, CAST(count(*) AS BIGINT) AS c FROM p GROUP BY 1),
        |c AS (
        |  SELECT p_fp,
        |    CAST(SUM(c) OVER (ORDER BY p_fp ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS i,
        |    CAST(SUM(c) OVER () AS BIGINT) AS m
        |  FROM o),
        |cut AS (
        |  SELECT CAST(max(p_fp) AS BIGINT) AS pstar,
        |    CAST(max(i) AS BIGINT) AS kstar, CAST(max(m) AS BIGINT) AS mm
        |  FROM c
        |  WHERE CAST(p_fp AS HUGEINT) * m <= CAST(i AS HUGEINT) * 50000),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS mall FROM p)
        |SELECT p.p_partkey, p.p_fp,
        |  COALESCE(cut.mm, tot.mall) AS m,
        |  COALESCE(cut.kstar, 0) AS k_star,
        |  cut.pstar AS p_threshold_fp,
        |  CAST(CASE WHEN cut.pstar IS NOT NULL AND p.p_fp <= cut.pstar
        |    THEN 1 ELSE 0 END AS BIGINT) AS rejected
        |FROM p, cut, tot""".stripMargin,

    "q245_allen" ->
      """WITH iv AS (
        |  SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS f,
        |    CAST(l_shipdate AS DATE)
        |      + (CAST(l_quantity AS INTEGER) % 5 + 1) AS u
        |  FROM lineitem WHERE l_orderkey % 3 = 0),
        |p AS (
        |  SELECT a.l_orderkey, a.l_linenumber AS ia, b.l_linenumber AS ib,
        |    a.f AS af, a.u AS au, b.f AS bf, b.u AS bu
        |  FROM iv a JOIN iv b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_linenumber < b.l_linenumber)
        |SELECT l_orderkey, CAST(ia AS BIGINT) AS id_a,
        |  CAST(ib AS BIGINT) AS id_b,
        |  CASE WHEN af = bf AND au = bu THEN 'equal'
        |    WHEN au < bf THEN 'before' WHEN bu < af THEN 'after'
        |    WHEN au = bf THEN 'meets' WHEN bu = af THEN 'met_by'
        |    WHEN af = bf THEN
        |      CASE WHEN au < bu THEN 'starts' ELSE 'started_by' END
        |    WHEN au = bu THEN
        |      CASE WHEN af > bf THEN 'finishes' ELSE 'finished_by' END
        |    WHEN af > bf THEN
        |      CASE WHEN au < bu THEN 'during' ELSE 'overlapped_by' END
        |    ELSE CASE WHEN au > bu THEN 'contains' ELSE 'overlaps' END
        |  END AS relation
        |FROM p""".stripMargin,

    "q246_closeness" ->
      """WITH RECURSIVE
        |li AS (
        |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS supp,
        |    CAST(o_custkey AS BIGINT) AS cust
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (
        |  SELECT supp + 10000000 AS src, cust + 20000000 AS dst FROM li
        |  UNION ALL
        |  SELECT cust + 20000000, supp + 10000000 FROM li),
        |seeds AS (
        |  SELECT CAST(s_suppkey AS BIGINT) + 10000000 AS node
        |  FROM supplier WHERE s_suppkey <= 80 AND s_suppkey % 5 = 2),
        |walk AS (
        |  SELECT node AS seed, node, 0 AS hops FROM seeds
        |  WHERE node IN (SELECT src FROM e UNION SELECT dst FROM e)
        |  UNION
        |  SELECT walk.seed, e.dst, walk.hops + 1
        |  FROM walk JOIN e ON walk.node = e.src
        |  WHERE walk.hops < 3
        |),
        |d AS (SELECT seed, node, CAST(min(hops) AS BIGINT) AS h
        |      FROM walk GROUP BY 1, 2)
        |SELECT CAST(node AS BIGINT) AS node,
        |  CAST(count(*) AS BIGINT) AS n_reached,
        |  CAST(sum(h) AS BIGINT) AS sum_hops,
        |  CAST(sum(CASE WHEN h > 0 THEN 1000000 // h ELSE 0 END)
        |    AS BIGINT) AS harmonic_fp
        |FROM d GROUP BY node""".stripMargin,

    "q247_token_shards" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents),
        |pay AS (
        |  SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS n_tokens,
        |    CAST(2 * len(ws) AS BIGINT) AS n_bytes,
        |    COALESCE(array_to_string(list_transform(ws,
        |      x -> printf('%04x',
        |        ('0x' || substr(md5(x), 1, 8))::BIGINT % 65536)), ''),
        |      '') AS payload_hex
        |  FROM w),
        |sh AS (
        |  SELECT doc_id, n_tokens, n_bytes, payload_hex,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
        |      AS shard
        |  FROM pay)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens, n_bytes,
        |  CAST(COALESCE(SUM(n_bytes) OVER (PARTITION BY shard
        |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND 1 PRECEDING), 0) AS BIGINT) AS offset,
        |  CAST(SUM(n_bytes) OVER (PARTITION BY shard) AS BIGINT)
        |    AS shard_bytes,
        |  payload_hex
        |FROM sh""".stripMargin,

    "q248_kfold" ->
      """SELECT doc_id, source,
        |  ('0x' || substr(md5(source || '|cv'), 1, 8))::BIGINT % 5 AS fold
        |FROM documents""".stripMargin,

    "q249_url_canon" -> {
      import TextAnalysis._
      s"""WITH u0 AS (
         |  SELECT doc_id,
         |    (CASE WHEN doc_id % 3 = 0 THEN 'HTTP://' ELSE 'https://' END)
         |    || 'WWW.' || source || '.Example.COM'
         |    || (CASE WHEN doc_id % 3 = 0 THEN ':80'
         |         WHEN doc_id % 3 = 1 THEN ':443' ELSE '' END)
         |    || '/Path/' || CAST(doc_id % 7 AS VARCHAR)
         |    || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
         |    || (CASE WHEN doc_id % 4 = 0 THEN
         |          '?utm_source=feed&id=' || CAST(doc_id % 13 AS VARCHAR)
         |          || '&utm_campaign=x'
         |         WHEN doc_id % 4 = 1 THEN '?ref=abc'
         |         WHEN doc_id % 4 = 2 THEN
         |          '?id=' || CAST(doc_id % 13 AS VARCHAR) || '&fbclid=XYZ'
         |         ELSE '' END)
         |    || (CASE WHEN doc_id % 5 = 0 THEN '#Frag' ELSE '' END)
         |    AS url
         |  FROM documents),
         |c1 AS (SELECT doc_id,
         |         regexp_replace(url, '$UrlFragmentRe', '', 'g') AS nf
         |       FROM u0),
         |c2 AS (SELECT doc_id, nf,
         |         regexp_extract(nf, '$UrlSchemeHostRe') AS pre
         |       FROM c1),
         |c3 AS (SELECT doc_id,
         |         regexp_replace(regexp_replace(lower(pre),
         |           '$UrlPort80Re', '', 'g'), '$UrlPort443Re', '', 'g')
         |         || substr(nf, length(pre) + 1, 1000000) AS j
         |       FROM c2),
         |c4 AS (SELECT doc_id,
         |         regexp_replace(j, '$UrlQmRe', '?&', 'g') AS mk FROM c3),
         |c5 AS (SELECT doc_id,
         |         regexp_replace(mk, '$UrlTrackingRe', '', 'g') AS st
         |       FROM c4),
         |c6 AS (SELECT doc_id,
         |         regexp_replace(regexp_replace(regexp_replace(st,
         |           '$UrlQmAmpRe', '?', 'g'), '$UrlTailRe', '', 'g'),
         |           '$UrlSlashRe', '', 'g') AS cu
         |       FROM c5)
         |SELECT cu AS canonical_url, CAST(count(*) AS BIGINT) AS n_mentions,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(min(doc_id) AS BIGINT) AS canonical_id
         |FROM c6 GROUP BY 1""".stripMargin
    }
  )
}
