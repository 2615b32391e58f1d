package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryPack
import graft.core.Tables

/** The SQL surface: the same engine through `spark.sql` text. A user can
  * drive graft entirely from SQL — temp views over the sources, the
  * prevalence delta-pipeline as a CTE chain, and the native codegen
  * kernels via their registered `graft_*` SQL functions
  * (`GraftExtensions.registerInto`). Catalyst compiles the SQL text to
  * the same physical plan the DataFrame formulation gets.
  */
object SqlPack extends QueryPack {

  private val Start = "1995-01-01"
  private val End = "1995-03-31"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the flagship prevalence series, all in SQL text (same semantics
    // and oracle as q07)
    "q50_sql_surface" -> ((s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        s"""WITH iv AS (
           |  SELECT o_custkey AS key_cust, o_orderkey,
           |         CAST(o_orderdate AS DATE) AS valid_from,
           |         date_add(CAST(o_orderdate AS DATE), 30) AS valid_until
           |  FROM orders
           |),
           |sliced AS (
           |  SELECT greatest(valid_from, DATE '$Start') AS vf,
           |         least(valid_until, date_add(DATE '$End', 1)) AS vu
           |  FROM iv
           |  WHERE valid_from <= DATE '$End' AND valid_until > DATE '$Start'
           |),
           |deltas AS (
           |  SELECT d, sum(CASE WHEN is_add THEN 1 ELSE 0 END) AS n_add,
           |         sum(CASE WHEN is_add THEN 0 ELSE 1 END) AS n_remove
           |  FROM (
           |    SELECT vf AS d, TRUE AS is_add FROM sliced
           |    UNION ALL
           |    SELECT vu AS d, FALSE AS is_add FROM sliced
           |  ) u
           |  GROUP BY d
           |),
           |grid AS (
           |  SELECT explode(sequence(DATE '$Start', DATE '$End')) AS date
           |),
           |j AS (
           |  SELECT g.date, coalesce(d.n_add, 0) AS n_add,
           |         coalesce(d.n_remove, 0) AS n_remove
           |  FROM grid g LEFT JOIN deltas d ON g.date = d.d
           |)
           |SELECT CAST(date AS STRING) AS date,
           |  CAST(sum(n_add - n_remove) OVER (
           |    ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |    AS BIGINT) AS n_orders
           |FROM j""".stripMargin)
    }),

    // deterministic sharding from pure SQL through the registered
    // native kernel — the same number DuckDB derives from the md5
    // recipe, proving the codegen kernel is engine-portable
    "q93_sql_shard" -> ((s, dir) => {
      graft.GraftExtensions.registerInto(s)
      Tables.load(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql(
        """SELECT graft_shard(concat(CAST(doc_id AS STRING), '|r4'), 16)
          |    AS shard,
          |  CAST(count(*) AS BIGINT) AS n_rows,
          |  CAST(min(doc_id) AS BIGINT) AS min_doc
          |FROM documents GROUP BY 1""".stripMargin)
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q50_sql_surface" -> CorePack.oracleSql("q07_prevalence"),

    "q93_sql_shard" ->
      """SELECT
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|r4'), 1, 8))
        |    ::BIGINT % 16 AS shard,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(min(doc_id) AS BIGINT) AS min_doc
        |FROM documents GROUP BY 1
        |""".stripMargin
  )
}
