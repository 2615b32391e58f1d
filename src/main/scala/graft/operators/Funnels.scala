package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-constrained sequential funnels — the ClickHouse
  * `windowFunnel` shape, deterministic first-match variant: for a
  * declared step sequence (e.g. view → click → purchase), each user's
  * step-i time is the EARLIEST event of step i that falls strictly
  * after their step-(i−1) time and within `windowUs` of it; `stage`
  * is the deepest step reached. First-match semantics make the result
  * a pure min-recurrence — exact integers, reproducible by any
  * engine, no sequential per-user scan.
  *
  * Scale: one filtered aggregate for step 1, then per later step one
  * user-keyed equi-join (events of that type only) + a conditional
  * min aggregate — all partial-agg shapes keyed on the user id. The
  * funnel depth is declared (small), so the chain is |steps|−1 joins,
  * never a per-user ordered traversal. */
object Funnels {

  /** Per-user funnel report: (user, t1..tN as epoch-µs, −1 where the
    * step was not reached, stage ∈ [1, N]). Users without the first
    * step are absent. */
  def windowFunnel(df: DataFrame, userCol: String, tsUsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowUs: Long): DataFrame = {
    require(steps.nonEmpty, "declare at least one step")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    require(windowUs > 0, "windowUs must be positive")
    var acc = df.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsUsCol)).as("t1"))
    for (i <- 1 until steps.size) {
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val cand = df.filter(col(typeCol) === steps(i))
        .select(col(userCol), col(tsUsCol).as("__ts"))
      val keys = (0 until i).map(j => col(s"t${j + 1}"))
      acc = acc.join(cand, Seq(userCol), "left")
        .groupBy((col(userCol) +: keys): _*)
        .agg(min(when(col(prev).isNotNull &&
            col("__ts") > col(prev) &&
            col("__ts") - col(prev) <= windowUs, col("__ts")))
          .as(cur))
    }
    val stage = (1 until steps.size).foldLeft(lit(1L)) { (s, i) =>
      s + when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L) }
    val tCols = (1 to steps.size).map(i =>
      coalesce(col(s"t$i"), lit(-1L)).as(s"t$i"))
    acc.select((col(userCol) +: tCols) :+ stage.as("stage"): _*)
  }
}
