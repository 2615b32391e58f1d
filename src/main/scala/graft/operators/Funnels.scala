package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Last-touch conversion attribution: each conversion is credited to
    * the user's LATEST touch event STRICTLY before it and at most
    * `windowUs` old (NULL channel when no touch qualifies — "organic").
    * Ties are deterministic: among touches at the same microsecond the
    * highest `idCol` wins.
    *
    * Scale: the merge-as-of posture of [[AsOf.join]], not a range join —
    * touches and conversions union, shuffle ONCE on the user key, sort
    * by (ts, kind, id), and a last-non-null window carries the latest
    * touch struct onto each conversion. Conversions sort BEFORE touches
    * at equal ts (kind −1 < 0), which is exactly the strict-precedence
    * rule. One shuffle, one sort, zero fanout.
    *
    * Output: the conversion rows + `channel` (nullable). */
  def lastTouch(conversions: DataFrame, touches: DataFrame,
                userCol: String, tsUsCol: String, idCol: String,
                channelCol: String, windowUs: Long): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    val payload = conversions.columns.toSeq.filterNot(_ == userCol)
    val tSide = touches.select(
      Seq(col(userCol), col(tsUsCol).cast("long").as("__t"),
        lit(0).as("__k"), col(idCol).cast("long").as("__oid"),
        col(channelCol).as("__ch")) ++
        payload.map(c => lit(null).cast(conversions.schema(c).dataType)
          .as(s"__c_$c")): _*)
    val cSide = conversions.select(
      Seq(col(userCol), col(tsUsCol).cast("long").as("__t"),
        lit(-1).as("__k"), col(idCol).cast("long").as("__oid"),
        lit(null).cast(touches.schema(channelCol).dataType).as("__ch")) ++
        payload.map(c => col(c).as(s"__c_$c")): _*)
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("__t"), col("__k"), col("__oid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tSide.unionByName(cSide)
      .withColumn("__last", last(when(col("__k") === 0,
        struct(col("__t").as("t"), col("__ch").as("ch"))),
        ignoreNulls = true).over(w))
      .filter(col("__k") === -1)
      .select(col(userCol) +: payload.map(c => col(s"__c_$c").as(c)) :+
        when(col("__last").isNotNull &&
          col("__t") - col("__last.t") <= windowUs, col("__last.ch"))
          .as("channel"): _*)
  }
}
