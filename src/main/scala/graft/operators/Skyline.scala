package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) extraction — "cheapest AND smallest"
  * style multi-criteria shortlists (Börzsönyi et al. ICDE'01, public
  * formulation), minimizing both integral dimensions. A point is
  * dominated iff some point is ≤ on both dimensions and < on at least
  * one; the frontier is every non-dominated (x, y) pair.
  *
  * Scale: never the quadratic domination join. Rows collapse to one
  * (x, min-y, count-at-pair) tally per distinct x (one partial-agg
  * shuffle); the frontier test is then a PREFIX MIN over the x-ordered
  * distinct-x series — `(x, y)` survives iff `y = miny(x)` and
  * `y < min{miny(x') : x' < x}` — a window over AGGREGATE rows bounded
  * by the x value domain, never by row count (the
  * [[Eval.boundedTally]] contract, enforced the same way). Output:
  * (x, y, n) — the surviving pairs with their row multiplicity
  * (duplicate frontier points don't dominate each other: domination
  * requires strictness).
  */
object Skyline {

  def frontier2d(df: DataFrame, xCol: String, yCol: String,
                 maxSeries: Long = 1L << 22): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tally = Eval.boundedTally(
      df.select(col(xCol).cast("long").as("__x"),
          col(yCol).cast("long").as("__y"))
        .groupBy(col("__x"), col("__y"))
        .agg(count(lit(1)).as("__n"))
        .withColumn("__g", lit(0)),
      "__g", maxSeries, "frontier2d")
    val perX = tally.groupBy(col("__x"))
      .agg(min(col("__y")).as("__miny"))
    val wPrev = Window.orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val front = perX
      .withColumn("__lmin", min(col("__miny")).over(wPrev))
      .filter(col("__lmin").isNull || col("__miny") < col("__lmin"))
      .select(col("__x"), col("__miny").as("__y"))
    tally.join(front, Seq("__x", "__y"))
      .select(col("__x").as(xCol), col("__y").as(yCol),
        col("__n").as("n"))
  }
}
