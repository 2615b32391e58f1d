package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * `y < min{miny(x') : x' < x}` — computed with the width-scaled
  * TWO-LEVEL bucket split (the [[Selection.distinctMinRanks]]
  * posture): the prefix min decomposes into (earlier level-1 buckets,
  * earlier level-2 buckets within mine, earlier x within my cell), so
  * the only unpartitioned window runs over ≤ B+1 per-bucket aggregate
  * rows regardless of the x-domain width — a 4M-value domain never
  * sorts in one task. [[Eval.boundedTally]] stays as the budget
  * backstop on the tally itself. Output: (x, y, n) — the surviving
  * pairs with their row multiplicity (duplicate frontier points don't
  * dominate each other: domination requires strictness).
  */
object Skyline {

  def frontier2d(df: DataFrame, xCol: String, yCol: String,
                 maxSeries: Long = 1L << 22): DataFrame = {
    val tally = Eval.boundedTally(
      df.select(col(xCol).cast("long").as("__x"),
          col(yCol).cast("long").as("__y"))
        .groupBy(col("__x"), col("__y"))
        .agg(count(lit(1)).as("__n"))
        .withColumn("__g", lit(0)),
      "__g", maxSeries, "frontier2d") // already checkpointed: perX
    // scan, bounds head, and the final multiplicity join share it
    val perX = tally.groupBy(col("__x"))
      .agg(min(col("__y")).as("__miny"))
    val head = perX.agg(min(col("__x")).as("__mn"),
      max(col("__x")).as("__mx"), count(lit(1)).as("__cnt")).head()
    if (head.getLong(2) == 0L)
      return tally.filter(lit(false))
        .select(col("__x").as(xCol), col("__y").as(yCol),
          col("__n").as("n"))
    val (mn, mx) = (head.getLong(0), head.getLong(1))
    require(mx - mn >= 0,
      s"x range [$mn, $mx] exceeds Long.MaxValue")
    val (w1, w2) = Selection.bucketWidths(mn, mx)
    val t = perX
      .withColumn("__b1", expr(s"(__x - ${mn}L) div ${w1}L"))
      .withColumn("__b2",
        expr(s"(__x - ${mn}L - __b1 * ${w1}L) div ${w2}L"))
    // prefix min from STRICTLY earlier level-1 buckets (≤ B+1 rows)
    val wb1 = Window.orderBy(col("__b1"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val m1 = t.groupBy(col("__b1")).agg(min(col("__miny")).as("__m1"))
      .withColumn("__p1", min(col("__m1")).over(wb1))
      .select(col("__b1"), col("__p1"))
    // ... earlier level-2 buckets within my level-1 bucket
    val wb2 = Window.partitionBy(col("__b1")).orderBy(col("__b2"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val m2 = t.groupBy(col("__b1"), col("__b2"))
      .agg(min(col("__miny")).as("__m2"))
      .withColumn("__p2", min(col("__m2")).over(wb2))
      .select(col("__b1"), col("__b2"), col("__p2"))
    // ... earlier x within my (b1, b2) cell — one value per cell for
    // any span ≤ 2^32·B, so this window is effectively a no-op sort
    val wv = Window.partitionBy(col("__b1"), col("__b2"))
      .orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val front = t
      .withColumn("__pv", min(col("__miny")).over(wv))
      .join(m1, Seq("__b1"))
      .join(m2, Seq("__b1", "__b2"))
      .withColumn("__lmin", // least() skips NULL-valued empty prefixes
        least(col("__p1"), col("__p2"), col("__pv")))
      .filter(col("__lmin").isNull || col("__miny") < col("__lmin"))
      .select(col("__x"), col("__miny").as("__y"))
    tally.join(front, Seq("__x", "__y"))
      .select(col("__x").as(xCol), col("__y").as(yCol),
        col("__n").as("n"))
  }
}
