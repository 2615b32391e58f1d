package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Bridge

/** Bloom-filter-pruned join: build a bloom filter over the small side's
  * join keys, pre-filter the big side with it BEFORE the exact shuffle
  * join. The final join makes the result exact regardless of the bloom's
  * false positives — the filter only reduces the rows that reach the
  * shuffle, which at 100 TB is the dominant cost of a selective join.
  *
  * This is the same semi-join reduction Spark's own AQE runtime filters
  * perform, exposed as an explicit operator so it applies when the
  * optimizer cannot prove selectivity (e.g. the small side is the result
  * of an arbitrary computation).
  *
  * Uses Catalyst's native `BloomFilterAggregate` / `BloomFilterMightContain`
  * (both codegen'd); keys are pre-hashed with xxhash64, matching the
  * engine's own runtime-filter convention. The built filter is collected
  * to the driver as a binary literal (`might_contain` requires a constant
  * bloom) — the collected sketch is megabytes, sized by
  * `expectedItems`, never by the data.
  */
object BloomJoin {

  /** Aggregate column: bloom filter over xxhash64(key). */
  def bloomAgg(key: Column, expectedItems: Long): Column =
    Bridge.column(new BloomFilterAggregate(
      Bridge.eagerExpression(xxhash64(key)), expectedItems)
      .toAggregateExpression())

  /** Membership probe against a constant bloom filter binary. */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    Bridge.column(new BloomFilterMightContain(
      Bridge.eagerExpression(lit(bloomBytes)),
      Bridge.eagerExpression(xxhash64(key))))

  /** Build the filter over `small`'s keys (distributed aggregation; only
    * the final sketch reaches the driver). Returns None for an empty
    * small side. */
  def buildFilter(small: DataFrame, smallKey: String,
                  expectedItems: Long): Option[Array[Byte]] =
    Option(small.agg(bloomAgg(col(smallKey), expectedItems).as("__bf"))
      .head.getAs[Array[Byte]]("__bf"))

  /** Inner join `big ⋈ small` on bigKey = smallKey, with the big side
    * bloom-pruned first. Exact: equals the plain join. */
  def prunedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 expectedItems: Long = 4000000L): DataFrame = {
    // Same-named keys → using-join (one key column out); otherwise the
    // equality predicate would be an ambiguous self-reference.
    def join(b: DataFrame): DataFrame =
      if (bigKey == smallKey) b.join(small, Seq(bigKey))
      else b.join(small, col(bigKey) === col(smallKey))
    buildFilter(small, smallKey, expectedItems) match {
      case None => // empty build side: inner join result is empty
        join(big.filter(lit(false)))
      case Some(bytes) =>
        join(big.filter(mightContain(bytes, col(bigKey))))
    }
  }
}
