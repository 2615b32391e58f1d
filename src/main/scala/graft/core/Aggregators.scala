package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Key-join aggregators.
  *
  * Mirrors the reference's aggregator contract
  * (reference: R/1_aggregators.R:21-57): each aggregator reduces a group of
  * feature rows to a single value named `n`:
  *   - sum:   sum(as.numeric(feature)) ignoring nulls
  *   - max:   max(feature)
  *   - min:   min(feature)
  *   - count: row count (feature column irrelevant)
  *
  * Spark-first: an aggregator is just a factory of codegen'd aggregate
  * [[Column]]s, usable in any `groupBy(...).agg(...)` — including the
  * single-shuffle add/remove fused aggregation in
  * [[FeatureStore.keyJoinFeatures]], where map-side partial aggregation
  * applies automatically.
  */
sealed trait KeyJoinAggregator {
  /** Aggregate `feature` over the group (null-ignoring, like the reference). */
  def agg(feature: Column): Column

  /** Aggregate only rows where `cond` holds (used to fuse the reference's
    * separate t_add/t_remove group-bys into one shuffle). */
  def aggWhere(feature: Column, cond: Column): Column =
    agg(when(cond, feature))
}

object Aggregators {
  case object Sum extends KeyJoinAggregator {
    def agg(feature: Column): Column = sum(feature.cast("double"))
  }
  case object Max extends KeyJoinAggregator {
    def agg(feature: Column): Column = max(feature.cast("double"))
  }
  case object Min extends KeyJoinAggregator {
    def agg(feature: Column): Column = min(feature.cast("double"))
  }
  /** Counts rows; `count(when(cond, lit(1)))` so the fused add/remove form
    * counts only the matching side. */
  case object Count extends KeyJoinAggregator {
    def agg(feature: Column): Column = count(feature)
    override def aggWhere(feature: Column, cond: Column): Column =
      count(when(cond, lit(1)))
  }
}
