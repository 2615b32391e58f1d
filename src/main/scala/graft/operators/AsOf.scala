package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Intervals.{ValidFrom, ValidUntil}

/** Point-in-time ("as-of") join: attach to each probe row (key, ts) the
  * feature values valid at ts — the lookup a feature store must answer
  * without leaking future data (the reference answers it through
  * `get_feature`'s interval slice; here it is a first-class operator).
  *
  * Scale design: NOT a range join (which fans out per feature version and
  * needs a post-join row_number). Probes and feature versions are
  * unioned, shuffled once on the key, and sorted by event time; a
  * last-non-null window carries the latest feature version forward onto
  * each probe. One shuffle, one sort, zero fanout — the classic
  * merge-as-of at warehouse scale.
  */
object AsOf {

  /** @param probes   DataFrame with `keys` and `tsCol` (DATE or TIMESTAMP,
    *                 same type as the feature validity columns)
    * @param features bitemporal feature table: `keys`, payload columns,
    *                 `valid_from`/`valid_until` (non-overlapping per key)
    * @return probes with the feature payload columns appended (NULL when
    *         no version is valid at the probe's ts)
    */
  def join(probes: DataFrame, features: DataFrame, keys: Seq[String],
           tsCol: String): DataFrame =
    joinWithTolerance(probes, features, keys, tsCol, toleranceDays = None)

  /** `join` with a staleness bound: a feature version older than
    * `toleranceDays` at the probe's ts is treated as missing (NULL
    * payload) even if still valid — the point-in-time-with-TTL lookup
    * (a model must not consume arbitrarily stale features). Same
    * merge-as-of plan; the bound is a post-carry predicate. */
  def joinWithTolerance(probes: DataFrame, features: DataFrame,
                        keys: Seq[String], tsCol: String,
                        toleranceDays: Option[Int]): DataFrame = {
    val payload = features.columns
      .filterNot(c => keys.contains(c) || c == ValidFrom || c == ValidUntil)
      .toSeq
    val probeCols = probes.columns.toSeq

    val featSide = features.select(
      keys.map(col) ++ Seq(col(ValidFrom).as("__t"), lit(0).as("__probe"),
        col(ValidUntil).as("__vu")) ++
        payload.map(c => col(c).as(s"__p_$c")) ++
        probeCols.filterNot(keys.contains).map(c =>
          lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val probeSide = probes.select(
      keys.map(col) ++ Seq(col(tsCol).cast(featSide.schema("__t").dataType)
        .as("__t"), lit(1).as("__probe"),
        lit(null).cast(features.schema(ValidUntil).dataType).as("__vu")) ++
        payload.map(c => lit(null).cast(features.schema(c).dataType)
          .as(s"__p_$c")) ++
        probeCols.filterNot(keys.contains).map(col): _*)

    // Feature versions sort before probes at equal time (valid_from is
    // inclusive), then the last started version carries forward — as ONE
    // struct, so an open-ended version (valid_until NULL) is carried
    // atomically rather than having its NULL fields skipped by
    // last(ignoreNulls).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val version = when(col("__probe") === 0,
      struct(col("__vu").as("vu") +: col("__t").as("vf") +: payload.map(c =>
        col(s"__p_$c").as(c)): _*))
    val carried = featSide.unionByName(probeSide)
      .withColumn("__c", last(version, ignoreNulls = true).over(w))

    // A carried version only applies while it is still valid at __t —
    // and, under a tolerance, not staler than the bound.
    val live = toleranceDays.foldLeft(col("__c").isNotNull &&
      (col("__c.vu").isNull || col("__c.vu") > col("__t"))) { (c, tol) =>
      c && datediff(col("__t"), col("__c.vf")) <= tol
    }
    carried.filter(col("__probe") === 1)
      .select(
        probeCols.map(col) ++
          payload.map(c => when(live, col(s"__c.$c")).otherwise(lit(null))
            .as(c)): _*)
  }

  /** Interpolating as-of: attach to each probe (key, t) the LINEARLY
    * interpolated sample value — `v0 + (v1−v0)·(t−t0) / (t1−t0)` between
    * the bracketing samples, the sensor/feature time-alignment the
    * carry-forward [[join]] cannot answer (a reading 1 ms before the
    * next sample should not still report the hour-old one). Exact
    * integer arithmetic on long values/timestamps: the division is a
    * single sign-factored floor, so any engine reproduces it
    * bit-for-bit. Probes outside the sampled range (no bracket on one
    * side) get NULL — interpolation, never extrapolation; a probe ON a
    * sample time returns that sample exactly.
    *
    * Scale: the merge-as-of posture — samples collapse to one value per
    * (key, t) (deterministic max, so duplicate readings cannot make the
    * answer ordering-dependent), then probes and samples union, shuffle
    * ONCE on the key, and two opposite-direction carry windows over the
    * same partitioning attach (t0,v0]/(t1,v1] — one exchange, two
    * in-partition sorts, zero fanout (a range join would fan out per
    * sample version and re-rank). */
  def lerp(probes: DataFrame, samples: DataFrame, keys: Seq[String],
           tsCol: String, valueCol: String,
           outCol: String = "value_lerp"): DataFrame = {
    val probeCols = probes.columns.toSeq
    val samp = samples.select(
        keys.map(col) :+ col(tsCol).cast("long").as("__t") :+
          col(valueCol).cast("long").as("__v"): _*)
      .filter(col("__t").isNotNull && col("__v").isNotNull)
      .groupBy(keys.map(col) :+ col("__t"): _*)
      .agg(max(col("__v")).as("__v"))
      .withColumn("__probe", lit(0))
    val sampSide = samp.select(
      keys.map(col) ++ Seq(col("__t"), col("__probe"), col("__v")) ++
        probeCols.filterNot(keys.contains).map(c =>
          lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val probeSide = probes.select(
      keys.map(col) ++ Seq(col(tsCol).cast("long").as("__t"),
        lit(1).as("__probe"), lit(null).cast("long").as("__v")) ++
        probeCols.filterNot(keys.contains).map(col): _*)
    // forward: samples sort before probes at equal t, so an exact-time
    // sample is its probe's (t0, v0); backward: after, so it is also
    // (t1, v1) — and the t1 == t0 guard returns it exactly.
    val wFwd = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBack = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sample = when(col("__probe") === 0,
      struct(col("__t").as("t"), col("__v").as("v")))
    val carried = sampSide.unionByName(probeSide)
      .withColumn("__lo", last(sample, ignoreNulls = true).over(wFwd))
      .withColumn("__hi", last(sample, ignoreNulls = true).over(wBack))
    val t0 = col("__lo.t"); val v0 = col("__lo.v")
    val t1 = col("__hi.t")
    // value·time products overflow long (ANSI throws mid-task) —
    // decimal(38,0) intermediates; ONE sign-factored floor division
    val lerped = when(t1 === t0, v0).otherwise(v0 + expr(
      """CAST(CASE WHEN (__hi.v - __lo.v) >= 0
        |  THEN (CAST(__hi.v - __lo.v AS DECIMAL(38,0)) *
        |        CAST(__t - __lo.t AS DECIMAL(38,0))) div
        |       CAST(__hi.t - __lo.t AS DECIMAL(38,0))
        |  ELSE -((CAST(__lo.v - __hi.v AS DECIMAL(38,0)) *
        |          CAST(__t - __lo.t AS DECIMAL(38,0))) div
        |         CAST(__hi.t - __lo.t AS DECIMAL(38,0)))
        |END AS BIGINT)""".stripMargin))
    carried.filter(col("__probe") === 1)
      .select(probeCols.map(col) :+
        when(col("__lo").isNotNull && col("__hi").isNotNull, lerped)
          .as(outCol): _*)
  }
}
