package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-to-event (survival) analysis — the Kaplan–Meier product-limit
  * estimator, the epidemiological staple next to the reference's
  * incidence/prevalence slices (diseasystore's domain is exactly this
  * kind of cohort bookkeeping; KM is the canonical downstream consumer
  * of its interval data — original Spark-first formulation).
  *
  * The curve is emitted in deterministic fixed point: survival starts
  * at `scale` and steps by the integer recurrence
  * `s_i = floor(s_{i-1} · (n_i − d_i) / n_i)` over the ordered distinct
  * times, so any engine (e.g. a DuckDB recursive CTE) reproduces it
  * bit-for-bit — no float products, no fold-order hazard.
  */
object Survival {

  /** Kaplan–Meier estimate per group over one-row-per-subject input.
    *
    * Convention: subjects censored at time t are still at risk for the
    * deaths at t (deaths-before-censoring, the standard KM tie rule).
    * The survival value on a row reflects the deaths AT that time
    * (right-continuous step function sampled at its jumps).
    *
    * Scale: subjects collapse to (group, time) death/censor tallies in
    * ONE partial-agg shuffle; the sequential floor-product then runs
    * per group over the DISTINCT-time series — bounded by the time
    * domain (days/weeks), never by cohort size — inside `flatMapGroups`
    * with BigInt arithmetic (exact at any n_risk; a 10^13-subject
    * cohort would overflow s·n_risk in long math). The same
    * bounded-per-group-series posture as [[Similarity.mmrRerank]]'s
    * sanctioned mapGroups loop.
    *
    * Output: (groupCol, t, n_risk, n_event, n_censor, surv_fp), one row
    * per distinct observed time per group, ascending t.
    *
    * @param durationCol integral time-to-event (cast to long, ≥ 0)
    * @param eventCol    nonzero = event observed, 0 = right-censored
    */
  def kaplanMeier(df: DataFrame, groupCol: String, durationCol: String,
                  eventCol: String, scale: Long = 1000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tallies = df
      .groupBy(col(groupCol).cast("string").as("__g"),
        col(durationCol).cast("long").as("__t"))
      .agg(sum(when(col(eventCol) =!= 0, 1L).otherwise(0L)).as("__d"),
        sum(when(col(eventCol) =!= 0, 0L).otherwise(1L)).as("__c"))
      .as[(String, Long, Long, Long)]
    tallies.groupByKey(_._1).flatMapGroups { (g, it) =>
      val rows = it.toArray.sortBy(_._2)
      var atRisk = rows.iterator.map(r => r._3 + r._4).sum
      var s = BigInt(scale)
      val out = Array.newBuilder[(String, Long, Long, Long, Long, Long)]
      for ((_, t, d, c) <- rows) {
        val nRisk = atRisk
        // unconditional multiply (d = 0 ⇒ ×n/n, exact identity) keeps
        // the recurrence identical to the oracle's recursive CTE
        s = s * BigInt(nRisk - d) / BigInt(nRisk)
        out += ((g, t, nRisk, d, c, s.toLong))
        atRisk -= (d + c)
      }
      out.result().iterator
    }.toDF(groupCol, "t", "n_risk", "n_event", "n_censor", "surv_fp")
  }

  /** Log-rank observed-vs-expected table: for each cohort, the total
    * observed events and the fixed-point expected events under the
    * null that all cohorts share one hazard — at each death time t the
    * cohort's expectation is `d(t)·n_g(t)/n(t)`, summed as
    * `Σ ⌊scale·d(t)·n_g(t) / n(t)⌋` (declared floor order, so any
    * engine matches). `oe_fp = scale·observed − expected_fp` is the
    * log-rank numerator: a cohort dying faster than the pooled hazard
    * goes positive.
    *
    * Scale: subjects collapse to (cohort, time) tallies once; the
    * at-risk series comes from windows partitioned by cohort over the
    * time-DOMAIN-bounded tally rows, evaluated on the cohorts ×
    * death-times grid (a bounded crossJoin, the sanctioned grid×strata
    * shape); per-time pooled totals are a window over the same grid.
    * Output: (groupCol, n_subjects, observed, expected_fp, oe_fp). */
  def logRank(df: DataFrame, groupCol: String, durationCol: String,
              eventCol: String, scale: Long = 1000000L,
              maxSeries: Long = 1L << 22): DataFrame = {
    // boundedTally pins the tally (reused: death times, groups,
    // series) AND enforces the time-domain-bounded contract before
    // any ordered window sees the series
    val tal = Eval.boundedTally(df
      .groupBy(col(groupCol).cast("string").as("__g"),
        col(durationCol).cast("long").as("__t"))
      .agg(sum(when(col(eventCol) =!= 0, 1L).otherwise(0L)).as("__d"),
        sum(when(col(eventCol) =!= 0, 0L).otherwise(1L)).as("__c")),
      "__g", maxSeries, "logRank")
    val grid = tal.select(col("__g")).distinct()
      .crossJoin(tal.filter(col("__d") > 0).select(col("__t")).distinct())
      .withColumn("__isdt", lit(1))
    val wg = Window.partitionBy("__g").orderBy("__t")
    val series = tal.join(grid, Seq("__g", "__t"), "full_outer")
      .na.fill(0L, Seq("__d", "__c"))
      .withColumn("__cumb", coalesce(sum(col("__d") + col("__c")).over(
        wg.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__tot", sum(col("__d") + col("__c"))
        .over(Window.partitionBy("__g")))
      .withColumn("__nrisk", col("__tot") - col("__cumb"))
      .filter(col("__isdt") === 1)
    val wt = Window.partitionBy("__t")
    series
      .withColumn("__dT", sum(col("__d")).over(wt))
      .withColumn("__nT", sum(col("__nrisk")).over(wt))
      .withColumn("__e", expr(
        s"(cast($scale as decimal(38,0)) * __dT * __nrisk) div __nT"))
      .groupBy(col("__g").as(groupCol))
      .agg(min(col("__tot")).as("n_subjects"),
        sum(col("__d")).as("observed"),
        sum(col("__e")).cast("long").as("expected_fp"))
      .withColumn("oe_fp", lit(scale) * col("observed") - col("expected_fp"))
  }

  /** Nelson–Aalen cumulative-hazard estimator per group — the
    * integrated-hazard companion to [[kaplanMeier]] (H(t) = Σ_{s≤t}
    * d_s/n_s; preferred when curves are compared additively or fed to
    * a proportional-hazards step). Deterministic fixed point: each
    * step contributes `hazard_fp = ⌊scale·d/n_risk⌋` and the curve is
    * the plain integer cumulative sum of those floored terms — a
    * declared summation order any engine reproduces (unlike KM's
    * product, no recursion is even needed).
    *
    * Same tie rule as KM (censored-at-t still at risk for deaths at
    * t) and the same scale posture: one shuffle to (group, time)
    * tallies, windows only over the time-domain-bounded tally series
    * ([[Eval.boundedTally]]-pinned). Output: (groupCol, t, n_risk,
    * n_event, n_censor, hazard_fp, cumhaz_fp), one row per distinct
    * observed time per group, ascending t. */
  def nelsonAalen(df: DataFrame, groupCol: String, durationCol: String,
                  eventCol: String, scale: Long = 1000000L,
                  maxSeries: Long = 1L << 22): DataFrame = {
    val tal = Eval.boundedTally(df
      .groupBy(col(groupCol).cast("string").as("__g"),
        col(durationCol).cast("long").as("__t"))
      .agg(sum(when(col(eventCol) =!= 0, 1L).otherwise(0L)).as("__d"),
        sum(when(col(eventCol) =!= 0, 0L).otherwise(1L)).as("__c")),
      "__g", maxSeries, "nelsonAalen")
    val wg = Window.partitionBy("__g").orderBy("__t")
    tal
      .withColumn("__cumb", coalesce(sum(col("__d") + col("__c")).over(
        wg.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__tot", sum(col("__d") + col("__c"))
        .over(Window.partitionBy("__g")))
      .withColumn("__nrisk", col("__tot") - col("__cumb"))
      .withColumn("hazard_fp", expr(
        s"cast((cast($scale as decimal(38,0)) * __d) div __nrisk as long)"))
      .withColumn("cumhaz_fp", sum(col("hazard_fp")).over(
        wg.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("__g").as(groupCol), col("__t").as("t"),
        col("__nrisk").as("n_risk"), col("__d").as("n_event"),
        col("__c").as("n_censor"), col("hazard_fp"), col("cumhaz_fp"))
  }

  /** Aalen–Johansen cumulative incidence under COMPETING risks (Aalen &
    * Johansen 1978): when a subject can fail from one of several causes
    * (churn vs conversion, death vs transplant), `1 − KM_k` computed on
    * one cause with the others censored OVERSTATES that cause's
    * incidence — the correct cumulative incidence of cause k is
    * `CIF_k(t) = Σ_{s ≤ t} S(s−) · d_k(s) / n(s)` with S the all-cause
    * KM survival. Deterministic fixed point: S follows kaplanMeier's
    * floored product recurrence on TOTAL deaths, and each cause's
    * increment is `⌊S(s−)·d_k(s) / n(s)⌋` summed in ascending-time
    * order — a declared integer procedure a DuckDB recursive CTE + one
    * cumsum reproduces bit-for-bit.
    *
    * Same tie rule (censored at t still at risk at t) and scale posture
    * as [[kaplanMeier]]: ONE shuffle to (group, time, cause) tallies,
    * then a per-group fold over the distinct-time series (bounded by
    * the time domain, never cohort size) in flatMapGroups with BigInt
    * arithmetic.
    *
    * @param causeCol failure cause (cast to string); NULL = censored
    * @return (groupCol, t, cause, n_risk, n_event, surv_fp, cif_fp) —
    *         one row per (time, cause) with events of that cause;
    *         surv_fp is the all-cause survival AFTER the deaths at t,
    *         cif_fp the cause's cumulative incidence THROUGH t */
  def aalenJohansen(df: DataFrame, groupCol: String, durationCol: String,
                    causeCol: String, scale: Long = 1000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tallies = df
      .groupBy(col(groupCol).cast("string").as("__g"),
        col(durationCol).cast("long").as("__t"),
        col(causeCol).cast("string").as("__k")) // NULL __k = censored
      .agg(count(lit(1)).as("__n"))
      .as[(String, Long, Option[String], Long)]
    tallies.groupByKey(_._1).flatMapGroups { (g, it) =>
      val byTime = it.toArray.groupBy(_._2).toArray.sortBy(_._1)
      var atRisk = byTime.iterator.flatMap(_._2).map(_._4).sum
      var s = BigInt(scale)
      val cif = scala.collection.mutable.Map.empty[String, BigInt]
      val out = Array.newBuilder[(String, Long, String, Long, Long,
        Long, Long)]
      for ((t, rows) <- byTime) {
        val nRisk = atRisk
        val d = rows.iterator.filter(_._3.isDefined).map(_._4).sum
        val c = rows.iterator.filter(_._3.isEmpty).map(_._4).sum
        val sPrev = s
        s = s * BigInt(nRisk - d) / BigInt(nRisk)
        for ((_, _, Some(k), dk) <- rows.sortBy(_._3.getOrElse(""))) {
          val inc = sPrev * BigInt(dk) / BigInt(nRisk)
          val tot = cif.getOrElse(k, BigInt(0)) + inc
          cif(k) = tot
          out += ((g, t, k, nRisk, dk, s.toLong, tot.toLong))
        }
        atRisk -= (d + c)
      }
      out.result().iterator
    }.toDF(groupCol, "t", "cause", "n_risk", "n_event", "surv_fp",
      "cif_fp")
  }
}
