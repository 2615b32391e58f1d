package graft.operators

import org.apache.spark.sql.DataFrame
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
}
