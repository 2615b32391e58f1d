package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's exported store test battery, re-expressed for any
  * `FeatureStore` implementation (reference: R/test_diseasystore.R —
  * downstream store authors run `test_diseasystore(MyStore, ...)`; here
  * they call `StoreConformance.run(() => new MyStore(...), start, end)`).
  *
  * Checks (mirroring the reference's testthat battery):
  *   1. the registry is well-formed: features exist, observables and
  *      stratifications partition them, every feature has a handler
  *   2. features retrieve from a fresh state: rows overlap the study
  *      period and `valid_from` is never NULL
  *   3. retrieval is idempotent: a second `getFeature` over the same
  *      range returns the identical row multiset (SCD2 produced no
  *      spurious versions)
  *   4. ranges extend: computing a subrange first, then the full range,
  *      equals computing the full range fresh
  *   5. `keyJoinFeatures` runs for every observable × compatible
  *      stratification and the series covers exactly [start, end]
  *
  * @return failure descriptions; empty means the store conforms.
  */
object StoreConformance {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  def run(mkStore: () => FeatureStore, start: String, end: String,
          midpoint: String): Seq[String] = {
    val failures = Seq.newBuilder[String]
    def check(name: String)(body: => Unit): Unit =
      try body catch {
        case e: Throwable =>
          failures += s"$name: ${e.getMessage}"
      }

    val store = mkStore()

    check("registry well-formed") {
      require(store.availableFeatures.nonEmpty, "no features registered")
      val obs = store.availableObservables.toSet
      val strat = store.availableStratifications.toSet
      require((obs & strat).isEmpty, "observables overlap stratifications")
      require(obs ++ strat == store.availableFeatures.toSet,
        "observables + stratifications must partition the features")
      store.availableFeatures.foreach { f =>
        val h = store.handlerOf(f)
        require(h.compute != null && h.keyJoin != null,
          s"feature '$f' has an incomplete handler")
      }
    }

    val fresh = store.availableFeatures.map { f =>
      f -> store.getFeature(f, start, end)
    }.toMap

    store.availableFeatures.foreach { f =>
      check(s"fresh retrieval of '$f' is period-sliced") {
        val df = fresh(f)
        val bad = df.filter(
          col(Intervals.ValidFrom).isNull ||
            !(col(Intervals.ValidFrom) <= lit(end)) ||
            (col(Intervals.ValidUntil).isNotNull &&
              col(Intervals.ValidUntil) <= lit(start))).count()
        require(bad == 0, s"$bad rows outside the study period or with " +
          "NULL valid_from")
      }
      check(s"retrieval of '$f' is idempotent") {
        val first = rows(fresh(f))
        val second = rows(store.getFeature(f, start, end))
        require(first == second,
          s"repeated getFeature changed the result " +
            s"(${first.size} vs ${second.size} rows)")
      }
    }

    check("ranges extend incrementally") {
      val twoPhase = mkStore()
      store.availableFeatures.foreach { f =>
        twoPhase.getFeature(f, start, midpoint).count()
        val extended = rows(twoPhase.getFeature(f, start, end))
        require(extended == rows(fresh(f)),
          s"'$f' computed via [start,mid]+[start,end] differs from fresh")
      }
    }

    store.availableObservables.foreach { o =>
      val compatible = store.availableStratifications.filter(s =>
        store.handlerOf(s).keyJoin == store.handlerOf(o).keyJoin)
      (None +: compatible.map(Option(_))).foreach { s =>
        check(s"keyJoinFeatures($o, ${s.getOrElse("-")})") {
          val series = store.keyJoinFeatures(o, s.toSeq, start, end)
          val span = series.agg(
            min(col("date")).cast("string"),
            max(col("date")).cast("string")).head()
          require(span.getString(0) == start && span.getString(1) == end,
            s"series spans [${span.getString(0)}, ${span.getString(1)}], " +
              s"expected [$start, $end]")
        }
      }
    }

    // extension surface: compaction is a pure layout change — every
    // feature reads back identically and the flagship series is
    // untouched (run against every store implementation, same as the
    // reference behaviors above)
    check("compaction preserves reads") {
      val before = store.availableFeatures.map(f => f -> rows(fresh(f)))
      val obs = store.availableObservables.headOption
      val seriesBefore = obs.map(o =>
        rows(store.keyJoinFeatures(o, Seq.empty, start, end)))
      val byFeature = store.dsMap.toMap
      store.availableFeatures
        .map(f => byFeature(f)).distinct
        .foreach(l => store.compact(l))
      before.foreach { case (f, b) =>
        require(rows(store.getFeature(f, start, end)) == b,
          s"'$f' reads differently after compaction")
      }
      obs.foreach { o =>
        require(seriesBefore.contains(
          rows(store.keyJoinFeatures(o, Seq.empty, start, end))),
          "flagship series changed after compaction")
      }
    }

    failures.result()
  }
}
