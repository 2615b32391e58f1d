package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * The assignment hash is md5-based (not xxhash/murmur) so any engine —
  * and any future re-run — reproduces the exact same split from the id
  * alone: no sampling state, no order dependence, stable under
  * repartitioning and incremental appends.
  */
object Splits {

  /** Uniform bucket in [0, buckets) from the row id. */
  def bucket(id: Column, buckets: Int = 100): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Deterministic per-stratum sampling: keep ~pct% of rows in every
    * group, chosen by id-hash bucket — reproducible, shuffle-free, and
    * append-stable (new rows don't change old rows' membership). */
  def stratifiedSample(id: Column, pct: Int): Column =
    bucket(id, 100) < pct

  /** Named split by cumulative percentage boundaries, e.g.
    * splits = Seq("train" -> 80, "val" -> 10, "test" -> 10). */
  def assign(id: Column, splits: Seq[(String, Int)]): Column = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    val b = bucket(id, 100)
    val bounds = splits.scanLeft(0)(_ + _._2).tail
    splits.init.zip(bounds.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), hi)) =>
        Some(acc.fold(when(b < hi, name))(_.when(b < hi, name)))
      }
      .map(_.otherwise(splits.last._1))
      .getOrElse(lit(splits.last._1))
  }
}
