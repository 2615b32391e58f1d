package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Intervals.{ValidFrom, ValidUntil}

/** Point-in-time training-set assembly: attach to each spine row
  * (entity key, label timestamp) the value every feature table had at
  * that timestamp — the feature-store "historical features" retrieval
  * that must not leak future data (reference: R/diseasystore.R's
  * `get_feature` slice composed per feature; here one first-class op).
  *
  * Scale design: ALL feature tables and the spine are unioned and
  * shuffled ONCE on the entity key, sorted by event time, and each
  * table's latest version is carried forward by its own last-non-null
  * window over the same sorted run. N feature tables cost one exchange
  * + one sort total — not N as-of joins of a growing spine (the naive
  * fold doubles the shuffled bytes with every joined table).
  *
  * All feature tables must share the spine's entity key columns;
  * versions must be non-overlapping per key (SCD2). Feature columns are
  * NULL where no version is valid at the spine timestamp.
  */
object TrainingSet {

  /** @param spine    entity keys + `tsCol` (+ label/payload columns)
    * @param features (name, table) pairs; each table: keys + payload +
    *                 `valid_from`/`valid_until`. Payload columns keep
    *                 their own names in the output (they must not
    *                 collide with spine columns or each other).
    */
  def assemble(spine: DataFrame, keys: Seq[String], tsCol: String,
               features: Seq[(String, DataFrame)]): DataFrame = {
    require(features.nonEmpty, "at least one feature table")
    val spineCols = spine.columns.toSeq
    val payloads: Seq[(Int, Seq[String])] = features.zipWithIndex.map {
      case ((_, f), i) =>
        i -> f.columns.filterNot(c =>
          keys.contains(c) || c == ValidFrom || c == ValidUntil).toSeq
    }
    val dup = payloads.flatMap(_._2).diff(
      payloads.flatMap(_._2).distinct)
    require(dup.isEmpty, s"feature column collision: $dup")
    val spineClash = payloads.flatMap(_._2)
      .filter(c => spineCols.contains(c) || keys.contains(c) || c == tsCol)
    require(spineClash.isEmpty,
      s"feature columns collide with spine/key/ts columns: $spineClash")

    val tsType = spine.schema(tsCol).dataType

    // One tall union: every row has (keys, __t, __probe, __src, __vu,
    // every payload column, every spine column), null-filled crosswise.
    def side(df: DataFrame, src: Int, isProbe: Boolean): DataFrame = {
      val featCols = payloads.flatMap { case (i, cols) =>
        cols.map { c =>
          if (i == src && !isProbe) col(c).as(s"__p_$c")
          else lit(null).cast(features(i)._2.schema(c).dataType)
            .as(s"__p_$c")
        }
      }
      val spineOnly = spineCols.filterNot(keys.contains)
      val carriedSpine = spineOnly.map { c =>
        if (isProbe) col(c)
        else lit(null).cast(spine.schema(c).dataType).as(c)
      }
      val t =
        if (isProbe) col(tsCol).cast(tsType).as("__t")
        else col(ValidFrom).cast(tsType).as("__t")
      val vu =
        if (isProbe) lit(null).cast(tsType).as("__vu")
        else col(ValidUntil).cast(tsType).as("__vu")
      df.select(keys.map(col) ++ Seq(t,
        lit(if (isProbe) 1 else 0).as("__probe"),
        lit(src).as("__src"), vu) ++ featCols ++ carriedSpine: _*)
    }

    val tall = features.zipWithIndex
      .map { case ((_, f), i) => side(f, i, isProbe = false) }
      .reduce(_ unionByName _)
      .unionByName(side(spine, -1, isProbe = true))

    // Versions sort before probes at equal time (valid_from inclusive);
    // each table's version is carried as ONE struct so open-ended
    // versions survive last(ignoreNulls).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloads.foldLeft(tall) { case (df, (i, cols)) =>
      val version = when(col("__probe") === 0 && col("__src") === i,
        struct(col("__vu").as("vu") +:
          cols.map(c => col(s"__p_$c").as(c)): _*))
      df.withColumn(s"__c$i", last(version, ignoreNulls = true).over(w))
    }

    carried.filter(col("__probe") === 1)
      .select(spineCols.map(col) ++ payloads.flatMap { case (i, cols) =>
        val live = col(s"__c$i").isNotNull &&
          (col(s"__c$i.vu").isNull || col(s"__c$i.vu") > col("__t"))
        cols.map(c =>
          when(live, col(s"__c$i.$c")).otherwise(lit(null)).as(c))
      }: _*)
  }

  /** Deterministic contrastive NEGATIVE sampling: for each query row,
    * the `k` pool rows with the smallest engine-portable hash of
    * (query, candidate, seed) — a reproducible stand-in for uniform
    * negative draws (the contrastive/embedding-training companion of
    * [[graft.operators.Splits.samplePerGroup]]). Self-pairs are
    * excluded; exclude known positives by anti-joining the pool first.
    * Different seeds give independent draws; a grown pool perturbs
    * ranks only where new candidates hash below old ones.
    *
    * Scale shape: the pool is an explicitly bounded negative set
    * (in-batch / curated, not the corpus) and BROADCASTS under the
    * cross join; the per-query rank window sees exactly |pool|-1 rows
    * per query — bounded by construction, never corpus-sized. Output:
    * (query_id, neg_rank, neg_id). */
  def negativeSample(queries: DataFrame, pool: DataFrame,
                     queryIdCol: String, poolIdCol: String,
                     k: Int, seed: String): DataFrame = {
    require(k > 0, "k must be positive")
    val q = queries.select(col(queryIdCol).as("query_id"))
    val p = pool.select(col(poolIdCol).as("neg_id"))
    val h = conv(substring(md5(concat(
      col("query_id").cast("string"), lit("|"),
      col("neg_id").cast("string"), lit("|" + seed))), 1, 8), 16, 10)
      .cast("long")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__h"), col("neg_id"))
    q.crossJoin(broadcast(p))
      .filter(col("neg_id") =!= col("query_id"))
      .withColumn("__h", h)
      .withColumn("neg_rank", row_number().over(w).cast("int"))
      .filter(col("neg_rank") <= k)
      .select(col("query_id"), col("neg_rank"), col("neg_id"))
  }
}
