package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering plus the
  * per-partition column-stat envelopes that make it pay off.
  *
  * At 100 TB the win is in the WRITE path: `zorder` range-partitions and
  * locally sorts rows by their Morton code, so each output partition (→
  * file) covers a small hyper-rectangle of the key space. Any reader
  * that prunes on file-level min/max stats — parquet row-group stats, a
  * table-format manifest — then skips every file whose envelope misses a
  * multi-dimensional predicate, where a single-column sort only ever
  * prunes its leading column. `partitionStats` materializes exactly
  * those envelopes; LayoutSpec measures the skip rate against a hash
  * layout on a box predicate.
  *
  * Everything here is plain bitwise/aggregate Catalyst expressions —
  * whole-stage-codegen'd, no UDFs; the only shuffle in `zorder` is the
  * range exchange itself (its boundary sampling is a bounded pre-pass).
  */
object Layout {

  /** Morton code: bit `i` of `cols(j)` lands at output bit `i*k + j`
    * (LSB-first, k = number of columns), interleaving the dimensions so
    * close codes are close in every dimension. Callers pre-scale each
    * column into `[0, 2^bits)` (e.g. by modulo, ranking, or fixed-point
    * scaling); higher bits are masked off by construction. `k*bits <= 62`
    * keeps the code in a positive long. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits > 0 && bits * cols.size <= 62,
      s"bits*cols must fit a positive long, got $bits*${cols.size}")
    val k = cols.size
    val terms =
      for { i <- 0 until bits; (c, j) <- cols.zipWithIndex }
        yield shiftleft(
          shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` by the Morton code of `cols`: one range exchange into
    * `numPartitions` plus a local sort — the layout a `write.parquet`
    * of the result preserves file-by-file. */
  def zorder(df: DataFrame, cols: Seq[Column], bits: Int,
             numPartitions: Int): DataFrame =
    df.withColumn("__zv", zValue(cols, bits))
      .repartitionByRange(numPartitions, col("__zv"))
      .sortWithinPartitions("__zv")
      .drop("__zv")

  /** Per-partition row count + min/max envelope of `cols` — the stats a
    * table-format manifest (or parquet footer) would carry per file.
    * One cheap aggregate keyed by partition id. */
  def partitionStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.withColumn("__pid", spark_partition_id())
      .groupBy("__pid")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Small-file compaction plan (the OPTIMIZE step of a table format):
    * given a file manifest `(partCol, fileCol, bytesCol)`, assign the
    * files of each table partition to target output files of
    * ~`targetBytes` each by contiguous running-byte-sum binning, in
    * file-id order — the same exact cumsum binning as sequence packing
    * (`Chunking.packBins`), so the plan is integer-deterministic and
    * any engine reproduces it. Next-fit rather than first-fit-
    * decreasing: within 2× of optimal bin count, but append-stable
    * (new files never re-bin old ones) and expressible as one window —
    * no sequential driver loop over what may be millions of manifest
    * entries. A file larger than `targetBytes` gets its own target
    * (never split: compaction rewrites whole files).
    *
    * Plan: one hash shuffle of the MANIFEST (not the data) keyed by
    * the table partition + one cumsum window. Output: the manifest
    * plus `target_file` (0-based within partition); the executor
    * reads each (partition, target_file) group and writes one file. */
  def compactionPlan(manifest: DataFrame, partCol: String,
                     fileCol: String, bytesCol: String,
                     targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(col(fileCol))
    // greatest(0): a partition whose leading file(s) total 0 bytes has
    // cum = 0 there, and Spark's `div` truncates (-1 div N = 0) while
    // floor-division engines yield -1 — clamping pins both to bin 0
    manifest
      .withColumn("__cum", sum(col(bytesCol).cast("long")).over(w))
      .withColumn("target_file",
        greatest(lit(0L), expr(s"(__cum - 1) div ${targetBytes}L"))
          .cast("long"))
      .drop("__cum")
  }
}
