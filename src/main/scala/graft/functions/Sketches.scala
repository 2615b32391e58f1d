package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches as typed [[Aggregator]]s — the custom-
  * AGGREGATE counterpart of the native scalar kernels in
  * [[NativeExprs]]. An Aggregator runs as a real Catalyst aggregate:
  * partial states per partition, map-side combine, one shuffle of the
  * (bounded) summaries — never of the raw rows.
  *
  * [[MisraGries]] is the mergeable Misra-Gries summary (Agarwal et al.,
  * "Mergeable Summaries", PODS'12): at most k counters; merging sums
  * counter-wise, then subtracts the (k+1)-th largest count from every
  * counter and drops the non-positive ones. Guarantees, for n rows
  * total: every item with true frequency > n/(k+1) SURVIVES in the
  * summary, and each surviving estimate undercounts its true frequency
  * by at most n/(k+1). Estimates (and which borderline items linger)
  * depend on merge order, so this is a diagnostic/candidate generator —
  * `Profile.heavyHitters` is the exact twin when a second pass is
  * affordable.
  */
object Sketches {

  type Summary = Map[String, Long]

  /** Counter-wise sum, then Misra-Gries shrink back to ≤ k counters. */
  private[graft] def mgMerge(a: Summary, b: Summary,
                                 k: Int): Summary = {
    val merged = b.foldLeft(a) { case (m, (v, c)) =>
      m.updated(v, m.getOrElse(v, 0L) + c)
    }
    if (merged.size <= k) merged
    else {
      // subtract the (k+1)-th largest count from everyone; ≤ k survive
      val cut = merged.values.toIndexedSeq.sorted(
        Ordering[Long].reverse)(k)
      merged.collect { case (v, c) if c > cut => v -> (c - cut) }
    }
  }

  /** Misra-Gries over a string column; emits the surviving counters as
    * (item, estimate) structs sorted by (estimate DESC, item). Null
    * items are ignored, like every built-in Spark aggregate. */
  final class MisraGries(k: Int)
      extends Aggregator[String, Summary, Seq[(String, Long)]] {
    require(k > 0, "k must be positive")
    def zero: Summary = Map.empty
    // classic O(1)-amortized single-item insert (decrement-all only on
    // overflow) — the per-ROW path must not pay merge()'s k·log k
    // shrink sort
    def reduce(b: Summary, a: String): Summary =
      if (a == null) b
      else b.get(a) match {
        case Some(c) => b.updated(a, c + 1L)
        case None if b.size < k => b.updated(a, 1L)
        case None => b.flatMap { case (v, c) =>
          if (c > 1L) Some(v -> (c - 1L)) else None
        }
      }
    def merge(b1: Summary, b2: Summary): Summary = mgMerge(b1, b2, k)
    def finish(r: Summary): Seq[(String, Long)] =
      r.toSeq.sortBy { case (v, c) => (-c, v) }
    // kryo buffer: the partial state is an opaque bounded map (≤ k
    // entries) that only this aggregate reads. The OUTPUT must be a
    // real array<struct> so callers can explode it — ExpressionEncoder
    // derives that from the Scala type.
    def bufferEncoder: Encoder[Summary] = Encoders.kryo[Summary]
    def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Column form: `approxTopK(col, k)` usable in any groupBy. */
  def approxTopK(c: Column, k: Int): Column =
    udaf(new MisraGries(k), Encoders.STRING).apply(c)

  /** Mergeable bottom-k DISTINCT sketch (KMV, Bar-Yossef et al.
    * RANDOM'02): the k smallest distinct values of a Long column. The
    * partial state is a bounded sorted set (≤ k longs); merging unions
    * and re-trims, and the FINAL result is exactly the k smallest
    * distinct values — deterministic regardless of partitioning or
    * merge order, unlike [[MisraGries]]. Over uniform hashes this is
    * the classic distinct-value/set-resemblance sketch: two corpora's
    * sketches union-merge into the sketch of their union, which is what
    * [[graft.operators.CorpusSim]] exploits for pairwise Jaccard. */
  final class BottomK(k: Int)
      extends Aggregator[java.lang.Long, scala.collection.immutable.TreeSet[Long], Seq[Long]] {
    require(k > 0, "k must be positive")
    type B = scala.collection.immutable.TreeSet[Long]
    def zero: B = scala.collection.immutable.TreeSet.empty[Long]
    def reduce(b: B, a: java.lang.Long): B =
      if (a == null) b
      else {
        val v = a.longValue()
        if (b.size < k) b + v
        else if (v >= b.last || b.contains(v)) b
        else (b + v) - b.last
      }
    def merge(b1: B, b2: B): B = {
      val u = b1 ++ b2
      if (u.size <= k) u else u.take(k)
    }
    def finish(r: B): Seq[Long] = r.toSeq
    def bufferEncoder: Encoder[B] = Encoders.kryo[B]
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Column form: `bottomK(col, k)` — exact k smallest distinct longs. */
  def bottomK(c: Column, k: Int): Column =
    udaf(new BottomK(k), Encoders.LONG).apply(c)

  /** Per-group approximate heavy hitters, exploded to scalar rows:
    * (group, item, estimate). */
  def approxHeavyHitters(df: DataFrame, groupCol: String,
                         keyCol: String, k: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approxTopK(col(keyCol).cast("string"), k).as("__top"))
      .select(col(groupCol), explode(col("__top")).as("__e"))
      .select(col(groupCol), col("__e._1").as("item"),
        col("__e._2").as("estimate"))

  /** Row hash for [[CountMin]]: a pure function of (row, item), so the
    * sketch is identical on every executor and across replays. */
  private[graft] def cmHash(row: Int, item: String, width: Int): Int =
    java.lang.Math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(item, row), width)

  /** Count-min sketch (Cormode & Muthukrishnan, J.Algorithms'05): a
    * depth×width counter matrix; each row increments one counter per
    * hash row, a point query takes the MINIMUM over the depth
    * counters. Always an OVERestimate; with n rows total the excess is
    * ≤ (e/width)·n with probability 1 − e^−depth. Merge is cell-wise
    * sum — unlike [[MisraGries]] the merged sketch is IDENTICAL
    * regardless of partitioning or merge order (SketchesSpec asserts
    * bit-parity with a sequential plain-Scala build), so estimates are
    * reproducible across cluster layouts, streaming restarts, and
    * window merges. Buffer is the flat long matrix — bounded,
    * map-side-combined, never the raw rows. */
  final class CountMin(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Seq[Long]] {
    require(depth > 0 && width > 0, "depth and width must be positive")
    def zero: Array[Long] = new Array[Long](depth * width)
    def reduce(b: Array[Long], a: String): Array[Long] = {
      if (a != null) {
        var r = 0
        while (r < depth) {
          b(r * width + cmHash(r, a, width)) += 1L
          r += 1
        }
      }
      b
    }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }
    def finish(r: Array[Long]): Seq[Long] = r.toSeq
    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Column form: `countMin(col, d, w)` usable in any groupBy. */
  def countMin(c: Column, depth: Int, width: Int): Column =
    udaf(new CountMin(depth, width), Encoders.STRING).apply(c)

  /** Point query against a collected [[CountMin]] sketch. */
  def cmEstimate(sketch: Seq[Long], depth: Int, width: Int,
                 item: String): Long = {
    require(sketch.length == depth * width, "sketch shape mismatch")
    (0 until depth).map(r => sketch(r * width + cmHash(r, item, width))).min
  }

  /** KLL-style compactor state: `levels(i)` holds items of weight 2^i
    * (level 0 unsorted raw arrivals), `flips` drives the deterministic
    * even/odd compaction coin. */
  final case class KllState(levels: Vector[Vector[Long]], flips: Long)

  /** Mergeable quantile sketch (KLL compactor hierarchy, Karnin, Lang
    * & Liberty FOCS'16 — uniform-capacity variant): the missing
    * QUANTILE member of the sketch family ([[MisraGries]] frequencies,
    * [[BottomK]] distinctness, [[CountMin]] point counts). A level-i
    * compaction sorts its ≥ k items and promotes every other one to
    * level i+1 (weight doubles), so the state stays ≤ k·levels longs;
    * each compaction perturbs any rank by ≤ 2^i, and with ≤ n/(k·2^i)
    * compactions per level the TOTAL rank error is ≤ n·H/k,
    * H = ⌈log2(n/k)⌉ + 2 — the bound [[kllRankErrorBound]] exposes and
    * SketchesSpec asserts across partition layouts. The coin is the
    * deterministic flip counter (a replayed partition re-compacts
    * identically); like Misra-Gries the result depends on merge order
    * but the GUARANTEE does not. Exact (zero error) while n < k.
    *
    * finish() emits sorted (value, weight) pairs; query quantiles with
    * [[kllQuantile]] by cumulative-weight walk. */
  final class Kll(k: Int)
      extends Aggregator[java.lang.Long, KllState, Seq[(Long, Long)]] {
    require(k >= 8, "capacity must be >= 8")
    def zero: KllState = KllState(Vector(Vector.empty), 0L)
    def reduce(b: KllState, a: java.lang.Long): KllState =
      if (a == null) b
      else compact(b.copy(levels =
        b.levels.updated(0, b.levels(0) :+ a.longValue())))
    def merge(b1: KllState, b2: KllState): KllState = {
      val h = math.max(b1.levels.size, b2.levels.size)
      def at(s: KllState, i: Int): Vector[Long] =
        if (i < s.levels.size) s.levels(i) else Vector.empty
      compact(KllState(
        Vector.tabulate(h)(i => at(b1, i) ++ at(b2, i)),
        b1.flips + b2.flips))
    }
    private def compact(s0: KllState): KllState = {
      var s = s0
      var i = 0
      while (i < s.levels.size) {
        if (s.levels(i).size >= k) {
          val sorted = s.levels(i).sorted
          // an odd count can't halve weight-exactly: the largest item
          // stays behind so Σ weight is preserved bit-for-bit
          val (toCompact, leftover) =
            if (sorted.size % 2 == 0) (sorted, Vector.empty[Long])
            else (sorted.init, Vector(sorted.last))
          val offset = (s.flips % 2).toInt
          val kept = toCompact.indices.collect {
            case j if j % 2 == offset => toCompact(j)
          }.toVector
          val levels0 =
            if (i + 1 < s.levels.size) s.levels
            else s.levels :+ Vector.empty[Long]
          s = KllState(
            levels0.updated(i, leftover)
              .updated(i + 1, levels0(i + 1) ++ kept),
            s.flips + 1)
        }
        i += 1
      }
      s
    }
    def finish(r: KllState): Seq[(Long, Long)] =
      r.levels.zipWithIndex.flatMap { case (items, lvl) =>
        items.map(v => (v, 1L << lvl))
      }.sortBy(_._1)
    def bufferEncoder: Encoder[KllState] = Encoders.kryo[KllState]
    def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Column form: `kllSketch(col, k)` usable in any groupBy. */
  def kllSketch(c: Column, k: Int): Column =
    udaf(new Kll(k), Encoders.LONG).apply(c)

  /** Quantile query against a collected [[Kll]] sketch: the value at
    * cumulative weight ≥ ⌈q·W⌉ (q in basis points, exact rank walk). */
  def kllQuantile(sketch: Seq[(Long, Long)], qBp: Long): Long = {
    require(sketch.nonEmpty, "empty sketch")
    require(qBp >= 0 && qBp <= 10000, s"qBp $qBp outside [0, 10000]")
    val w = sketch.map(_._2).sum
    val target = math.max(1L, (qBp * w + 9999L) / 10000L)
    var cum = 0L
    for ((v, wt) <- sketch) {
      cum += wt
      if (cum >= target) return v
    }
    sketch.last._1
  }

  /** The worst-case rank error of [[Kll]] at capacity k over n rows. */
  def kllRankErrorBound(n: Long, k: Int): Long =
    if (n <= k) 0L
    else {
      val h = (64 - java.lang.Long.numberOfLeadingZeros(n / k)) + 2
      n * h / k
    }
}
