package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Shared kernels for the native signature expressions. Called both from
  * interpreted eval and from generated Java (via the object's static
  * forwarders), so the hot loop runs as plain compiled code either way.
  *
  * Hash parity: murmur3(seed 42) matches `functions.hash`, xxhash64
  * (seed 42) matches `functions.xxhash64` — the Dedup HOF formulations
  * produce bit-identical results (cross-checked in NativeExprSpec).
  */
object MinHashKernel {

  /** Deterministic (a_i, b_i) seed pairs — same generator as the HOF
    * variant in Dedup.minhashSignature. */
  def seeds(numHashes: Int): (Array[Long], Array[Long]) = {
    val p = 2147483647L
    val rng = new scala.util.Random(42)
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      a(i) = math.abs(rng.nextInt(Int.MaxValue - 1)) + 1L
      b(i) = math.abs(rng.nextLong()) % p
      i += 1
    }
    (a, b)
  }

  def compute(shingles: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val p = 2147483647L
    val n = a.length
    val sig = new Array[Long](n)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    val m = shingles.numElements()
    while (i < m) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        val h: Long =
          Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
            s.numBytes(), 42).toLong
        var j = 0
        while (j < n) {
          val v = java.lang.Math.floorMod(a(j) * h + b(j), p)
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

object SimHashKernel {
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Long](64)
    var i = 0
    val m = tokens.numElements()
    while (i < m) {
      val s = tokens.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes(), 42L)
        var j = 0
        while (j < 64) {
          votes(j) += ((h >>> j) & 1L) * 2L - 1L
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      out = (out << 1) | (if (votes(j) > 0) 1L else 0L)
      j += 1
    }
    out
  }
}

/** Dense-vector kernels over `array<double>` columns. All folds run
  * left-to-right in index order — bit-identical to the HOF
  * `aggregate(zip_with(...))` formulations they replace (cross-checked in
  * NativeExprSpec), so oracle comparisons and recall specs are unaffected.
  * PRECONDITION: embedding arrays must not contain null elements. A
  * null slot is read as 0.0 (`ArrayData.getDouble` on a null entry) —
  * unlike the HOF twins, which would propagate NULL — so feeding nulls
  * yields numbers computed with zeros instead of a visible NULL.
  * Validate upstream (e.g. `forall(e, _.isNotNull)`) if the source can
  * carry nulls; the engine's own pipelines never produce them. */
object VecKernel {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  /** Squared L2 distance to each of k centroids, one pass per centroid in
    * index order (parity with k independent HOF folds). */
  def sqDists(e: ArrayData, cents: Array[Array[Double]]): ArrayData = {
    val k = cents.length
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val c = cents(j)
      val n = math.min(e.numElements(), c.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = e.getDouble(i) - c(i)
        s += d * d
        i += 1
      }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Index of the nearest centroid (ties to the lower index — same as
    * `array_position(dists, array_min(dists)) - 1`). */
  def nearest(e: ArrayData, cents: Array[Array[Double]]): Int = {
    val k = cents.length
    var best = 0
    var bestD = Double.PositiveInfinity
    var j = 0
    while (j < k) {
      val c = cents(j)
      val n = math.min(e.numElements(), c.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = e.getDouble(i) - c(i)
        s += d * d
        i += 1
      }
      if (s < bestD) { bestD = s; best = j }
      j += 1
    }
    best
  }

  /** Random-hyperplane sign bits: planesT is the nBits×dim plane matrix
    * flattened as [j*dim + i]. Accumulation order (outer i ascending,
    * inner j ascending) matches the single-fold HOF formulation in
    * Similarity.lshSignatureHof bit-for-bit. */
  def lshSignBits(e: ArrayData, planesT: Array[Double], nBits: Int): ArrayData = {
    val dim = math.min(e.numElements(), planesT.length / nBits)
    val acc = new Array[Double](nBits)
    var i = 0
    while (i < dim) {
      val x = e.getDouble(i)
      var j = 0
      while (j < nBits) {
        acc(j) += x * planesT(j * dim + i)
        j += 1
      }
      i += 1
    }
    val out = new Array[Int](nBits)
    var j = 0
    while (j < nBits) {
      out(j) = if (acc(j) >= 0) 1 else 0
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Dense mat-vec, `matT` row-major [k][d]: out(j) = Σ_i x(i)·m(j,i).
    * The [[lshSignBits]] accumulation loop without the sign step. */
  def matVec(e: ArrayData, matT: Array[Double], k: Int): ArrayData = {
    val dim = math.min(e.numElements(), matT.length / k)
    val acc = new Array[Double](k)
    var i = 0
    while (i < dim) {
      val x = e.getDouble(i)
      var j = 0
      while (j < k) {
        acc(j) += x * matT(j * dim + i)
        j += 1
      }
      i += 1
    }
    new GenericArrayData(acc)
  }
}

/** Native Catalyst expression: MinHash signature of a shingle array.
  * Whole-stage-codegen friendly (`doGenCode` emits a single kernel call);
  * replaces the interpreted higher-order-function formulation in the hot
  * path. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  private lazy val (seedA, seedB) = MinHashKernel.seeds(numHashes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.compute(input.asInstanceOf[ArrayData], seedA, seedB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("graftMhA", seedA, "long[]")
    val bRef = ctx.addReferenceObj("graftMhB", seedB, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashKernel.compute($c, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: 64-bit SimHash of a token array. */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHashKernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashKernel.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShardKernel {
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  /** Bit-identical to `conv(substring(md5(s), 1, 8), 16, 10) % buckets`
    * (the portable-hash recipe): MD5 of the UTF-8 bytes, first 4 digest
    * bytes read as an unsigned 32-bit integer, mod buckets — without
    * materializing the hex string or re-parsing it. */
  def bucket(s: UTF8String, buckets: Long): Long = {
    val md = mdPool.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v % buckets
  }
}

/** `graft_shard(str, buckets)`: the engine-portable md5 bucket used by
  * every deterministic split/sample/shard operator, as one codegen
  * kernel. Same number any engine computes from the recipe above.
  * Declares a STRING input so the analyzer inserts the same implicit
  * cast `Splits.bucket` applies — `graft_shard(doc_id, 16)` on a
  * BIGINT hashes the decimal string, exactly like the recipe, instead
  * of dying in codegen. */
case class PortableBucket(child: Expression, buckets: Long)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(buckets > 0, "buckets must be positive")

  // Seq is covariant and DataType is the public subtype of the
  // private[sql] AbstractDataType the trait declares
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    ShardKernel.bucket(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShardKernel.bucket($c, ${buckets}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramKernel {

  /** Distinct word n-gram shingles, first-occurrence order — exactly
    * `array_distinct(transform(sequence(1, greatest(1, size(ws)-(n-1))),
    * i => concat_ws(" ", slice(ws, i, n))))` over a non-null words array,
    * but one compiled pass instead of an interpreted lambda that
    * re-slices (and, when the words expression is inlined, re-splits) per
    * position. */
  def compute(ws: ArrayData, n: Int): ArrayData = {
    val m = ws.numElements()
    val upper = math.max(1, m - (n - 1))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < upper) {
      val hi = math.min(i + n, m)
      val parts = new Array[UTF8String](hi - i)
      var j = i
      while (j < hi) { parts(j - i) = ws.getUTF8String(j); j += 1 }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** Distinct word n-gram shingle HASHES (xxhash64 seed 42 — the same
    * value `functions.xxhash64` produces on the shingle string), skipping
    * the string-array materialization entirely. Set semantics match
    * `xxhash64` applied to `compute`'s output. */
  def computeHashes(ws: ArrayData, n: Int): ArrayData = {
    val m = ws.numElements()
    val upper = math.max(1, m - (n - 1))
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < upper) {
      val hi = math.min(i + n, m)
      val parts = new Array[UTF8String](hi - i)
      var j = i
      while (j < hi) { parts(j - i) = ws.getUTF8String(j); j += 1 }
      val g = UTF8String.concatWs(sep, parts: _*)
      seen.add(XXH64.hashUnsafeBytes(
        g.getBaseObject, g.getBaseOffset, g.numBytes(), 42L))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** ALL word n-gram window hashes in position order, WITH multiplicity
    * (one entry per window, not per distinct gram) — the window-level
    * identity stream that exact substring-duplication accounting needs.
    * Gram construction and xxhash64 seed match `computeHashes`. */
  def computeHashesAll(ws: ArrayData, n: Int): ArrayData = {
    val m = ws.numElements()
    val upper = math.max(1, m - (n - 1))
    val out = new Array[Long](upper)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < upper) {
      val hi = math.min(i + n, m)
      val parts = new Array[UTF8String](hi - i)
      var j = i
      while (j < hi) { parts(j - i) = ws.getUTF8String(j); j += 1 }
      val g = UTF8String.concatWs(sep, parts: _*)
      out(i) = XXH64.hashUnsafeBytes(
        g.getBaseObject, g.getBaseOffset, g.numBytes(), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: all n-gram window hashes, with
  * multiplicity, in position order. */
case class WordNgramHashesAll(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    NgramKernel.computeHashesAll(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramKernel.computeHashesAll($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: distinct word n-gram shingle hash array. */
case class WordNgramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    NgramKernel.computeHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramKernel.computeHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramStatsKernel {

  /** Per-document n-gram repetition stats over a words array: count of
    * the modal n-gram, distinct n-gram count, total n-gram count — one
    * hash-map pass per row, no shuffle. Gram construction matches
    * NgramKernel (slice i..i+n joined by one space; short docs yield a
    * single all-words gram). */
  def compute(ws: ArrayData, n: Int): InternalRow = {
    val m = ws.numElements()
    val upper = math.max(1, m - (n - 1))
    val counts = new java.util.HashMap[UTF8String, java.lang.Long]()
    val sep = UTF8String.fromString(" ")
    var top = 0L
    var i = 0
    while (i < upper) {
      val hi = math.min(i + n, m)
      val parts = new Array[UTF8String](hi - i)
      var j = i
      while (j < hi) { parts(j - i) = ws.getUTF8String(j); j += 1 }
      val g = UTF8String.concatWs(sep, parts: _*)
      val prev = counts.get(g)
      val c = if (prev == null) 1L else prev.longValue() + 1L
      counts.put(g, c)
      if (c > top) top = c
      i += 1
    }
    InternalRow(top, counts.size.toLong, upper.toLong)
  }
}

/** Native Catalyst expression: per-row n-gram repetition statistics
  * struct(top_ngram_n, n_distinct_ngrams, n_ngrams). */
case class NgramStats(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("top_ngram_n", LongType, nullable = false),
    StructField("n_distinct_ngrams", LongType, nullable = false),
    StructField("n_ngrams", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    NgramStatsKernel.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramStatsKernel.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: distinct word n-gram shingle array. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    NgramKernel.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramKernel.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: dot product of two `array<double>`. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecKernel.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: L2 norm of an `array<double>`. */
case class L2Norm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(input: Any): Any =
    VecKernel.norm(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecKernel.norm($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: squared L2 distances to a fixed centroid
  * matrix (the matrix rides along as a codegen reference object — it is
  * a trained model, tiny relative to the data). */
case class CentroidSqDists(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    VecKernel.sqDists(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("graftCents", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecKernel.sqDists($c, $cRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: nearest-centroid index (ties low). */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    VecKernel.nearest(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("graftCents", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecKernel.nearest($c, $cRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: random-hyperplane LSH sign bits. */
case class LshSignBits(child: Expression, planesT: Array[Double], nBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    VecKernel.lshSignBits(input.asInstanceOf[ArrayData], planesT, nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("graftPlanes", planesT, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecKernel.lshSignBits($c, $pRef, $nBits);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: dense mat-vec for random projection.
  * `matT` is row-major [k][d] (one row per OUTPUT dim), so the inner
  * loop streams the input vector once per output dim — the same
  * layout/codegen shape as [[LshSignBits]]. */
case class MatVecProject(child: Expression, matT: Array[Double], k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    VecKernel.matVec(input.asInstanceOf[ArrayData], matT, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("graftProj", matT, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecKernel.matVec($c, $mRef, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateKernel {
  // Deflater instances are expensive to create and not thread-safe;
  // one per executor thread, reset per row. Fixed level + raw-deflate
  // (no zlib header) so the byte count is a stable function of the
  // input on a given JVM.
  private val pool = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }
  private val bufPool = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 13)
  }

  /** Raw-deflate output byte count of the UTF-8 bytes. The scratch
    * buffer is drained, never grown — memory per thread is constant
    * regardless of document size. */
  def compressedSize(s: UTF8String): Long = {
    val d = pool.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = bufPool.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/** `graft_deflate_len(text)`: raw-deflate (zlib level 6) byte count of
  * the UTF-8 encoding — the kernel behind the compression-ratio
  * quality signal (Rae et al., Gopher 2021: near-incompressible docs
  * are noise/binary, hyper-compressible docs are boilerplate/
  * repetition). Per-row, zero-allocation steady state; deterministic
  * on a given JVM (rows-only in the oracle gate — zlib output is not
  * portable across engines). */
case class DeflateLength(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    DeflateKernel.compressedSize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateKernel.compressedSize($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcKernel {
  /** Unicode NFC canonical normalization. The common case (already
    * normalized, e.g. all-ASCII) is a quick-check scan that returns
    * the INPUT UTF8String — zero allocation; only genuinely
    * decomposed rows pay the String round-trip. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }
}

/** `graft_nfc(text)`: Unicode NFC normalization as a codegen scalar —
  * the canonicalization kernel under [[graft.operators.TextAnalysis
  * .nfcProfile]]. NFC composition mappings are frozen by the Unicode
  * stability policy, so the output is engine-portable (DuckDB's
  * utf8proc `nfc_normalize` agrees byte-for-byte) and oracle-checked
  * end to end. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NfcKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcKernel.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API entry points for the native expressions. */
object NativeExprs {
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    Bridge.column(
      MinHashSignature(Bridge.expression(shingles), numHashes))

  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  def wordNgrams(words: Column, n: Int): Column =
    Bridge.column(WordNgrams(Bridge.expression(words), n))

  def ngramStats(words: Column, n: Int): Column =
    Bridge.column(NgramStats(Bridge.expression(words), n))

  def wordNgramHashes(words: Column, n: Int): Column =
    Bridge.column(WordNgramHashes(Bridge.expression(words), n))

  def wordNgramHashesAll(words: Column, n: Int): Column =
    Bridge.column(WordNgramHashesAll(Bridge.expression(words), n))

  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def l2Norm(a: Column): Column =
    Bridge.column(L2Norm(Bridge.expression(a)))

  def centroidSqDists(emb: Column, centroids: Array[Array[Double]]): Column =
    Bridge.column(CentroidSqDists(Bridge.expression(emb), centroids))

  def nearestCentroid(emb: Column, centroids: Array[Array[Double]]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(emb), centroids))

  /** planes(j)(i): nBits hyperplanes over dim positions. */
  def lshSignBits(emb: Column, planes: Array[Array[Double]]): Column = {
    val nBits = planes.length
    val flat = planes.flatten
    Bridge.column(LshSignBits(Bridge.expression(emb), flat, nBits))
  }

  /** mat(j)(i): k output dims over input positions. */
  def matVecProject(emb: Column, mat: Array[Array[Double]]): Column = {
    val k = mat.length
    val flat = mat.flatten
    Bridge.column(MatVecProject(Bridge.expression(emb), flat, k))
  }

  def portableBucket(s: Column, buckets: Long): Column =
    Bridge.column(PortableBucket(Bridge.expression(s), buckets))

  def deflateLen(text: Column): Column =
    Bridge.column(DeflateLength(Bridge.expression(text)))

  def nfc(text: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(text)))
}
