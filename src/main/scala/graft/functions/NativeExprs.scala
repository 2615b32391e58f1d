package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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

/** Column-API entry points for the native expressions. */
object NativeExprs {
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    Bridge.column(
      MinHashSignature(Bridge.expression(shingles), numHashes))

  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
}
