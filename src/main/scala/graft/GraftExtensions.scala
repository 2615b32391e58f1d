package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so
  * `spark.sql.extensions=graft.GraftExtensions` exposes them to
  * pure-SQL users:
  *
  *   - `graft_minhash(array<string>, n)` → array<bigint>
  *   - `graft_simhash(array<string>)` → bigint
  *   - `graft_ngrams(array<string>, n)` → array<string> (distinct
  *     word n-gram shingles)
  *   - `graft_ngram_hashes(array<string>, n)` → array<bigint>
  *   - `graft_ngram_stats(array<string>, n)` → struct (repetition stats)
  *   - `graft_dot(array<double>, array<double>)` → double
  *   - `graft_norm(array<double>)` → double
  *   - `graft_deflate_len(string)` → bigint (raw-deflate byte count,
  *     the compression-ratio quality kernel)
  *   - `graft_nfc(string)` → string (Unicode NFC normalization,
  *     engine-portable per the Unicode stability policy)
  *   - `graft_shard(string, buckets)` → bigint (engine-portable md5
  *     bucket — the deterministic split/sample/shard primitive)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intLit(e: Expression, usage: String): Int = e match {
    case Literal(n: Int, _) => n
    case _ => throw new IllegalArgumentException(usage)
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) => args match {
        case Seq(arr, n) => MinHashSignature(arr,
          intLit(n, "usage: graft_minhash(array<string>, numHashes int literal)"))
        case _ => throw new IllegalArgumentException(
          "usage: graft_minhash(array<string>, numHashes int literal)")
      }),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (args: Seq[Expression]) => args match {
        case Seq(tokens) => SimHash64(tokens)
        case _ => throw new IllegalArgumentException(
          "usage: graft_simhash(array<string>)")
      }),
    (FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "graft_ngrams"),
      (args: Seq[Expression]) => args match {
        case Seq(ws, n) => WordNgrams(ws,
          intLit(n, "usage: graft_ngrams(array<string>, n int literal)"))
        case _ => throw new IllegalArgumentException(
          "usage: graft_ngrams(array<string>, n int literal)")
      }),
    (FunctionIdentifier("graft_ngram_hashes"),
      new ExpressionInfo(classOf[WordNgramHashes].getName, "graft_ngram_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(ws, n) => WordNgramHashes(ws,
          intLit(n, "usage: graft_ngram_hashes(array<string>, n int literal)"))
        case _ => throw new IllegalArgumentException(
          "usage: graft_ngram_hashes(array<string>, n int literal)")
      }),
    (FunctionIdentifier("graft_ngram_stats"),
      new ExpressionInfo(classOf[NgramStats].getName, "graft_ngram_stats"),
      (args: Seq[Expression]) => args match {
        case Seq(ws, n) => NgramStats(ws,
          intLit(n, "usage: graft_ngram_stats(array<string>, n int literal)"))
        case _ => throw new IllegalArgumentException(
          "usage: graft_ngram_stats(array<string>, n int literal)")
      }),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException(
          "usage: graft_dot(array<double>, array<double>)")
      }),
    (FunctionIdentifier("graft_norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "graft_norm"),
      (args: Seq[Expression]) => args match {
        case Seq(a) => L2Norm(a)
        case _ => throw new IllegalArgumentException(
          "usage: graft_norm(array<double>)")
      }),
    (FunctionIdentifier("graft_shard"),
      new ExpressionInfo(classOf[PortableBucket].getName, "graft_shard"),
      (args: Seq[Expression]) => args match {
        case Seq(s, n) => PortableBucket(s, intLit(n,
          "usage: graft_shard(string, buckets int literal)").toLong)
        case _ => throw new IllegalArgumentException(
          "usage: graft_shard(string, buckets int literal)")
      }),
    (FunctionIdentifier("graft_deflate_len"),
      new ExpressionInfo(classOf[DeflateLength].getName, "graft_deflate_len"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => DeflateLength(s)
        case _ => throw new IllegalArgumentException(
          "usage: graft_deflate_len(string)")
      }),
    (FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => NfcNormalize(s)
        case _ => throw new IllegalArgumentException(
          "usage: graft_nfc(string)")
      }))

  /** Register the same functions into an already-running session (for
    * sessions not launched with `spark.sql.extensions`). */
  def registerInto(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
