package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{MinHashSignature, SimHash64}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so
  * `spark.sql.extensions=graft.GraftExtensions` exposes
  * `graft_minhash(array<string>, n)` and `graft_simhash(array<string>)`
  * to pure-SQL users.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) => args match {
        case Seq(arr, Literal(n: Int, _)) => MinHashSignature(arr, n)
        case _ => throw new IllegalArgumentException(
          "usage: graft_minhash(array<string>, numHashes int literal)")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (args: Seq[Expression]) => args match {
        case Seq(tokens) => SimHash64(tokens)
        case _ => throw new IllegalArgumentException(
          "usage: graft_simhash(array<string>)")
      }))
  }
}
