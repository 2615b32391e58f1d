package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import graft.functions.{MinHashSignature, NativeExprs, SimHash64}
import graft.operators.{Dedup, TextAnalysis}

class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "alpha beta gamma delta epsilon zeta eta theta",
    "one two three four five six seven eight nine",
    "x").toDF("text")

  test("native minhash signature is bit-identical to the HOF formulation") {
    val ws = TextAnalysis.words(col("text"))
    val sh = array_distinct(transform(
      sequence(lit(1), greatest(lit(1), size(ws) - 2)),
      i => concat_ws(" ", slice(ws, i, lit(3)))))
    val rows = texts.select(
      NativeExprs.minhashSignature(sh, 64).as("native"),
      Dedup.minhashSignature(sh, 64).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (n, h) => assert(n == h) }
  }

  test("native simhash is bit-identical to the HOF formulation") {
    val ws = TextAnalysis.words(col("text"))
    val rows = texts.select(
      NativeExprs.simhash64(ws).as("native"),
      Dedup.simhash(col("text")).as("hof"))
      .as[(Long, Long)].collect()
    rows.foreach { case (n, h) => assert(n == h) }
  }

  test("expressions survive codegen and handle nulls") {
    val withNull = Seq(Some("a b c d e"), None).toDF("text")
    val out = withNull.select(
      NativeExprs.simhash64(TextAnalysis.words(col("text"))).as("sh"))
      .as[Option[Long]].collect()
    assert(out(0).isDefined)
  }

  test("extension registers SQL functions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // builder-level check: the injected builders construct our expressions
    val mh = MinHashSignature(Literal("x"), 4)
    assert(mh.dataType.typeName == "array")
    val sh = SimHash64(Literal("x"))
    assert(sh.dataType.typeName == "long")
  }
}
