package graft

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tools.PlanLint

class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pq: String = {
    val dir = Files.createTempDirectory("graft-lint").toString
    (1 to 1000).map(i => (i.toLong, s"u${i % 7}", i * 10L))
      .toDF("id", "user", "amount")
      .write.mode("overwrite").parquet(s"$dir/t")
    s"$dir/t"
  }

  test("flags bare fact windows; accepts aggregate-bounded and bucketed ones") {
    val t = spark.read.parquet(pq)
    val bad = t.withColumn("rn",
      row_number().over(Window.orderBy(col("id"))))
    assert(PlanLint.lint(bad).exists(_.rule == "bare-fact-window"))

    val overAgg = t.groupBy("user").count()
      .withColumn("rn", row_number().over(Window.orderBy(col("user"))))
    assert(!PlanLint.lint(overAgg).exists(_.rule == "bare-fact-window"))

    val bucketed = t.withColumn("rn", row_number().over(
      Window.partitionBy(graft.operators.Splits.bucket(col("id"), 1000000))
        .orderBy(col("id"))))
    assert(!PlanLint.lint(bucketed).exists(_.rule == "bare-fact-window"))
  }

  test("flags cartesian and nested-loop joins") {
    val t = spark.read.parquet(pq)
    val small = Seq((1L, "x")).toDF("id2", "tag")
    val nlj = t.crossJoin(small)
    assert(PlanLint.lint(nlj).exists(f =>
      f.rule == "nested-loop-join" || f.rule == "cartesian-product"))

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val cart = t.crossJoin(spark.read.parquet(pq).select(col("id").as("id2")))
      assert(PlanLint.lint(cart).exists(_.rule == "cartesian-product"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // an equi-join is clean
    val eq = t.join(small.withColumnRenamed("id2", "id"), Seq("id"))
    assert(!PlanLint.lint(eq).exists(f =>
      f.rule == "cartesian-product" || f.rule == "nested-loop-join"))
  }

  test("flags filters that failed to push into the scan") {
    val t = spark.read.parquet(pq)
    // expression-wrapped predicate: cannot reach the parquet scan
    val bad = t.filter(upper(col("user")) === "U3")
    assert(PlanLint.lint(bad).exists(_.rule == "unpushed-filter"))
    // plain attribute predicate: pushed, clean (no residual filter on
    // non-null columns, or residual backed by pushed filters)
    val good = t.filter(col("amount") > 100L)
    assert(!PlanLint.lint(good).exists(_.rule == "unpushed-filter"))
  }

  test("counts shuffles against the budget") {
    val t = spark.read.parquet(pq)
    val shuffly = t.groupBy("user").agg(sum("amount").as("s"))
    assert(PlanLint.lint(shuffly, maxShuffles = 0)
      .exists(_.rule == "many-shuffles"))
    assert(!PlanLint.lint(shuffly, maxShuffles = 6)
      .exists(_.rule == "many-shuffles"))
    // report surface round-trips through a DataFrame
    val rep = PlanLint.lintReport(shuffly, maxShuffles = 0)
      .as[(String, String, String)].collect()
    assert(rep.exists(_._1 == "many-shuffles"))
  }
}
