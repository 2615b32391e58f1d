package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Expectations
import graft.streaming.ExpectationsStream

class ExpectationsStreamSpec extends SparkSpec {
  import spark.implicits._

  test("cumulative report equals batch validate over the union; replays are no-ops") {
    val dir = Files.createTempDirectory("graft-exp-stream").toString
    val path = s"$dir/report"
    val checks = Seq(
      Expectations.notNull("v"),
      Expectations.inRange("qty", 1, 10))

    val b1 = Seq((Option("a"), 5L), (Option.empty[String], 20L))
      .toDF("v", "qty")
    val b2 = Seq((Option("b"), 11L), (Option("c"), 3L),
      (Option.empty[String], 1L)).toDF("v", "qty")

    ExpectationsStream.commitBatch(b1, checks, path, batchId = 0L)
    ExpectationsStream.commitBatch(b2, checks, path, batchId = 1L)
    // at-least-once redelivery of batch 1: nothing double-counts
    ExpectationsStream.commitBatch(b2, checks, path, batchId = 1L)

    val got = ExpectationsStream.report(spark, path)
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val want = Expectations.validate(b1.unionByName(b2), checks)
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == want)
    assert(got("not_null(v)") == ((2L, 5L)))
    assert(got("in_range(qty,1,10)") == ((2L, 5L)))
    // empty batches commit nothing
    ExpectationsStream.commitBatch(
      Seq.empty[(Option[String], Long)].toDF("v", "qty"),
      checks, path, batchId = 2L)
    assert(ExpectationsStream.report(spark, path)
      .agg(sum(col("total"))).as[Long].head() == 10L) // 2x5 rule rows
  }
}
