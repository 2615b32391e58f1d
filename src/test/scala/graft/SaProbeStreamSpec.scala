package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.SuffixDedup
import graft.streaming.SaProbeStream

/** Streaming incremental ExactSubstr: per micro-batch, the arriving
  * docs' excision ranges against the corpus-so-far equal the full
  * rebuild over everything-seen restricted to the batch; replays and
  * the half-committed-corpus crash window are no-ops. */
class SaProbeStreamSpec extends SparkSpec {
  import spark.implicits._

  private val shared = (1 to 12).map(i => s"dup$i").mkString(" ")

  /** Full-rebuild reference: exciseRanges over duplicatedSpans of all
    * docs seen through the batch, restricted to the batch's ids. */
  private def reference(seen: Seq[(Long, String)], batchIds: Set[Long])
      : Set[(Long, Long, Long, Long)] =
    SuffixDedup.exciseRanges(SuffixDedup.duplicatedSpans(
        seen.toDF("doc_id", "text"), "doc_id", "text", minLen = 4))
      .as[(Long, Long, Long, Long)].collect().toSet
      .filter(r => batchIds.contains(r._1))

  private def rangesAt(path: String): Set[(Long, Long, Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else spark.read.parquet(path)
      .select("doc", "cut_from", "cut_until", "n_spans")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("per-batch ranges == full rebuild restricted to the batch; " +
    "replay and the half-committed-corpus window are no-ops") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-sa-stream").toString
    val (corpusP, rangesP) = (s"$root/corpus", s"$root/ranges")
    val b1 = Seq(
      1L -> s"alpha beta $shared gamma delta",
      2L -> "solo corpus words appearing nowhere else at all")
    val b2 = Seq(
      10L -> s"x1 x2 $shared y1",          // duplicates doc 1's span
      11L -> s"pre $shared post",           // and again
      12L -> "fresh batch only content")
    val b3 = Seq(
      20L -> s"tail copy $shared end",      // duplicates history
      21L -> "rep rep rep rep rep")         // self-repetition only
    val ms = MemoryStream[(Long, String)]
    val q = SaProbeStream.run(ms.toDF().toDF("doc_id", "text"),
      corpusP, rangesP, s"$root/ckpt", minLen = 4)
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      assert(rangesAt(rangesP) == reference(b1, b1.map(_._1).toSet))
      val after1 = rangesAt(rangesP)
      ms.addData(b2: _*); q.processAllAvailable()
      val ref2 = reference(b1 ++ b2, b2.map(_._1).toSet)
      assert(rangesAt(rangesP) == after1 ++ ref2)
      assert(ref2.nonEmpty, "planted cross-batch duplicate not cut")
      // corpus now holds every doc exactly once
      assert(spark.read.parquet(corpusP).select("doc_id")
        .as[Long].collect().sorted.toSeq == (b1 ++ b2).map(_._1).sorted)
    } finally q.stop()
    val committed = rangesAt(rangesP)

    // replay: re-delivering batch 2 through the direct commit path
    // changes neither sink (doc-keyed anti-joins)
    SaProbeStream.commitBatch(b2.toDF("doc_id", "text"),
      corpusP, rangesP, minLen = 4)
    assert(rangesAt(rangesP) == committed)
    assert(spark.read.parquet(corpusP).count() == (b1 ++ b2).size)

    // crash window: batch 3's rows are ALREADY (half-)appended to the
    // corpus when the batch is re-delivered — the probe must not pair
    // docs against their own corpus copies
    b3.toDF("doc_id", "text").write.mode("append").parquet(corpusP)
    SaProbeStream.commitBatch(b3.toDF("doc_id", "text"),
      corpusP, rangesP, minLen = 4)
    val ref3 = reference(b1 ++ b2 ++ b3, b3.map(_._1).toSet)
    assert(rangesAt(rangesP) == committed ++ ref3)
    // within-batch self-repetition was cut, and doc 21 got exactly its
    // full-rebuild ranges (no self-pairing inflation from the window)
    assert(ref3.exists(_._1 == 21L))
    // corpus did not double batch 3's rows
    assert(spark.read.parquet(corpusP).count() ==
      (b1 ++ b2 ++ b3).size)
    val committed3 = rangesAt(rangesP)

    // partial-RANGES-commit window (r14 advice): a parquet job commit
    // is not atomic across task files, so a crash mid ranges-append
    // can expose SOME of a doc's range rows. The replay must append
    // the missing rows (full-row anti-join), not skip the doc because
    // its key is already present.
    val b4 = Seq(
      30L -> s"$shared gap1 gap2 gap3 gap4 gap5 $shared")
    val ref4 = reference(b1 ++ b2 ++ b3 ++ b4, Set(30L))
    assert(ref4.size >= 2, s"need a multi-range doc, got $ref4")
    // simulate the torn commit: exactly one of doc 30's range rows
    // became visible before the crash; the corpus append never ran
    Seq(ref4.minBy(_._2)).toDF("doc", "cut_from", "cut_until", "n_spans")
      .write.mode("append").parquet(rangesP)
    SaProbeStream.commitBatch(b4.toDF("doc_id", "text"),
      corpusP, rangesP, minLen = 4)
    assert(rangesAt(rangesP) == committed3 ++ ref4)
    // and no row was double-appended (Set equality alone would hide it)
    val allRows = spark.read.parquet(rangesP)
      .select("doc", "cut_from", "cut_until", "n_spans")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(allRows.length == allRows.toSet.size, "duplicate range rows")
  }
}
