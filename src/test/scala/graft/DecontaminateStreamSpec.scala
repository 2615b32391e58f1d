package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.SuffixDedup
import graft.streaming.DecontaminateStream

/** Streaming exact-substring decontamination: the cleaned-corpus view
  * after any interleaving of training-doc batches and protected-set
  * appends equals batch decontaminateExact against the full protected
  * set; replays and torn commits are completed, never skipped. */
class DecontaminateStreamSpec extends SparkSpec {
  import spark.implicits._

  private val leak = (1 to 12).map(i => s"bench$i").mkString(" ")
  private val leak2 = (1 to 8).map(i => s"secret$i").mkString(" ")

  private def reference(docs: Seq[(Long, String)],
                        bench: Seq[(Long, String)])
      : Set[(Long, Long, Long, String)] =
    SuffixDedup.decontaminateExact(docs.toDF("doc_id", "text"),
        bench.toDF("doc_id", "text"), "doc_id", "text", minLen = 4)
      .as[(Long, Long, Long, String)].collect().toSet

  test("streamed ingest + protected appends == batch decontamination " +
    "over the union; replays and torn commits are no-ops") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-decon-stream").toString
    val (cp, pp, rp) = (s"$root/corpus", s"$root/protected", s"$root/ranges")
    def cleanNow() = DecontaminateStream.clean(spark, cp, rp)
      .as[(Long, Long, Long, String)].collect().toSet

    val p1 = Seq(1000L -> s"eval set alpha $leak omega end")
    val p2 = Seq(1001L -> s"held out $leak2 rest of item")
    val d1 = Seq(
      1L -> s"train doc one $leak plus trailing words",
      2L -> "wholly clean document with no overlap at all")
    val d2 = Seq(
      3L -> s"later doc quoting $leak2 before the protected append",
      4L -> s"double hit $leak middle $leak2 tail tokens here")

    // protected set first (corpus still empty), then stream two
    // training batches, then a LATE protected append that must
    // retroactively cover docs 3 and 4
    DecontaminateStream.commitProtected(p1.toDF("doc_id", "text"),
      cp, pp, rp, minLen = 4)
    val ms = MemoryStream[(Long, String)]
    val q = DecontaminateStream.run(ms.toDF().toDF("doc_id", "text"),
      cp, pp, rp, s"$root/ckpt", minLen = 4)
    try {
      ms.addData(d1: _*); q.processAllAvailable()
      assert(cleanNow() == reference(d1, p1))
      ms.addData(d2: _*); q.processAllAvailable()
      // docs 3/4's leak2 spans are NOT yet cut (p2 not protected yet)
      assert(cleanNow() == reference(d1 ++ d2, p1))
    } finally q.stop()
    DecontaminateStream.commitProtected(p2.toDF("doc_id", "text"),
      cp, pp, rp, minLen = 4)
    val full = reference(d1 ++ d2, p1 ++ p2)
    assert(cleanNow() == full)
    assert(full.exists(r => r._1 == 3L && r._3 > 0),
      "late protected append did not retroactively cut doc 3")
    assert(full.exists(r => r._1 == 4L && r._3 >= 20),
      "doc 4 should lose both planted runs")

    // replays: both commit directions are idempotent
    DecontaminateStream.commitDocs(d2.toDF("doc_id", "text"),
      cp, pp, rp, minLen = 4)
    DecontaminateStream.commitProtected(p2.toDF("doc_id", "text"),
      cp, pp, rp, minLen = 4)
    assert(cleanNow() == full)
    assert(spark.read.parquet(cp).count() == (d1 ++ d2).size)
    assert(spark.read.parquet(pp).count() == (p1 ++ p2).size)

    // torn protected commit: p3's row is already (half-)appended to
    // the protected table when the commit is re-delivered — the
    // re-ranging must still cover the existing corpus
    val p3 = Seq(1002L -> "train doc one bench1 extra protected words")
    p3.toDF("doc_id", "text").write.mode("append").parquet(pp)
    DecontaminateStream.commitProtected(p3.toDF("doc_id", "text"),
      cp, pp, rp, minLen = 4)
    val full3 = reference(d1 ++ d2, p1 ++ p2 ++ p3)
    assert(cleanNow() == full3)
    assert(full3.exists(r => r._1 == 1L &&
      !r._4.contains("train doc one")),
      "p3's overlap with doc 1 was not cut")
    assert(spark.read.parquet(pp).count() == (p1 ++ p2 ++ p3).size)

    // no duplicate range rows across all those commits and replays
    val rows = spark.read.parquet(rp)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.length == rows.toSet.size, "duplicate range rows")
  }
}
