package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.LineDedupStream

/** Prefix-exactness of streaming line dedup: batch i's emitted rows
  * must equal the batch operator run over batches 0..i restricted to
  * batch i's ids, and a replayed commit must neither double-count the
  * index nor re-emit rows. */
class LineDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val banner = "ACCEPT COOKIES"
  private val footer = "all rights reserved"
  // the banner reaches minDocs=3 only in batch 1; the footer only in
  // batch 2 — so its earlier carriers keep it (prefix semantics)
  private val b0 = Seq(
    (1L, s"$banner\nalpha body one\n\n$footer"),
    (2L, s"$banner\nbeta body two"))
  private val b1 = Seq(
    (3L, s"$banner\ngamma body three\n$footer"),
    (4L, "delta body four\nunique line"))
  private val b2 = Seq(
    (5L, s"epsilon body five\n$footer"),
    (6L, s"$banner\nzeta body six\n  $footer  "))
  private val minDocs = 3

  private def prefixReference(upTo: Seq[Seq[(Long, String)]],
                              ids: Set[Long]): Map[Long, (Long, Long, String)] =
    Dedup.dedupLines(upTo.flatten.toDF("doc_id", "text"),
        "doc_id", "text", minDocs)
      .as[(Long, Long, Long, String)].collect()
      .filter(t => ids.contains(t._1))
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap

  test("each batch is cleaned with counts up to itself; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val idx = Files.createTempDirectory("graft-ld-idx").toString + "/idx"
    val out = Files.createTempDirectory("graft-ld-out").toString + "/out"
    val ckpt = Files.createTempDirectory("graft-ld-ckpt").toString

    val ms = MemoryStream[(Long, String)]
    val q = LineDedupStream.run(ms.toDF.toDF("doc_id", "text"),
      idx, out, ckpt, minDocs)
    try {
      for (b <- Seq(b0, b1, b2)) { ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    // replay batch 1 out-of-band with its original batch id
    LineDedupStream.commitBatch(b1.toDF("doc_id", "text"), idx, out,
      minDocs, batchId = 1L)
    // cross-batch re-delivery: doc 3 arrives AGAIN under a new batch
    // id (upstream retry) — already emitted, so it must count zero
    LineDedupStream.commitBatch(Seq(b1.head).toDF("doc_id", "text"),
      idx, out, minDocs, batchId = 99L)

    val got = spark.read.parquet(out)
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got.keySet == (b0 ++ b1 ++ b2).map(_._1).toSet,
      "replay re-emitted or dropped docs")

    val prefixes = Seq(Seq(b0), Seq(b0, b1), Seq(b0, b1, b2))
    prefixes.zip(Seq(b0, b1, b2)).foreach { case (prefix, batch) =>
      val want = prefixReference(prefix, batch.map(_._1).toSet)
      want.foreach { case (id, exp) =>
        assert(got(id) == exp, s"doc $id diverges from prefix batch run")
      }
    }
    // the banner was cut from batch-1 docs on (doc 3) but doc 1/2 kept
    // it (it was not yet boilerplate when they were emitted)
    assert(got(1L)._3.contains(banner) && got(3L)._3.startsWith("gamma"))
    // replay did not double-count: the index sums to one count per
    // (doc, line)
    val counts = spark.read.parquet(idx)
      .groupBy("__h").agg(sum("n_docs").as("n")).as[(Long, Long)]
      .collect().toMap
    assert(counts.values.max == 4L, "banner appears in 4 docs exactly")
  }
}
