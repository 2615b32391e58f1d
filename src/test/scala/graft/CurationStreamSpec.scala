package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Chunking, Dedup, Splits, TextAnalysis}
import graft.streaming.CurationStream

/** Parity of the streaming curation pipeline with the batch q98 stages
  * (gate → LSH dedup, higher id loses → weighted acceptance): streaming
  * the corpus in id-ascending micro-batches must land EXACTLY the rows
  * the batch pipeline keeps, and replaying a micro-batch must change
  * nothing. */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and " +
    "then naps under a warm afternoon sun while birds sing in the trees"
  private def variant(a: String, b: String) = base.replace(a, b)

  // 12 docs, ids ascending; near-dup pairs within batches (1~2), across
  // batches (1~7), a chain through a dropped doc (7~11), a short doc
  // that fails the gate (6), and novel content in both languages
  private val docs = Seq(
    (1L, "en", base),
    (2L, "en", variant("naps", "rests")),
    (3L, "da", "helt andet indhold om spark shuffle partitioner " +
      "catalyst optimering og kodegenerering i flere trin end normalt"),
    (4L, "en", "completely different content about spark shuffle " +
      "partitions catalyst optimizer rules and whole stage code " +
      "generation output for large clusters"),
    (6L, "en", "too short to pass"),
    (7L, "en", variant("naps", "dozes")),
    (8L, "da", "endnu en dansk tekst om vandmærker tilstandslagre og " +
      "mikrobatch forarbejdning af dokumenter i en produktionspipeline"),
    (11L, "en", variant("naps", "dozes").replace("dog", "cat")),
    (12L, "en", "entirely novel english prose describing bucket " +
      "histograms exact order statistics and broadcast joins at scale"))

  private val minWords = 10
  private val weight = CurationStream.langWeight(9000, 6000)

  private def batchReference = {
    val df = docs.toDF("doc_id", "lang", "text")
    val gated = df.filter(size(TextAnalysis.words(col("text"))) >= minWords)
    val dup = Dedup.minhashLshPortable(gated, "doc_id", "text",
        n = 3, numPerms = 8, bands = 4, minMatch = 6)
      .select(col("id_b").as("doc_id")).distinct()
    Splits.acceptByWeight(gated.join(dup, Seq("doc_id"), "left_anti"),
        "doc_id", weight, seed = "cur")
      .select("doc_id", "lang", "text")
  }

  test("streamed curation equals the batch pipeline, replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val indexPath = Files.createTempDirectory("graft-cur-index").toString + "/idx"
    val corpusPath = Files.createTempDirectory("graft-cur-corpus").toString + "/cor"
    val ckpt = Files.createTempDirectory("graft-cur-ckpt").toString

    val ms = MemoryStream[(Long, String, String)]
    val q = CurationStream.run(
      ms.toDF().toDF("doc_id", "lang", "text"), indexPath, corpusPath,
      ckpt, minWords, weight, seed = "cur")
    try {
      // id-ascending micro-batches (the ingest contract)
      ms.addData(docs.filter(_._1 <= 4))
      q.processAllAvailable()
      ms.addData(docs.filter(d => d._1 > 4 && d._1 <= 8))
      q.processAllAvailable()
      ms.addData(docs.filter(_._1 > 8))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(corpusPath)
      .select("doc_id", "lang", "text")
    val expect = batchReference
    assert(streamed.collect().map(_.toString).sorted.toSeq ==
      expect.collect().map(_.toString).sorted.toSeq)
    assert(streamed.count() > 0)
    // every gated doc (kept or dropped) is in the veto index
    val idxIds = spark.read.parquet(indexPath)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(idxIds == docs.map(_._1).filterNot(_ == 6L))

    // replaying the last micro-batch (at-least-once delivery) appends
    // nothing to either sink
    val before = streamed.collect().map(_.toString).sorted.toSeq
    CurationStream.commitBatch(
      docs.filter(_._1 > 8).toDF("doc_id", "lang", "text"),
      indexPath, corpusPath, minWords, weight, seed = "cur")
    val after = spark.read.parquet(corpusPath)
      .select("doc_id", "lang", "text").collect().map(_.toString).sorted.toSeq
    assert(after == before)
    assert(spark.read.parquet(indexPath).count() == idxIds.size)

    // the downstream packing stage sees identical corpora → identical
    // bin manifests (the full q98 tail holds under streaming)
    val packStream = Chunking.packBins(streamed, "doc_id", "text", "lang",
      binTokens = 64).collect().map(_.toString).sorted.toSeq
    val packBatch = Chunking.packBins(expect, "doc_id", "text", "lang",
      binTokens = 64).collect().map(_.toString).sorted.toSeq
    assert(packStream == packBatch)
  }
}
