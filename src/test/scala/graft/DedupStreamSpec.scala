package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.DedupStream

/** Streaming minhash near-dup suppression: signature-exact tier and
  * banded LSH candidate tier, both sharing the batch kernels. */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and then naps " +
      "under a warm afternoon sun while birds sing in the tall trees"
  private val nearDup = base.replace("naps", "rests") // 1-word edit
  private val unrelated =
    "completely different content about spark shuffle partitions " +
      "catalyst optimizer rules and whole stage code generation output"

  test("signatureDedup admits first doc per signature only") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = DedupStream.signatureDedup(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("sigdedup")
      .outputMode("append").start()
    try {
      ms.addData((1L, base), (3L, unrelated))
      q.processAllAvailable()
      // identical text later in the stream → same signature → dropped
      ms.addData((7L, base))
      q.processAllAvailable()
      val ids = spark.table("sigdedup").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 3L))
    } finally q.stop()
  }

  test("band verdicts flag near-dups of stream history, keep novel docs") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = DedupStream.bandVerdicts(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      numHashes = 16, bands = 4)
      .writeStream.format("memory").queryName("bandv")
      .outputMode("append").start()
    try {
      ms.addData((1L, base), (2L, unrelated))
      q.processAllAvailable()
      ms.addData((5L, nearDup)) // should collide with doc 1 in ≥1 band
      q.processAllAvailable()
      val verdicts = spark.table("bandv")
      // each doc reports one verdict per band
      val perDoc = verdicts.groupBy("doc_id").count()
        .as[(Long, Long)].collect().toMap
      assert(perDoc == Map(1L -> 4L, 2L -> 4L, 5L -> 4L))
      // batch-side reduction: only the planted near-dup is a candidate
      val cands = DedupStream.candidateIds(verdicts)
        .as[Long].collect().toSeq
      assert(cands == Seq(5L))
      // sanity vs batch: the same pair is a batch LSH candidate too
      val batchPairs = graft.operators.Dedup.minhashLsh(
        Seq((1L, base), (2L, unrelated), (5L, nearDup))
          .toDF("doc_id", "text"),
        "doc_id", "text", numHashes = 16, bands = 4, threshold = 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(batchPairs.contains((1L, 5L)))
    } finally q.stop()
  }

  test("intra-batch tie goes to the lowest doc id") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = DedupStream.bandVerdicts(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      numHashes = 16, bands = 4)
      .writeStream.format("memory").queryName("bandtie")
      .outputMode("append").start()
    try {
      // same text twice in ONE micro-batch
      ms.addData((9L, base), (4L, base))
      q.processAllAvailable()
      val cands = DedupStream.candidateIds(spark.table("bandtie"))
        .as[Long].collect().toSeq
      assert(cands == Seq(9L))
    } finally q.stop()
  }
}
