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

  test("bandVerdictsTtl evicts bucket owners past the event-time lease") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val unrelated2 =
      "yet another body of text regarding broadcast joins adaptive " +
        "execution skew handling and dynamic partition pruning at scale"
    val q = DedupStream.bandVerdictsTtl(
      ms.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text",
      tsCol = "ts", watermark = "0 seconds", ttlMs = 60000L, // 1-min lease
      numHashes = 16, bands = 4)
      .writeStream.format("memory").queryName("bandttl")
      .outputMode("append").start()
    try {
      ms.addData((1L, base, ts(0)))   // doc 1 owns its buckets; lease 10:01
      q.processAllAvailable()         // watermark after batch: 10:00
      ms.addData((2L, unrelated, ts(10)))
      q.processAllAvailable()         // batch ran at wm 10:00 → no eviction yet
      ms.addData((3L, unrelated2, ts(20)))
      q.processAllAvailable()         // ran at wm 10:10 > 10:01 → doc 1 evicted
      // freed buckets are claimable: doc 4 (same text as doc 1) becomes
      // the new owner; doc 5 in the same batch proves flagging still works
      ms.addData((4L, base, ts(21)), (5L, base, ts(21)))
      q.processAllAvailable()
      val verdicts = spark.table("bandttl")
      val cands = DedupStream.candidateIds(verdicts)
        .as[Long].collect().toSeq
      assert(cands == Seq(5L)) // doc 4 is NOT a candidate — state was evicted
      val doc4 = verdicts.filter(col("doc_id") === 4L)
        .select("first").as[Boolean].collect()
      assert(doc4.length == 4 && doc4.forall(identity))
    } finally q.stop()
  }

  test("probeStream matches the batch probe, pairs idempotent across bands") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((0L, base), (2L, unrelated)).toDF("doc_id", "text")
    val ms = MemoryStream[(Long, String)]
    val q = DedupStream.probeStream(
      ms.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text",
      n = 3, numPerms = 8, bands = 4, minMatch = 4)
      .writeStream.format("memory").queryName("probe")
      .outputMode("append").start()
    try {
      ms.addData((11L, nearDup), (13L, "nothing shared with anything"))
      q.processAllAvailable()
      ms.addData((15L, base)) // exact copy of corpus doc 0
      q.processAllAvailable()
      val got = spark.table("probe")
        .as[(Long, Long, Long)].collect().toSet // distinct verdicts
      val batch = graft.operators.Dedup.minhashProbePortable(
        corpus,
        Seq((11L, nearDup), (13L, "nothing shared with anything"),
          (15L, base)).toDF("doc_id", "text"),
        "doc_id", "text", n = 3, numPerms = 8, bands = 4, minMatch = 4)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == batch)
      // the planted copies hit corpus doc 0, the unrelated doc is clean
      assert(got.map(_._1).intersect(Set(11L, 15L)) == Set(11L, 15L))
      assert(!got.map(_._1).contains(13L))
      // stateless plan: duplicate band hits exist pre-distinct, but all
      // carry the same verdict per (new, corpus) pair
      val perPair = spark.table("probe")
        .groupBy("new_id", "corpus_id")
        .agg(count_distinct(col("n_match")).as("nv"))
        .select("nv").as[Long].collect()
      assert(perPair.forall(_ == 1L))
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
