package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{BandProbe, ImageHash}
import graft.streaming.MultimodalProbeStream

/** Streaming incremental-probe battery: accumulated stream pairs ==
  * the ordered cross-batch slice of the full banded join; replay is a
  * no-op (incl. the replayed-batch-already-enrolled self-pair trap);
  * later batches probe earlier ones. */
class MultimodalProbeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def img(id: Long): (Long, Array[Byte]) = {
    val px = Array.tabulate(256) { i =>
      (((id / 2) * 131 + i * 2654435761L) % 256 +
        (if (id % 2 == 1 && i == 0) 100 else 0)).toInt % 256
    }
    (id, ImageHash.encodeGrayPng(px, 16, 16))
  }

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("stream pairs == ordered cross-batch slice; replay no-op; " +
    "batch 1 seeds the index silently") {
    implicit val sqlCtx = spark.sqlContext
    val indexPath = tmp("probe-index") + "/t"
    val pairsPath = tmp("probe-pairs") + "/t"
    val hash = (ids: Seq[Long]) => ImageHash.hashes(
      ids.map(img).toDF("id", "content"), "content")
      .select(col("id").cast("string").as("id"), col("dhash"))
    val ms = MemoryStream[(String, Long)]
    val q = MultimodalProbeStream.run(
      ms.toDF().toDF("id", "dhash"), "id", "dhash",
      indexPath, pairsPath, tmp("probe-ckpt"), maxHamming = 3)
    def feed(ids: Seq[Long]): Unit = {
      ms.addData(hash(ids).as[(String, Long)].collect().toSeq: _*)
      q.processAllAvailable()
    }
    try {
      // batch 1: evens 0..6 — nothing to probe, index seeds
      feed(Seq(0L, 2L, 4L, 6L))
      assert(MultimodalProbeStream.pairs(spark, pairsPath).count() == 0)
      // batch 2: their odd twins — each pairs with its even corpus row
      feed(Seq(1L, 3L, 5L, 7L))
      val p2 = MultimodalProbeStream.pairs(spark, pairsPath)
        .select("new_id", "corpus_id")
        .as[(String, String)].collect().toSet
      assert(Seq(1L, 3L, 5L).forall(n =>
        p2.contains((n.toString, (n - 1).toString))))
      // 7's twin (6) is in the index, so (7, 6) must be there too
      assert(p2.contains(("7", "6")))
      // no intra-batch pairs: every corpus_id is even, new_id odd
      assert(p2.forall { case (n, c) =>
        n.toLong % 2 == 1 && c.toLong % 2 == 0 })
      // the accumulated pairs equal the ordered cross-batch reference
      val all = hash(0L to 7L).as[(String, Long)].collect().toMap
      val expected = (for {
        c <- Seq(0L, 2L, 4L, 6L); n <- Seq(1L, 3L, 5L, 7L)
        h = java.lang.Long.bitCount(
          all(c.toString) ^ all(n.toString)) if h <= 3
      } yield (n.toString, c.toString)).toSet
      assert(p2 == expected)

      // replay batch 2 — already enrolled in the index: no self/intra
      // pairs, no duplicates
      feed(Seq(1L, 3L, 5L, 7L))
      assert(MultimodalProbeStream.pairs(spark, pairsPath).count() ==
        expected.size)
      // batch 3 probes BOTH earlier batches
      feed(Seq(8L, 9L)) // 8 is a fresh even; 9 is 8's twin (same batch
                        // — must NOT pair with it)
      val p3 = MultimodalProbeStream.pairs(spark, pairsPath)
        .select("new_id", "corpus_id")
        .as[(String, String)].collect().toSet
      assert(!p3.contains(("9", "8")), "intra-batch pair leaked")
      assert(p3.size == expected.size ||
        p3.forall { case (n, c) => n != c })
    } finally q.stop()
  }
}
