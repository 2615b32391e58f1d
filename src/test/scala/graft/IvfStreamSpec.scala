package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Ivf
import graft.streaming.IvfStream

/** Streaming IVF postings maintenance: the streamed, replayed postings
  * table must be row-identical to a batch assignment of the same
  * vectors under the same (offline-trained) quantizer. */
class IvfStreamSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated planted clusters in 4-d
  private def vec(c: Int, j: Int): Seq[Float] = {
    val base = Array.fill(4)(0.0f)
    base(c) = 10.0f
    base((c + 1) % 4) = j * 0.1f
    base.toSeq
  }
  private val vectors: Seq[(Long, Seq[Float])] =
    (0 until 3).flatMap(c => (0 until 8).map(j =>
      ((c * 8 + j).toLong, vec(c, j))))

  test("streamed postings equal batch assign; replayed commit is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val df = vectors.toDF("vec_id", "embedding")
    val model = Ivf.train(df, "vec_id", "embedding", k = 3, iters = 2)
    val postings = Files.createTempDirectory("graft-ivf-post")
      .toString + "/postings"
    val ckpt = Files.createTempDirectory("graft-ivf-ckpt").toString

    val ms = MemoryStream[(Long, Seq[Float])]
    val q = IvfStream.run(ms.toDF.toDF("vec_id", "embedding"), model,
      postings, ckpt)
    try {
      ms.addData(vectors.take(10))
      q.processAllAvailable()
      ms.addData(vectors.drop(10))
      q.processAllAvailable()
    } finally q.stop()
    // at-least-once delivery: replay the first half out-of-band
    IvfStream.commitBatch(vectors.take(10).toDF("vec_id", "embedding"),
      model, postings)

    val streamed = spark.read.parquet(postings)
      .select("vec_id", "cluster_id").as[(Long, Int)].collect().sorted
    val batch = Ivf.assign(df, "vec_id", "embedding", model)
      .select("vec_id", "cluster_id").as[(Long, Int)].collect().sorted
    assert(streamed.length == vectors.length, "replay appended rows")
    assert(streamed.toSeq == batch.toSeq)
    // planted geometry: each 8-vector block lands in one cluster, and
    // the three blocks land in three distinct clusters
    val byBlock = batch.groupBy(_._1 / 8).view.mapValues(
      _.map(_._2).toSet).toMap
    assert(byBlock.values.forall(_.size == 1))
    assert(byBlock.values.flatten.toSet.size == 3)
  }
}
