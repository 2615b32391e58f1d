package graft

import org.apache.spark.sql.functions._

import graft.ml.Quality
import graft.operators.Similarity

/** MLlib pipeline integration: weak-label quality classifier and the
  * MLlib-KMeans-backed IVF quantizer. */
class MlSpec extends SparkSpec {
  import spark.implicits._

  private val docs = graft.core.Tables.load(spark,
    "/root/testdata/sf0.001", "documents")

  test("weak-label quality classifier reproduces the heuristic") {
    val model = Quality.trainWeak(docs, "doc_id", "text", tau = 0.5)
    val scored = Quality.score(model, docs, "doc_id", "text")
    assert(scored.columns.toSeq == Seq("doc_id", "p_good", "prediction"))
    // agreement of the learned model with its weak teacher on the
    // training corpus — the signals carry most of the heuristic
    val withLabel = Quality.signals(docs, "doc_id", "text")
      .withColumn("label", (col("quality") >= 0.5).cast("double"))
      .select("doc_id", "label")
      .join(scored, "doc_id")
    val agree = withLabel
      .filter(col("label") === col("prediction")).count().toDouble /
      withLabel.count()
    assert(agree >= 0.7, s"teacher agreement was $agree")
    // probabilities are probabilities
    val bad = scored.filter(col("p_good") < 0 || col("p_good") > 1).count()
    assert(bad == 0)
  }

  test("fitted pipeline round-trips through save/load") {
    val model = Quality.trainWeak(docs, "doc_id", "text", tau = 0.5)
    val dir = java.nio.file.Files.createTempDirectory("graft-ml").toString
    model.write.overwrite().save(dir)
    val loaded = org.apache.spark.ml.PipelineModel.load(dir)
    val a = Quality.score(model, docs, "doc_id", "text")
      .orderBy("doc_id").select("prediction").as[Double].collect().toSeq
    val b = Quality.score(loaded, docs, "doc_id", "text")
      .orderBy("doc_id").select("prediction").as[Double].collect().toSeq
    assert(a == b)
  }

  test("MLlib KMeans quantizer matches hand-rolled IVF recall bar") {
    val rnd = new scala.util.Random(5)
    val clustered = (0 until 200).map { i =>
      val c = i % 4
      val center = Array.tabulate(16)(j => if (j % 4 == c) 1.0f else 0.0f)
      (i.toLong, center.map(x => x + rnd.nextGaussian().toFloat * 0.05f), c)
    }.toDF("vec_id", "embedding", "label")
    val model = graft.operators.Ivf.trainMllib(clustered, "vec_id",
      "embedding", k = 8, iters = 5)
    assert(model.k == 8 && model.centroids.head.length == 16)
    val exact = Similarity.topK(clustered, "vec_id", "embedding",
      col("vec_id") < 8, k = 5).as[(Long, Int, Long)].collect()
      .map(r => (r._1, r._3)).toSet
    val approx = graft.operators.Ivf.topK(clustered, "vec_id", "embedding",
      col("vec_id") < 8, k = 5, model, nprobe = 3)
      .as[(Long, Int, Long)].collect().map(r => (r._1, r._3)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall was $recall")
  }
}
