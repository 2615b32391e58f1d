package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour search: a coarse
  * k-means quantizer partitions the corpus into cluster lists; a query
  * scores only the vectors in its `nprobe` closest clusters.
  *
  * Scale design: the trained model (k × dim centroid matrix) is tiny and
  * lives on the driver like any ML model; training and assignment are
  * DataFrame passes (posexplode + groupBy mean — map-side combined).
  * Search joins the (broadcast) query×probe pairs against the
  * cluster-partitioned corpus: each query touches ~nprobe/k of the data.
  * Bucketing/partitioning the assigned corpus by `cluster_id` makes the
  * probe join co-located at warehouse scale.
  */
object Ivf {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  /** Persist a trained quantizer as a tiny parquet table
    * (cluster_id, centroid) — the index artifact a production search
    * tier loads at startup instead of retraining. */
  def save(spark: org.apache.spark.sql.SparkSession, m: Model,
           path: String): Unit = {
    import spark.implicits._
    m.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster_id", "centroid")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession,
           path: String): Model = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select("cluster_id", "centroid")
      .as[(Int, Seq[Double])].collect().sortBy(_._1)
    require(rows.nonEmpty, s"no centroids at $path")
    require(rows.map(_._1).toSeq == rows.indices.toSeq,
      s"non-contiguous cluster ids at $path")
    Model(rows.map(_._2.toArray))
  }

  /** Nearest-centroid id (ties to the lower id). Native codegen kernel —
    * the k×dim distance loop runs once per row as compiled Java; the HOF
    * formulation (k independent aggregate(zip_with) folds) re-evaluated
    * the embedding cast per centroid with no codegen. */
  private def assignCol(emb: Column, m: Model): Column =
    graft.functions.NativeExprs.nearestCentroid(
      emb.cast("array<double>"), m.centroids)

  /** Train a coarse quantizer: deterministic spread seeds (min id per
    * id-hash bucket) + `iters` Lloyd iterations. */
  def train(df: DataFrame, idCol: String, embCol: String,
            k: Int, iters: Int = 2): Model = {
    val v = df.select(col(idCol).as("__id"),
      Similarity.toDouble(col(embCol)).as("__e"))
    val seedIds = v.groupBy(pmod(xxhash64(col("__id")), lit(k)).as("__b"))
      .agg(min(col("__id")).as("__id")).select("__id")
    var model = Model(
      v.join(seedIds, "__id").orderBy("__id").collect()
        .map(_.getAs[scala.collection.Seq[Double]]("__e").toArray))
    var it = 0
    while (it < iters) {
      val assigned = v.withColumn("__c", assignCol(col("__e"), model))
      val means = assigned
        .select(col("__c"), posexplode(col("__e")))
        .groupBy("__c", "pos").agg(avg("col").as("m"))
        .collect()
      val dim = model.centroids.head.length
      val next = model.centroids.map(_.clone())
      means.foreach { r =>
        next(r.getAs[Int]("__c"))(r.getAs[Int]("pos")) = r.getAs[Double]("m")
      }
      model = Model(next)
      it += 1
    }
    model
  }

  /** MLlib-backed coarse quantizer: `org.apache.spark.ml.clustering
    * .KMeans` (k-means||, seeded) in place of the hand-rolled Lloyd
    * loop. Same `Model` out, so `assign`/`topK` — and their codegen'd
    * distance kernels — are unchanged; use this where the MLlib
    * estimator's init and convergence handling matter more than
    * deterministic seed placement. `idCol` is unused (kept for
    * signature symmetry with `train`, which seeds from ids). */
  def trainMllib(df: DataFrame, idCol: String, embCol: String,
                 k: Int, iters: Int = 5, seed: Long = 42L): Model = {
    val v = df.select(org.apache.spark.ml.functions.array_to_vector(
      Similarity.toDouble(col(embCol))).as("features"))
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setMaxIter(iters).setSeed(seed).setFeaturesCol("features")
    Model(km.fit(v).clusterCenters.map(_.toArray))
  }

  /** Corpus with its cluster assignment (partition/bucket by this column
    * for co-located probe joins at scale). */
  def assign(df: DataFrame, idCol: String, embCol: String,
             m: Model): DataFrame =
    df.withColumn("cluster_id",
      assignCol(Similarity.toDouble(col(embCol)), m))

  /** Approximate top-k: score only the `nprobe` closest clusters of each
    * query. Output: (query_id, rank, neighbor_id). */
  def topK(df: DataFrame, idCol: String, embCol: String, queryPred: Column,
           k: Int, m: Model, nprobe: Int): DataFrame = {
    val corpus = assign(df, idCol, embCol, m)
      .select(col(idCol).as("neighbor_id"),
        Similarity.toDouble(col(embCol)).as("__e"), col("cluster_id"))
      .withColumn("__n", Similarity.norm(col("__e")))
    val centDists = graft.functions.NativeExprs.centroidSqDists(
      col(embCol).cast("array<double>"), m.centroids)
    val probes = df.filter(queryPred)
      .select(col(idCol).as("query_id"),
        Similarity.toDouble(col(embCol)).as("__qe"),
        posexplode(centDists))
      .withColumnRenamed("pos", "cluster_id").withColumnRenamed("col", "__d")
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("__d"))
    val probed = probes
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("__qe"), col("cluster_id"))
      .withColumn("__qn", Similarity.norm(col("__qe")))
    val scored = corpus.join(broadcast(probed), Seq("cluster_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__sim",
        when(col("__qn") > 0 && col("__n") > 0,
          Similarity.dot(col("__qe"), col("__e")) /
            (col("__qn") * col("__n")))
          .otherwise(lit(Double.NegativeInfinity)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }
}
