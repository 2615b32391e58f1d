package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ivf, Pq}

/** Product quantization: code validity, ADC score = exact dot against
  * the reconstruction, and recall on clustered vectors. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated clusters of 50 vectors; a query's true neighbors
  // (by inner product) are its cluster mates, so coarse-geometry
  // preservation is what recall measures — not the ordering of
  // noise-level ties.
  private val clustered = {
    val rnd = new scala.util.Random(5)
    (0 until 200).map { i =>
      val c = i % 4
      val center = Array.tabulate(16)(j => if (j % 4 == c) 1.0f else 0.0f)
      (i.toLong, center.map(x => x + rnd.nextGaussian().toFloat * 0.05f), c)
    }
  }
  private lazy val vecs = clustered.toDF("vec_id", "embedding", "label")
  private lazy val model = Pq.train(vecs, "vec_id", "embedding",
    m = 4, ksub = 8, iters = 2)

  test("encode emits m codes per vector, each within its codebook") {
    assert(model.m == 4 && model.subDim == 4)
    val codes = Pq.encode(vecs, "vec_id", "embedding", model)
      .select("pq_codes").as[Seq[Int]].collect()
    assert(codes.length == 200)
    codes.foreach { cs =>
      assert(cs.length == 4)
      cs.zipWithIndex.foreach { case (c, mi) =>
        assert(c >= 0 && c < model.codebooks(mi).length)
      }
    }
  }

  test("ADC score equals the dot product against the PQ reconstruction") {
    val got = Pq.topKAdc(vecs, "vec_id", "embedding",
        col("vec_id") === 0, k = 199, model)
      .select("neighbor_id", "score").as[(Long, Double)].collect().toMap
    val codes = Pq.encode(vecs, "vec_id", "embedding", model)
      .select("vec_id", "pq_codes").as[(Long, Seq[Int])].collect().toMap
    val q = clustered.find(_._1 == 0L).get._2.map(_.toDouble)
    got.foreach { case (nid, score) =>
      val dec = model.decode(codes(nid))
      val exact = q.zip(dec).map { case (a, b) => a * b }.sum
      assert(math.abs(score - exact) < 1e-9,
        s"neighbor $nid: ADC $score vs reconstruction dot $exact")
    }
    assert(got.size == 199) // every non-query candidate was scored
  }

  test("PQ top-k keeps cluster-mate recall on separable data") {
    def recallOf(approx: Set[(Long, Long)], k: Int): Double = {
      // exact inner-product top-k per query, brute-forced locally
      val all = clustered.map { case (id, e, _) => id -> e.map(_.toDouble) }
      val exact = (for {
        (qid, qe) <- all if qid < 8
        top = all.filter(_._1 != qid)
          .map { case (cid, ce) =>
            (cid, qe.zip(ce).map { case (a, b) => a * b }.sum) }
          .sortBy { case (cid, s) => (-s, cid) }.take(k).map(_._1)
        cid <- top
      } yield (qid, cid)).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val k = 40
    val flat = Pq.topKAdc(vecs, "vec_id", "embedding",
        col("vec_id") < 8, k, model)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(recallOf(flat, k) >= 0.8, s"flat ADC recall ${recallOf(flat, k)}")

    val coarse = Ivf.train(vecs, "vec_id", "embedding", k = 8, iters = 2)
    val ivf = Pq.ivfTopKAdc(vecs, "vec_id", "embedding",
        col("vec_id") < 8, k, coarse, model, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(recallOf(ivf, k) >= 0.8, s"IVF-PQ recall ${recallOf(ivf, k)}")
  }

  test("OPQ: orthonormal rotation, recall >= plain PQ at same budget") {
    // Hadamard-smear the clustered vectors: every informative direction
    // then straddles all four contiguous subspaces, the shape plain PQ
    // cannot re-align and OPQ exists to fix (Ge et al. CVPR'13).
    val h: Array[Array[Double]] = {
      var m = Array(Array(1.0))
      while (m.length < 16) {
        val n = m.length
        m = Array.tabulate(2 * n, 2 * n) { (i, j) =>
          val s = if (i >= n && j >= n) -1.0 else 1.0
          s * m(i % n)(j % n)
        }
      }
      m.map(_.map(_ / 4.0)) // orthonormal: H·Hᵀ = I
    }
    val smeared = clustered.map { case (id, e, c) =>
      val x = e.map(_.toDouble)
      (id, h.map(row => row.zip(x).map(p => p._1 * p._2).sum.toFloat), c)
    }
    val sdf = smeared.toDF("vec_id", "embedding", "label")
    val pq = Pq.train(sdf, "vec_id", "embedding", m = 4, ksub = 8,
      iters = 2)
    val opq = Pq.trainOpq(sdf, "vec_id", "embedding", m = 4, ksub = 8,
      iters = 2, opqIters = 3)
    // the learned rotation stays orthonormal through the SVD updates
    val r = opq.rotation
    for (i <- r.indices; j <- r.indices) {
      val dot = r(i).zip(r(j)).map(p => p._1 * p._2).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"RRᵀ[$i][$j] = $dot")
    }
    def recallOf(approx: Set[(Long, Long)], k: Int): Double = {
      val all = smeared.map { case (id, e, _) => id -> e.map(_.toDouble) }
      val exact = (for {
        (qid, qe) <- all if qid < 8
        top = all.filter(_._1 != qid)
          .map { case (cid, ce) =>
            (cid, qe.zip(ce).map { case (a, b) => a * b }.sum) }
          .sortBy { case (cid, s) => (-s, cid) }.take(k).map(_._1)
        cid <- top
      } yield (qid, cid)).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val k = 40
    val flat = Pq.topKAdc(sdf, "vec_id", "embedding",
        col("vec_id") < 8, k, pq)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rotated = Pq.topKAdcOpq(sdf, "vec_id", "embedding",
        col("vec_id") < 8, k, opq)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val (pqR, opqR) = (recallOf(flat, k), recallOf(rotated, k))
    assert(opqR >= pqR, s"OPQ recall $opqR < plain PQ recall $pqR")
    assert(opqR >= 0.8, s"OPQ recall $opqR below floor")
  }

  test("train rejects a dimension not divisible by m") {
    intercept[IllegalArgumentException] {
      Pq.train(vecs, "vec_id", "embedding", m = 5, ksub = 4)
    }
  }

  test("Ivf and Pq models round-trip through parquet exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-models")
    Pq.save(spark, model, s"$dir/pq")
    val m2 = Pq.load(spark, s"$dir/pq")
    assert(m2.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val coarse = Ivf.train(vecs, "vec_id", "embedding", k = 4, iters = 2)
    Ivf.save(spark, coarse, s"$dir/ivf")
    val c2 = Ivf.load(spark, s"$dir/ivf")
    assert(c2.centroids.map(_.toSeq).toSeq ==
      coarse.centroids.map(_.toSeq).toSeq)
    // a loaded model drives identical assignments
    val a1 = Ivf.assign(vecs, "vec_id", "embedding", coarse)
      .select("vec_id", "cluster_id").as[(Long, Int)].collect().toMap
    val a2 = Ivf.assign(vecs, "vec_id", "embedding", c2)
      .select("vec_id", "cluster_id").as[(Long, Int)].collect().toMap
    assert(a1 == a2)
  }

  test("residual IVF-PQ: score decomposes exactly, recall not worse") {
    val coarse = Ivf.train(vecs, "vec_id", "embedding", k = 8, iters = 2)
    val rmodel = Pq.trainResidual(vecs, "vec_id", "embedding", coarse,
      m = 4, ksub = 8, iters = 2)
    val k = 40
    val out = Pq.ivfTopKAdcResidual(vecs, "vec_id", "embedding",
        col("vec_id") < 8, k, coarse, rmodel, nprobe = 8)
      .select("query_id", "neighbor_id", "score")
      .as[(Long, Long, Double)].collect()
    // exact decomposition: score == <q, centroid_c> + <q, decode(codes)>
    val assigned = Ivf.assign(vecs, "vec_id", "embedding", coarse)
      .select("vec_id", "cluster_id").as[(Long, Int)].collect().toMap
    val all = clustered.map { case (id, e, _) =>
      id -> e.map(_.toDouble) }.toMap
    val resDf = Ivf.assign(vecs, "vec_id", "embedding", coarse)
      .withColumn("__res", zip_with(
        graft.operators.Similarity.toDouble(col("embedding")),
        element_at(array(coarse.centroids.map(c =>
          array(c.map(lit): _*)): _*), col("cluster_id") + 1),
        (x, c) => x - c))
    val codes = Pq.encode(resDf, "vec_id", "__res", rmodel)
      .select("vec_id", "pq_codes").as[(Long, Seq[Int])].collect().toMap
    out.foreach { case (qid, nid, score) =>
      val q = all(qid)
      val cent = coarse.centroids(assigned(nid))
      val rec = rmodel.decode(codes(nid))
      val exact = q.zip(cent).map(p => p._1 * p._2).sum +
        q.zip(rec).map(p => p._1 * p._2).sum
      assert(math.abs(score - exact) < 1e-9,
        s"($qid,$nid): $score vs $exact")
    }
    // with full probing, residual recall is at least the raw variant's
    def recallOf(approx: Set[(Long, Long)]): Double = {
      val exact = (for {
        (qid, qe) <- all.toSeq if qid < 8
        top = all.toSeq.filter(_._1 != qid)
          .map { case (cid, ce) =>
            (cid, qe.zip(ce).map(p => p._1 * p._2).sum) }
          .sortBy { case (cid, s) => (-s, cid) }.take(k).map(_._1)
        cid <- top
      } yield (qid, cid)).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val rawModel = Pq.train(vecs, "vec_id", "embedding", m = 4,
      ksub = 8, iters = 2)
    val raw = Pq.ivfTopKAdc(vecs, "vec_id", "embedding",
        col("vec_id") < 8, k, coarse, rawModel, nprobe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val res = out.map(t => (t._1, t._2)).toSet
    assert(recallOf(res) >= recallOf(raw) - 0.02,
      s"residual ${recallOf(res)} vs raw ${recallOf(raw)}")
    assert(recallOf(res) >= 0.8)
  }
}
