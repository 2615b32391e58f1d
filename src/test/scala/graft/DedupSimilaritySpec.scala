package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
    "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
  private val nearDup = base.replace("omega", "OMEGA") // tiny perturbation
  private val other = "one two three four five six seven eight nine ten " +
    "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen"

  private def docs = Seq(
    (0L, base), (1L, nearDup), (2L, other), (3L, base)
  ).toDF("doc_id", "text")

  test("exact dedup finds identical docs") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((0L, 0L, 0), (1L, 1L, 0), (2L, 2L, 0), (3L, 0L, 1)))
  }

  test("ngram jaccard finds planted near-dup with correct similarity") {
    val out = Dedup.ngramJaccard(docs.filter($"doc_id" < 3), "doc_id", "text",
      Seq.empty, n = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(out.map(p => (p._1, p._2)).toSet == Set((0L, 1L)))
    // reference implementation: exact trigram-set Jaccard in plain Scala
    def tri(s: String): Set[String] =
      s.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val (sa, sb) = (tri(base), tri(nearDup))
    val j = (sa & sb).size.toDouble / (sa | sb).size
    assert(math.abs(out.head._3 - j) < 1e-12)
  }

  test("prefix-filtered ngram jaccard equals the all-pairs formulation") {
    // varied-length docs incl. exact dups, overlaps, tiny docs, and a
    // blocked column so the length + prefix filters all get exercised
    val corpus = (0 until 40).map { i =>
      val words = (0 to (i % 7) + 3).map(k => s"w${(i + k) % 11}")
      (i.toLong, words.mkString(" "), s"b${i % 3}")
    }.toDF("doc_id", "text", "lang")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val fast = Dedup.ngramJaccard(corpus, "doc_id", "text",
        Seq("lang"), n = 3, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      val slow = Dedup.ngramJaccardAllPairs(corpus, "doc_id", "text",
        Seq("lang"), n = 3, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      assert(fast == slow, s"threshold $t")
    }
  }

  test("minhash LSH recovers the near-dup pair, skips unrelated") {
    val out = Dedup.minhashLsh(docs.filter($"doc_id" < 3), "doc_id", "text",
      numHashes = 128, bands = 32, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((0L, 1L)))
    assert(!out.contains((0L, 2L)) && !out.contains((1L, 2L)))
  }

  test("simhash near-dup pairs by hamming distance") {
    val out = Dedup.simhashPairs(docs.filter($"doc_id" < 3), "doc_id", "text",
      maxHamming = 12)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((0L, 1L)))
    assert(!out.contains((0L, 2L)))
  }

  private def vecs = {
    // two tight clusters around e1 and e2 + one orthogonal-ish point
    Seq(
      (0L, Array(1.0f, 0.01f, 0f, 0f), 0),
      (1L, Array(0.99f, 0.02f, 0f, 0f), 0),
      (2L, Array(0f, 0f, 1.0f, 0.01f), 1),
      (3L, Array(0f, 0.01f, 0.99f, 0f), 1),
      (4L, Array(0.5f, 0.5f, 0.5f, 0.5f), 2)
    ).toDF("vec_id", "embedding", "label")
  }

  test("exact topK ranks by cosine") {
    val out = Similarity.topK(vecs, "vec_id", "embedding",
      col("vec_id") === 0, k = 2)
      .orderBy("rank").as[(Long, Int, Long)].collect().toSeq
    assert(out == Seq((0L, 1, 1L), (0L, 2, 4L)))
  }

  test("embedding near-dup pairs within blocks") {
    val out = Similarity.nearDupPairs(vecs, "vec_id", "embedding", "label", 0.9)
      .as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 1L), (2L, 3L)))
  }

  test("IVF topK achieves good recall on clustered vectors") {
    val rnd = new scala.util.Random(5)
    val clustered = (0 until 200).map { i =>
      val c = i % 4
      val center = Array.tabulate(16)(j => if (j % 4 == c) 1.0f else 0.0f)
      (i.toLong, center.map(x => x + rnd.nextGaussian().toFloat * 0.05f), c)
    }.toDF("vec_id", "embedding", "label")
    val model = graft.operators.Ivf.train(clustered, "vec_id", "embedding",
      k = 8, iters = 2)
    val exact = Similarity.topK(clustered, "vec_id", "embedding",
      col("vec_id") < 8, k = 5).as[(Long, Int, Long)].collect()
      .map(r => (r._1, r._3)).toSet
    val approx = graft.operators.Ivf.topK(clustered, "vec_id", "embedding",
      col("vec_id") < 8, k = 5, model, nprobe = 3)
      .as[(Long, Int, Long)].collect().map(r => (r._1, r._3)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall was $recall")
  }

  test("near-dup clusters: multi-hop chains collapse to the minimum id") {
    // chain 1-2-3-4 (diameter 3, needs >1 propagation round), pair 9-7,
    // and a self-contained pair 5-6
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (9L, 7L), (5L, 6L))
      .toDF("id_a", "id_b")
    val got = graft.operators.Dedup.nearDupClusters(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 9L -> 7L, 5L -> 5L, 6L -> 5L))
  }

  test("LSH topK achieves good recall on clustered vectors") {
    val rnd = new scala.util.Random(3)
    val clustered = (0 until 200).map { i =>
      val c = i % 4
      val center = Array.tabulate(16)(j => if (j % 4 == c) 1.0f else 0.0f)
      (i.toLong, center.map(x => x + rnd.nextGaussian().toFloat * 0.05f), c)
    }.toDF("vec_id", "embedding", "label")
    val exact = Similarity.topK(clustered, "vec_id", "embedding",
      col("vec_id") < 8, k = 5).as[(Long, Int, Long)].collect()
      .map(r => (r._1, r._3)).toSet
    val approx = Similarity.lshTopK(clustered, "vec_id", "embedding",
      col("vec_id") < 8, k = 5, dim = 16, bands = 8, rowsPerBand = 2)
      .as[(Long, Int, Long)].collect().map(r => (r._1, r._3)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall was $recall")
  }
}
