package graft

import org.apache.spark.sql.functions._

import graft.operators.{Fusion, Similarity, TextIndex}

class FusionSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse matches a sequential reference exactly (integer fp)") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2)).toDF("q", "d", "r")
    val b = Seq((1L, 11L, 1), (1L, 13L, 2), (2L, 21L, 1),
      (2L, 20L, 2)).toDF("q", "d", "r")
    val got = Fusion.rrfFuse(Seq(a, b), "q", "d", "r", topK = 3,
        kRrf = 60)
      .as[(Long, Int, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap

    def c(r: Int): Long = Fusion.Scale / (60L + r)
    // query 1: d11 in both lists (r2 + r1) beats d10 (r1 only)
    assert(got((1L, 1)) == ((11L, c(2) + c(1), 2L)))
    assert(got((1L, 2)) == ((10L, c(1), 1L)))
    assert(got((1L, 3)) == ((13L, c(2), 1L))) // b's r2 beats a's r3
    // query 2: d20 (r1+r2) vs d21 (r2+r1) tie on score → doc id asc
    assert(got((2L, 1)) == ((20L, c(1) + c(2), 2L)))
    assert(got((2L, 2)) == ((21L, c(2) + c(1), 2L)))
  }

  test("hybridTopK fuses its own sub-rankings (driver-recomputed)") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val queries = docs.filter(col("doc_id") <= 2)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val pred = col("vec_id") <= 2
    val topK = 5
    val got = Fusion.hybridTopK(docs, "doc_id", "text",
        emb, "vec_id", "embedding", queries, pred, topK)
      .as[(Long, Int, Long, Long, Long)].collect()

    // recompute the fusion on the driver from the two sub-rankings
    val lex = TextIndex.bm25TopK(docs, "doc_id", "text", queries, topK * 4)
      .select("query_id", "doc_id", "rank")
      .as[(Long, Long, Int)].collect()
    val den = Similarity.topK(emb, "vec_id", "embedding", pred, topK * 4)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
    val want = (lex ++ den).groupBy(t => (t._1, t._2)).view
      .mapValues(v => (v.map(x => Fusion.Scale / (60L + x._3)).sum,
        v.size.toLong))
      .toSeq.map { case ((q, d), (s, n)) => (q, d, s, n) }
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(topK).zipWithIndex
          .map { case ((q, d, s, n), i) => (q, i + 1, d, s, n) }
      }.toSet
    assert(got.toSet == want)
    // structural: ranks contiguous from 1, scores non-increasing
    got.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2).toSeq
      assert(sorted.map(_._2) == (1 to sorted.length))
      assert(sorted.sliding(2).forall {
        case Seq(x, y) => x._4 >= y._4
        case _ => true
      })
    }
  }

  test("hybridTopKExactFp fuses its exact sub-rankings " +
    "(driver-recomputed); all columns integer") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val queries = docs.filter(col("doc_id") <= 2)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val pred = col("vec_id") <= 2
    val topK = 5
    val got = Fusion.hybridTopKExactFp(docs, "doc_id", "text",
        emb, "vec_id", "embedding", queries, pred, topK)
      .as[(Long, Int, Long, Long, Long)].collect()
    val lex = TextIndex.bm25TopKExactFp(docs, "doc_id", "text",
        queries, topK * 4)
      .select("query_id", "doc_id", "rank")
      .as[(Long, Long, Int)].collect()
    val den = graft.operators.Quantize.topKQuantized(emb, "vec_id",
        "embedding", pred, topK * 4,
        graft.operators.Quantize.scaleOf(emb, "embedding"))
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
    val want = (lex ++ den).groupBy(t => (t._1, t._2)).view
      .mapValues(v => (v.map(x => Fusion.Scale / (60L + x._3)).sum,
        v.size.toLong))
      .toSeq.map { case ((q, d), (s, n)) => (q, d, s, n) }
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(topK).zipWithIndex
          .map { case ((q, d, s, n), i) => (q, i + 1, d, s, n) }
      }.toSet
    assert(got.toSet == want)
  }

  test("retrievalMetrics: exact recall/RR, attainable denominator, edge cases") {
    // q1: truth {a,b,c}; results rank a@2, x@1, b@5 (k=4 cuts b) ->
    //     hits=1 (a), first=2, recall = 1*10000 div min(3,4)=3 -> 3333
    // q2: truth {z}; results never hit -> hits=0, rr=0, recall=0
    // q3: truth {m,n,m dup}; results m@1 -> hits=1, first=1,
    //     recall = 10000 div min(2,4)=2 -> 5000, rr = 1000000
    // q4: results only, no truth -> omitted
    val results = Seq(
      (1L, "x", 1), (1L, "a", 2), (1L, "y", 3), (1L, "b", 5),
      (2L, "p", 1), (2L, "q", 2),
      (3L, "m", 1), (3L, "o", 2),
      (4L, "w", 1)
    ).toDF("query_id", "doc_id", "rank")
    val truth = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "z"),
      (3L, "m"), (3L, "n"), (3L, "m")
    ).toDF("query_id", "doc_id")
    val out = graft.operators.Fusion.retrievalMetrics(results, truth,
        "query_id", "doc_id", "rank", k = 4)
      .select("query_id", "n_truth", "hits", "first_rank",
        "recall_bp", "rr_fp")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap
    assert(out == Map(
      1L -> ((3L, 1L, 2L, 3333L, 500000L)),
      2L -> ((1L, 0L, 0L, 0L, 0L)),
      3L -> ((2L, 1L, 1L, 5000L, 1000000L))))
  }

  test("averagePrecisionAtK: hand-computed AP, no-hit and missing queries") {
    // q1 truth {10,20,30}; results ranks: 10@1 (hit), 99@2, 20@3 (hit)
    // terms: 1e6·1/1 + 1e6·2/3 = 1000000 + 666666; / min(3,5) = 555555
    val results = Seq((1L, 10L, 1), (1L, 99L, 2), (1L, 20L, 3),
        (2L, 7L, 1), (3L, 8L, 1))
      .toDF("q", "d", "rank")
    val truth = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 50L))
      .toDF("q", "d")
    val out = graft.operators.Fusion.averagePrecisionAtK(
        results, truth, "q", "d", "rank", k = 5)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((3L, 2L, (1000000L + 666666L) / 3)))
    assert(out(2L) === ((1L, 0L, 0L)))     // truth but no hits
    assert(!out.contains(3L))              // no truth -> dropped
    // perfect ranking of all truths = scale
    val perfect = Seq((9L, 1L, 1), (9L, 2L, 2)).toDF("q", "d", "rank")
    val pt = Seq((9L, 1L), (9L, 2L)).toDF("q", "d")
    assert(graft.operators.Fusion.averagePrecisionAtK(
        perfect, pt, "q", "d", "rank", k = 5)
      .select("ap_fp").as[Long].head() === 1000000L)
    // a doc listed twice counts ONCE at its best rank — n_hits and
    // the per-hit terms must not inflate
    val dup = Seq((1L, 10L, 1), (1L, 10L, 2), (1L, 99L, 3),
        (1L, 20L, 4), (1L, 20L, 4))
      .toDF("q", "d", "rank")
    val dout = graft.operators.Fusion.averagePrecisionAtK(
        dup, truth, "q", "d", "rank", k = 5)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // hits: 10@1, 20@4 -> terms 1e6·1/1 + 1e6·2/4; / min(3,5)
    assert(dout(1L) === ((3L, 2L, (1000000L + 500000L) / 3)))
    // same guard on the NDCG side: discount earned once per doc
    val nout = graft.operators.Fusion.ndcgAtK(
        dup, truth, "q", "d", "rank", k = 5)
      .filter(col("q") === 1L).select("dcg_fp").as[Long].head()
    val disc = graft.operators.Fusion.ndcgDiscFp(5)
    assert(nout === disc(0) + disc(3)) // ranks 1 and 4
  }

  test("rm3TopK bridges vocabulary mismatch via feedback expansion") {
    val docs = Seq(
      (1L, "car auto motor"),   // matches 'car', carries the bridge
      (2L, "auto vehicle motor"), // no 'car' at all
      (3L, "banana fruit salad"),
      (4L, "car wheel"),
      (5L, "fruit market stand")).toDF("doc_id", "text")
    val queries = Seq((100L, "car"))
    val base = graft.operators.TextIndex.bm25TopK(
        docs, "doc_id", "text", queries, k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(base === Set(1L, 4L)) // lexical only: docs containing 'car'
    val exp = graft.operators.TextIndex.rm3TopK(
        docs, "doc_id", "text", queries, k = 5, fbDocs = 2,
        fbTerms = 4, lambdaOrig = 0.5)
      .orderBy("rank")
      .as[(Long, Int, Long, Double)].collect()
    val expIds = exp.map(_._3).toSet
    assert(expIds.contains(2L), s"expansion must recover doc 2: $exp")
    assert(Set(1L, 4L).subsetOf(expIds)) // originals still retrieved
    // an original-term doc outranks the bridge-only doc at lambda 0.5
    assert(Set(1L, 4L).contains(exp.head._3))

    // the engine-exact twin retrieves the same ranking on this corpus
    // (well-separated scores — no float/int rank flips) and bridges
    // the same vocabulary mismatch
    val fp = graft.operators.TextIndex.rm3TopKExactFp(
        docs, "doc_id", "text", queries, k = 5, fbDocs = 2,
        fbTerms = 4, lamNum = 1, lamDen = 2)
      .orderBy("rank")
      .as[(Long, Int, Long, Long)].collect()
    assert(fp.map(_._3).toSeq == exp.map(_._3).toSeq,
      s"exact ${fp.toSeq} vs float ${exp.toSeq}")
    assert(fp.forall(_._4 > 0))
  }

  test("rm3TopKExactFp: R = 0 relevance-model fallback is plain BM25 " +
    "ranking; no-match query returns nothing") {
    val docs = Seq(
      (1L, "car auto motor"), (2L, "auto vehicle motor"),
      (3L, "banana fruit salad"), (4L, "car wheel")).toDF("doc_id", "text")
    // a query matching NO document: empty feedback set, empty result
    val none = graft.operators.TextIndex.rm3TopKExactFp(
      docs, "doc_id", "text", Seq((1L, "zzz qqq")), k = 3)
    assert(none.count() == 0L)
    // mixed panel: the matching query is unaffected by the dead one
    val mixed = graft.operators.TextIndex.rm3TopKExactFp(
        docs, "doc_id", "text", Seq((1L, "zzz qqq"), (2L, "banana")),
        k = 3, fbDocs = 2, fbTerms = 4)
      .select("query_id", "doc_id").as[(Long, Long)].collect()
    assert(mixed.forall(_._1 == 2L))
    assert(mixed.map(_._2).contains(3L))
  }
}
