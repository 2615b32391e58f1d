package graft

import org.apache.spark.sql.functions._

import graft.operators.{Hnsw, Ivf, Similarity}

/** Per-shard HNSW over the IVF router: recall against the exact cosine
  * ranking, deterministic rebuilds, and the in-core graph's own
  * guarantees on a planted-geometry corpus. */
class HnswSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("in-core Index: exact on a tiny corpus, deterministic, " +
    "self-excluding") {
    val rnd = new scala.util.Random(11)
    val vecs = (1L to 200L).map(i =>
      i -> Array.fill(16)(rnd.nextGaussian()))
    def build() = {
      val idx = new Hnsw.Index(m = 8, efConstruction = 64)
      vecs.foreach { case (id, v) => idx.insert(id, v) }
      idx
    }
    val idx = build()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      a.zip(b).map { case (x, y) => x * y }.sum / (na * nb)
    }
    // high-ef search ~ exact brute force on 200 points
    var hits = 0; var total = 0
    vecs.take(20).foreach { case (qid, q) =>
      val got = idx.search(q, 10, efSearch = 200, exclude = qid)
        .map(_._2).toSet
      val want = vecs.filter(_._1 != qid)
        .sortBy { case (_, v) => -cos(q, v) }.take(10).map(_._1).toSet
      hits += got.intersect(want).size; total += want.size
      assert(!got.contains(qid))
    }
    assert(hits.toDouble / total >= 0.95, s"in-core recall $hits/$total")
    // deterministic rebuild: identical results
    val idx2 = build()
    vecs.take(5).foreach { case (qid, q) =>
      assert(idx.search(q, 10, 64, qid).map(_._2) ==
        idx2.search(q, 10, 64, qid).map(_._2))
    }
  }

  test("distributed topK: recall >= 0.9 of IVF-exact at full probe, " +
    ">= 0.8 of global exact at nprobe; deterministic re-run") {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
      .localCheckpoint(true)
    val pred = pmod(col("vec_id"), lit(25)) === 0
    val model = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val got = Hnsw.topK(emb, "vec_id", "embedding", pred, k = 10,
        model, nprobe = 8, m = 8, efConstruction = 64, efSearch = 96)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect()
    val exact = Similarity.topK(emb, "vec_id", "embedding", pred, 10)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == exact.keySet, "every query answered")
    // at nprobe = k (all clusters probed) the only recall loss is the
    // graph's own approximation — demand >= 0.8 vs the global exact
    // top-10 and >= 0.9 on average
    val recalls = exact.map { case (q, want) =>
      val g = byQ(q).map(_._3).toSet
      g.intersect(want).size.toDouble / want.size
    }
    assert(recalls.sum / recalls.size >= 0.9,
      s"mean recall ${recalls.sum / recalls.size}")
    assert(recalls.forall(_ >= 0.6), s"worst recall ${recalls.min}")
    // ranks contiguous from 1 per query
    byQ.values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.size))
    }
    // deterministic: identical output on a re-run
    val again = Hnsw.topK(emb, "vec_id", "embedding", pred, k = 10,
        model, nprobe = 8, m = 8, efConstruction = 64, efSearch = 96)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect()
    assert(again.toSet == got.toSet)
  }

  test("persistence: loadTopK over a saved index == fresh-build topK; " +
    "append-then-reload is bit-identical to a fresh build of the union") {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
      .localCheckpoint(true)
    val pred = pmod(col("vec_id"), lit(25)) === 0
    val model = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val root = java.nio.file.Files
      .createTempDirectory("graft-hnsw").toString
    val idxPath = s"$root/idx"
    Hnsw.saveIndex(emb, "vec_id", "embedding", model, idxPath)
    // parity: the loaded-index search returns exactly the fresh build's
    // answer (same graphs — ascending-id insertion is deterministic)
    val fresh = Hnsw.topK(emb, "vec_id", "embedding", pred, k = 10,
        model, nprobe = 4, efSearch = 96)
      .as[(Long, Int, Long)].collect().toSet
    val loaded = Hnsw.loadTopK(emb, "vec_id", "embedding", pred, k = 10,
        model, nprobe = 4, indexPath = idxPath, efSearch = 96)
      .as[(Long, Int, Long)].collect().toSet
    assert(loaded == fresh, "loaded-index search != fresh-build search")
    // append determinism: ids above the split sort after every existing
    // id, so append(build(A), B) must dump BIT-IDENTICAL rows to
    // build(A ∪ B) — same insertion order, same graphs
    val maxId = emb.agg(max(col("vec_id"))).head.getLong(0)
    val split = maxId / 2
    val a = emb.filter(col("vec_id") <= split)
    val b = emb.filter(col("vec_id") > split)
    val aPath = s"$root/idx_a"
    Hnsw.saveIndex(a, "vec_id", "embedding", model, aPath)
    Hnsw.appendIndex(b, "vec_id", "embedding", model, aPath)
    def dump(p: String) = spark.read.parquet(p)
      .select(col("cluster_id"), col("ord"), col("doc_id"), col("level"),
        col("vec"), col("nbrs"), col("entry"), col("max_level"))
      .as[(Int, Int, Long, Int, Seq[Double], Seq[Seq[Int]], Int, Int)]
      .collect().sortBy(r => (r._1, r._2))
    assert(dump(aPath).toSeq == dump(idxPath).toSeq,
      "append-then-reload diverged from the fresh union build")
    // and the appended index answers queries identically to the full one
    val viaAppend = Hnsw.loadTopK(emb, "vec_id", "embedding", pred,
        k = 10, model, nprobe = 4, indexPath = aPath, efSearch = 96)
      .as[(Long, Int, Long)].collect().toSet
    assert(viaAppend == fresh)
  }

  test("appendIndex rewrites ONLY touched cluster dirs; a retry is " +
    "idempotent; a parked dir (crash simulation) recovers on entry") {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
      .localCheckpoint(true)
    val model = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    // batch = the upper-id half of ONE cluster, so exactly one cluster
    // is touched and fresh-union bit-parity still holds (ascending-id
    // insertion order matches a fresh build)
    val assigned = Ivf.assign(emb, "vec_id", "embedding", model)
      .select(col("vec_id"), col("cluster_id")).localCheckpoint(true)
    val target = assigned.groupBy("cluster_id").count()
      .orderBy(desc("count"), asc("cluster_id"))
      .select("cluster_id").as[Int].head()
    val tIds = assigned.filter(col("cluster_id") === target)
      .select("vec_id").as[Long].collect().sorted
    val batchIds = tIds.drop(tIds.length / 2).toSet
    val a = emb.filter(!col("vec_id").isin(batchIds.toSeq: _*))
    val b = emb.filter(col("vec_id").isin(batchIds.toSeq: _*))
    val root = java.nio.file.Files
      .createTempDirectory("graft-hnsw-app").toString
    val path = s"$root/idx"
    Hnsw.saveIndex(a, "vec_id", "embedding", model, path)
    def clusterFiles(): Map[String, Set[(String, Long)]] =
      new java.io.File(path).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cluster_id="))
        .map(d => d.getName -> d.listFiles()
          .map(f => (f.getName, f.lastModified())).toSet).toMap
    val before = clusterFiles()
    Hnsw.appendIndex(b, "vec_id", "embedding", model, path)
    val after = clusterFiles()
    val touchedDir = s"cluster_id=$target"
    assert(after(touchedDir) != before(touchedDir),
      "touched cluster dir was not rewritten")
    (before.keySet - touchedDir).foreach { d =>
      assert(after(d) == before(d),
        s"untouched cluster dir $d was rewritten")
    }
    // a retried append (same batch) is a no-op on content: every id is
    // already in the graph, so the dumped rows are identical
    def dump() = spark.read.parquet(path)
      .select(col("cluster_id"), col("ord"), col("doc_id"), col("level"),
        col("vec"), col("nbrs"), col("entry"), col("max_level"))
      .as[(Int, Int, Long, Int, Seq[Double], Seq[Seq[Int]], Int, Int)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val once = dump()
    Hnsw.appendIndex(b, "vec_id", "embedding", model, path)
    assert(dump() == once, "retried append changed the index")
    // crash simulation: a predecessor died between parking the old
    // cluster dir and renaming the new one in — live dir missing,
    // parked dir present. loadTopK must restore it before reading.
    val fsRoot = new java.io.File(path)
    val park = new java.io.File(path + "__park")
    assert(park.mkdirs())
    val live = new java.io.File(fsRoot, touchedDir)
    val parked = new java.io.File(park, touchedDir)
    assert(live.renameTo(parked), "test setup: park rename failed")
    val pred = pmod(col("vec_id"), lit(25)) === 0
    val got = Hnsw.loadTopK(emb, "vec_id", "embedding", pred, k = 10,
        model, nprobe = 8, indexPath = path, efSearch = 96)
      .as[(Long, Int, Long)].collect().toSet
    assert(new java.io.File(fsRoot, touchedDir).isDirectory,
      "parked cluster dir was not restored")
    assert(dump() == once, "recovery changed the index contents")
    val expected = Hnsw.loadTopK(emb, "vec_id", "embedding", pred,
        k = 10, model, nprobe = 8, indexPath = path, efSearch = 96)
      .as[(Long, Int, Long)].collect().toSet
    assert(got == expected)
    // read-path recovery is RESTORE-ONLY (r14 advice): a parked dir
    // alongside a live dir could be an in-flight writer's park, not a
    // superseded leftover — a reader must never delete it (or the park
    // root), else a writer crash in that window loses the cluster.
    assert(park.mkdirs() || park.isDirectory)
    val inFlight = new java.io.File(park, touchedDir)
    assert(inFlight.mkdirs(), "test setup: fake in-flight park")
    Hnsw.loadTopK(emb, "vec_id", "embedding", pred, k = 10,
      model, nprobe = 8, indexPath = path, efSearch = 96).count()
    assert(inFlight.isDirectory,
      "read path deleted a parked dir alongside a live one")
    assert(park.isDirectory, "read path deleted the park root")
    // the writer path (single-writer contract) does clean it up
    Hnsw.appendIndex(b, "vec_id", "embedding", model, path)
    assert(!park.exists, "writer-entry recovery left the park root")
    assert(dump() == once, "writer-entry recovery changed the index")
  }

  test("routing bound: a query only receives candidates from its " +
    "nprobe clusters; oversized panels are refused") {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
      .localCheckpoint(true)
    val model = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val one = Hnsw.topK(emb, "vec_id", "embedding",
        col("vec_id") === 0, k = 5, model, nprobe = 2,
        m = 4, efConstruction = 16, efSearch = 16)
      .select("neighbor_id").as[Long].collect().toSet
    // the candidates must lie inside the query's 2 probed clusters
    val assignedAll = Ivf.assign(emb, "vec_id", "embedding", model)
      .select(col("vec_id"), col("cluster_id"))
      .as[(Long, Int)].collect().toMap
    val qCluster = assignedAll(0L)
    // every returned neighbor maps to one of the <= 2 probed clusters,
    // and the query's own cluster is among them
    val used = one.map(assignedAll)
    assert(used.size <= 2, s"candidates from ${used.size} clusters")
    assert(one.isEmpty || used.contains(qCluster))
    val e = intercept[IllegalArgumentException] {
      Hnsw.topK(emb, "vec_id", "embedding", lit(true), k = 2, model,
        nprobe = 1, maxQueries = 3)
    }
    assert(e.getMessage.contains("broadcast budget"))
  }
}
