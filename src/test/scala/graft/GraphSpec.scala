package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def randomEdges(n: Int, m: Int, seed: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (1 to m).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
  }

  private def undirect(edges: Seq[(Long, Long)]): Set[(Long, Long)] =
    edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(t => t._1 != t._2).toSet

  test("triangleStats matches brute-force enumeration") {
    val edges = randomEdges(30, 150, 7)
    val und = undirect(edges)
    val nodes = und.flatMap(t => Seq(t._1, t._2))
    val adj = nodes.map(v => v ->
      und.collect { case (a, b) if a == v => b
                    case (a, b) if b == v => a }).toMap
    val expect = nodes.map { v =>
      val nb = adj(v).toSeq.sorted
      val t = (for {
        i <- nb.indices; j <- (i + 1) until nb.size
        if und.contains((math.min(nb(i), nb(j)), math.max(nb(i), nb(j))))
      } yield 1).size.toLong
      val d = nb.size.toLong
      val cc = if (d >= 2) 20000L * t / (d * (d - 1)) else 0L
      v -> ((d, t, cc))
    }.toMap

    val out = Graph.triangleStats(edges.toDF("src", "dst"), "src", "dst")
      .select("node", "degree", "triangles", "cc_bp")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == nodes.size)
    out.foreach { case (v, d, t, cc) =>
      assert(expect(v) == ((d, t, cc)),
        s"node $v: got ($d,$t,$cc), want ${expect(v)}")
    }
    // sanity: the random graph actually has triangles
    assert(out.map(_._3).sum > 0)
  }

  test("triangleStats: a known 5-node graph") {
    // K4 on {1,2,3,4} plus pendant 5-1: node 1..4 in 3 triangles... K4
    // has 4 triangles; each K4 node sits in 3 of them; node 5 in none.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L), (2L, 1L) /* dup */ , (3L, 3L) /* loop */)
    val m = Graph.triangleStats(edges.toDF("src", "dst"), "src", "dst")
      .select("node", "triangles").as[(Long, Long)].collect().toMap
    assert(m == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L))
  }

  test("hits matches the exact integer recurrence; authorities rank by in-links") {
    val scale = 1000000L
    // 3 hubs pointing at 3 pages with in-degrees 3, 2, 1
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L),
      (3L, 10L))
    val iters = 4
    // driver-side exact recurrence, replicating floored normalization
    val nodes = edges.flatMap(t => Seq(t._1, t._2)).distinct
    var hub = nodes.map(_ -> scale).toMap
    var auth = nodes.map(_ -> scale).toMap
    for (_ <- 0 until iters) {
      val rawA = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => hub(e._1)).sum }
      val aT = math.max(rawA.values.sum, 1L)
      val na = rawA.map { case (v, r) => v -> r * scale / aT }
      val rawH = edges.groupBy(_._1).map { case (u, es) =>
        u -> es.map(e => na(e._2)).sum }
      val hT = math.max(rawH.values.sum, 1L)
      val nh = rawH.map { case (u, r) => u -> r * scale / hT }
      auth = nodes.map(v => v -> na.getOrElse(v, 0L)).toMap
      hub = nodes.map(v => v -> nh.getOrElse(v, 0L)).toMap
    }
    val out = Graph.hits(edges.toDF("src", "dst"), "src", "dst", iters)
      .select("node", "hub", "auth").as[(Long, Long, Long)].collect()
    assert(out.length == nodes.size)
    out.foreach { case (v, h, a) =>
      assert(h == hub(v) && a == auth(v),
        s"node $v: got ($h,$a), want (${hub(v)},${auth(v)})")
    }
    val authMap = out.map(t => t._1 -> t._3).toMap
    assert(authMap(10L) > authMap(11L) && authMap(11L) > authMap(12L))
    val hubMap = out.map(t => t._1 -> t._2).toMap
    assert(hubMap(1L) > hubMap(2L) && hubMap(2L) > hubMap(3L))
  }

  test("hitsScale: degrades precision for big hubs instead of refusing") {
    // exact contract: largest s <= scale with s^2 * dmax <= 2^63 - 1
    def ok(s: Long, d: Long) = BigInt(s) * s * math.max(d, 1L) <=
      BigInt(Long.MaxValue)
    for (d <- Seq(1L, 2L, 1000000L, 10000000L, 100000000L, 1L << 40)) {
      val s = Graph.hitsScale(1000000L, d)
      assert(ok(s, d), s"dmax=$d scale=$s overflows")
      assert(s == 1000000L || !ok(s + 1, d),
        s"dmax=$d scale=$s not maximal")
    }
    // small hubs keep the full default scale
    assert(Graph.hitsScale(1000000L, 1000000L) == 1000000L)
    // a 10^8-degree hub shrinks the scale rather than throwing
    val shrunk = Graph.hitsScale(1000000L, 100000000L)
    assert(shrunk < 1000000L && shrunk > 0)
  }

  test("hits runs on a dmax > 1e6 hub graph (auto-derived scale)") {
    // 1.2M pages all pointing at one sink — the shape the old
    // dmax <= 1e6 REQUIRE refused. s^2 * 1.2e6 still fits 2^63, so
    // the scale stays 1e6 and the sole authority takes ALL auth mass.
    val n = 1200000L
    val edges = spark.range(n)
      .select((col("id") + 1L).as("src"), lit(0L).as("dst"))
    val out = Graph.hits(edges, "src", "dst", iters = 1)
      .filter(col("node") === 0L)
      .select("hub", "auth").as[(Long, Long)].collect()
    assert(out.length == 1)
    assert(out(0)._2 == 1000000L) // sole authority holds the auth sum
    assert(out(0)._1 == 0L)       // the sink points at nothing
  }

  test("stronglyConnected: cycles, bridges, and DAG singletons") {
    // SCCs: {1,2,3} (cycle), {4} (bridge), {5,6} (2-cycle)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 5L)).toDF("src", "dst")
    val out = graft.operators.Graph
      .stronglyConnected(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L))
    // pure DAG: trim alone resolves everything to singletons
    val dag = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val dout = graft.operators.Graph
      .stronglyConnected(dag, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(dout === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("stronglyConnected matches brute-force mutual reachability") {
    val rnd = new scala.util.Random(11)
    val n = 14
    val edges = (0 until 40).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2).distinct
    // brute-force closure
    val reach = Array.fill(n, n)(false)
    edges.foreach { case (a, b) => reach(a.toInt)(b.toInt) = true }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val expected = nodes.map { v =>
      val mutual = nodes.filter(u =>
        u == v || (reach(v.toInt)(u.toInt) && reach(u.toInt)(v.toInt)))
      v -> mutual.min
    }.toMap
    val out = graft.operators.Graph
      .stronglyConnected(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(out === expected)
  }

  test("kCore peels to the exact fixpoint and reports in-core degrees") {
    // path 5-4-3 into triangle {1,2,3}: 2-core is exactly the triangle
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    val out = Graph.kCore(edges.toDF("src", "dst"), "src", "dst",
        k = 2, maxRounds = 10)
      .select("node", "core_degree").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k larger than any degree -> empty core
    val empty = Graph.kCore(edges.toDF("src", "dst"), "src", "dst",
        k = 5, maxRounds = 10).count()
    assert(empty == 0)
  }

  test("labelPropagation matches the deterministic recurrence; finds planted communities") {
    // two 4-cliques joined by one bridge edge: LPA should settle each
    // clique on its minimum id
    val clique = (base: Long) => for {
      i <- 0 until 4; j <- (i + 1) until 4
    } yield (base + i, base + j)
    val edges = clique(1L) ++ clique(10L) :+ ((4L, 10L))
    val out = Graph.labelPropagation(edges.toDF("src", "dst"),
        "src", "dst", rounds = 5)
      .select("node", "label").as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).map(out).toSet == Set(1L))
    assert(Seq(10L, 11L, 12L, 13L).map(out).toSet == Set(10L))

    // exact parity with a driver-side recurrence on a random graph
    val rEdges = randomEdges(25, 40, 23)
    val und = undirect(rEdges)
    val nodes = und.flatMap(t => Seq(t._1, t._2)).toSeq.distinct.sorted
    val nb = nodes.map(v => v -> (und.collect {
      case (a, b) if a == v => b
      case (a, b) if b == v => a
    }.toSeq :+ v)).toMap // neighbors + self
    var lab = nodes.map(v => v -> v).toMap
    for (_ <- 0 until 4) {
      lab = nodes.map { v =>
        val counts = nb(v).groupBy(lab).map { case (l, xs) => (l, xs.size) }
        v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val got = Graph.labelPropagation(rEdges.toDF("src", "dst"),
        "src", "dst", rounds = 4)
      .select("node", "label").as[(Long, Long)].collect().toMap
    assert(got == lab)
  }

  test("kCore matches brute-force peeling on a random graph") {
    val edges = randomEdges(40, 100, 11)
    val k = 3
    var live = undirect(edges)
    var changed = true
    while (changed && live.nonEmpty) {
      val deg = live.toSeq.flatMap(t => Seq(t._1, t._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val alive = deg.filter(_._2 >= k).keySet
      val next = live.filter(t => alive(t._1) && alive(t._2))
      changed = next.size != live.size
      live = next
    }
    val expect = live.toSeq.flatMap(t => Seq(t._1, t._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val out = Graph.kCore(edges.toDF("src", "dst"), "src", "dst",
        k = k, maxRounds = 100)
      .select("node", "core_degree").as[(Long, Long)].collect().toMap
    assert(out == expect)
  }

  test("bfsDistance: directed chain with branches, seeds, cutoff") {
    // 1 -> 2 -> 3 -> 4 -> 5, plus shortcut 1 -> 3, island 8 -> 9,
    // back-edge 3 -> 1; seeds {1, 9} (9 only appears as a dst so it IS
    // a graph node), ghost seed 77 dropped
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L),
      (8L, 9L), (3L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L, 9L, 77L).toDF("id")
    val out = Graph.bfsDistance(edges, "src", "dst", seeds, "id", maxHops = 2)
      .as[(Long, Long)].collect().toMap
    // 1@0, 9@0, 2@1, 3@1 (shortcut beats 2-hop), 4@2; 5 beyond cutoff,
    // 8 unreachable (edges are directed), 77 ghost
    assert(out == Map(1L -> 0L, 9L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("bfsDistance matches brute-force BFS on a random directed graph") {
    val edges = randomEdges(40, 200, 13).filter(e => e._1 != e._2)
    val seedIds = Seq(0L, 1L, 2L)
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nodes = edges.flatMap(t => Seq(t._1, t._2)).toSet
    // driver-side BFS
    var dist = seedIds.filter(nodes.contains).map(_ -> 0L).toMap
    var frontier = dist.keySet
    var h = 1L
    while (h <= 5 && frontier.nonEmpty) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains)
      dist = dist ++ next.map(_ -> h)
      frontier = next
      h += 1
    }
    val out = Graph.bfsDistance(edges.toDF("src", "dst"), "src", "dst",
        seedIds.toDF("id"), "id", maxHops = 5)
      .as[(Long, Long)].collect().toMap
    assert(out == dist)
  }

  test("shortestPaths matches hop-bounded Bellman-Ford on a random weighted graph") {
    val rnd = new scala.util.Random(23)
    val edges = (1 to 250).map(_ => (rnd.nextInt(40).toLong,
      rnd.nextInt(40).toLong, (rnd.nextInt(20) + 1).toLong))
      .filter(e => e._1 != e._2)
    val seedIds = Seq(0L, 5L)
    // driver-side k-round Bellman-Ford (full relaxation = reference)
    val nodes = edges.flatMap(t => Seq(t._1, t._2)).toSet
    val minEdge = edges.groupBy(e => (e._1, e._2))
      .map { case (k, v) => k -> v.map(_._3).min }
    var dist = seedIds.filter(nodes.contains).map(_ -> 0L).toMap
    for (_ <- 1 to 4) {
      val relax = minEdge.toSeq.flatMap { case ((u, v), w) =>
        dist.get(u).map(d => v -> (d + w)) }
      dist = (dist.toSeq ++ relax).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).min }
    }
    val out = graft.operators.Graph.shortestPaths(
        edges.toDF("src", "dst", "w"), "src", "dst", "w",
        seedIds.toDF("id"), "id", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(out == dist)
  }

  test("shortestPaths: cheap long route beats short expensive one within bound") {
    // 1 -> 9 direct costs 100; 1 -> 2 -> 3 -> 9 costs 3
    val edges = Seq((1L, 9L, 100L), (1L, 2L, 1L), (2L, 3L, 1L),
      (3L, 9L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("id")
    val r1 = graft.operators.Graph.shortestPaths(edges, "src", "dst",
        "w", seeds, "id", rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 0L, 9L -> 100L, 2L -> 1L))
    val r3 = graft.operators.Graph.shortestPaths(edges, "src", "dst",
        "w", seeds, "id", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(r3 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 9L -> 3L))
    // negative weights rejected
    intercept[IllegalArgumentException] {
      graft.operators.Graph.shortestPaths(
        Seq((1L, 2L, -1L)).toDF("src", "dst", "w"),
        "src", "dst", "w", seeds, "id", rounds = 1)
    }
  }

  test("bfsDistance: empty seed intersection yields empty output") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val out = Graph.bfsDistance(edges, "src", "dst",
      Seq(99L).toDF("id"), "id", maxHops = 3)
    assert(out.count() == 0)
  }

  test("linkPrediction: exact CN/Jaccard/PA on a hand graph, apex cap") {
    // triangle 1-2-3 plus 2-4, 3-4: the only non-adjacent pairs with
    // common neighbors are (1,4) via {2,3} and none else
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("s", "d")
    val out = Graph.linkPrediction(edges, "s", "d",
        maxApexDegree = 100L, minCommon = 1L, k = 10)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    // deg: 1->2, 2->3, 3->3, 4->2; (1,4): cn=2, jac=2/(2+2-2)=1
    assert(out === Set((1L, 4L, 2L, 2L, 2L, 10000L, 4L)))
    // cap below every degree: no apexes, no candidates
    assert(Graph.linkPrediction(edges, "s", "d",
      maxApexDegree = 1L, minCommon = 1L, k = 10).count() === 0L)
  }

  test("linkPrediction matches brute force on a random graph") {
    val edges = randomEdges(25, 80, 11)
    val und = undirect(edges)
    val adj = und.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val deg = adj.map { case (k, ns) => k -> ns.size.toLong }
    val nodes = adj.keys.toSeq.sorted
    val expected = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      u = nodes(i); v = nodes(j)
      if !und.contains((u, v))
      cn = (adj(u) & adj(v)).size.toLong
      if cn >= 2
    } yield (u, v, deg(u), deg(v), cn,
      10000L * cn / (deg(u) + deg(v) - cn), deg(u) * deg(v))).toSet
    val out = Graph.linkPrediction(edges.toDF("s", "d"), "s", "d",
        maxApexDegree = 1000L, minCommon = 2L, k = 100000)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(out === expected)
  }

  test("edgeSupport: triangle edges support 1, pendant edge 0") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val out = Graph.edgeSupport(edges, "s", "d")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L),
      (3L, 4L, 0L)))
  }

  test("edgeSupport matches brute force on a random graph") {
    val edges = randomEdges(25, 90, 13)
    val und = undirect(edges)
    val adj = und.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val expected = und.map { case (u, v) =>
      (u, v, (adj(u) & adj(v)).size.toLong) }
    val out = Graph.edgeSupport(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === expected)
  }

  test("kTruss peels to the cohesive core") {
    // 4-clique {1,2,3,4} + a triangle {4,5,6} + pendant 6-7
    val clique = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val edges = (clique ++ Seq((4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L)))
      .toDF("s", "d")
    // 4-truss (support >= 2): only the 4-clique survives (each clique
    // edge sits in 2 triangles; the {4,5,6} triangle edges have 1)
    val t4 = Graph.kTruss(edges, "s", "d", k = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(t4.map(t => (t._1, t._2)) === clique.toSet)
    assert(t4.forall(_._3 == 2L))
    // 3-truss (support >= 1): clique + triangle survive, pendant drops
    val t3 = Graph.kTruss(edges, "s", "d", k = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(t3.map(t => (t._1, t._2)) ===
      (clique ++ Seq((4L, 5L), (4L, 6L), (5L, 6L))).toSet)
    // k = 2: every edge survives with its support
    assert(Graph.kTruss(edges, "s", "d", k = 2).count() === 10L)
  }

  test("kTruss matches brute-force peeling on a random graph") {
    val edges = randomEdges(20, 60, 17)
    var live = undirect(edges)
    var changed = true
    while (changed) {
      val adj = live.flatMap { case (u, v) => Seq(u -> v, v -> u) }
        .groupBy(_._1).map { case (n, vs) => n -> vs.map(_._2).toSet }
      val sup = live.map { case (u, v) =>
        (u, v) -> (adj(u) & adj(v)).size }.toMap
      val next = live.filter(e => sup(e) >= 2) // k = 4
      changed = next != live
      live = next
    }
    val got = Graph.kTruss(edges.toDF("s", "d"), "s", "d", k = 4)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2)).toSet
    assert(got === live)
  }

  test("betweennessFromSeeds: path and diamond hand cases") {
    // path 1→2→3, seed 1: the middle node carries the (1,3) pair
    val path = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val gotPath = Graph.betweennessFromSeeds(path, "s", "d",
        Seq(1L).toDF("seed"), "seed", maxHops = 5)
      .as[(Long, Long)].collect().toMap
    assert(gotPath == Map(2L -> 1000000L, 3L -> 0L))
    // diamond 1→{2,3}→4: two shortest paths split the dependency
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("s", "d")
    val gotD = Graph.betweennessFromSeeds(diamond, "s", "d",
        Seq(1L).toDF("seed"), "seed", maxHops = 5)
      .as[(Long, Long)].collect().toMap
    assert(gotD == Map(2L -> 500000L, 3L -> 500000L, 4L -> 0L))
    // seed budget trips before any BFS state materializes
    val e = intercept[IllegalArgumentException] {
      Graph.betweennessFromSeeds(path, "s", "d",
        (1L to 9L).toDF("seed"), "seed", maxHops = 2, maxSeeds = 1)
    }
    assert(e.getMessage.contains("maxSeeds"))
  }

  test("betweennessFromSeeds ≡ sequential Brandes fp replay") {
    val edges = randomEdges(25, 90, 11).filter(t => t._1 != t._2).distinct
    val seeds = Seq(0L, 7L, 13L)
    val maxHops = 8
    val scale = 1000000L
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // sequential reference: BFS sigma + declared per-edge-floored delta
    val want = scala.collection.mutable.Map.empty[Long, BigInt]
    for (s <- seeds if edges.exists(t => t._1 == s || t._2 == s)) {
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> BigInt(1))
      var frontier = Seq(s)
      var d = 0
      val byLevel = scala.collection.mutable.ArrayBuffer(Seq(s))
      while (frontier.nonEmpty && d < maxHops) {
        val nextSigma = scala.collection.mutable.Map.empty[Long, BigInt]
        for (v <- frontier; w <- adj.getOrElse(v, Nil)
             if !dist.contains(w))
          nextSigma(w) = nextSigma.getOrElse(w, BigInt(0)) + sigma(v)
        for ((w, sg) <- nextSigma) { dist(w) = d + 1; sigma(w) = sg }
        frontier = nextSigma.keys.toSeq
        if (frontier.nonEmpty) byLevel += frontier
        d += 1
      }
      val delta = scala.collection.mutable.Map.empty[Long, BigInt]
        .withDefaultValue(BigInt(0))
      for (lvl <- (byLevel.size - 2) to 0 by -1; v <- byLevel(lvl)) {
        var acc = BigInt(0)
        for (w <- adj.getOrElse(v, Nil)
             if dist.get(w).contains(lvl + 1))
          acc += sigma(v) * (scale + delta(w)) / sigma(w)
        delta(v) = acc
        if (lvl > 0) want(v) = want.getOrElse(v, BigInt(0)) + acc
      }
      // reached non-seed nodes with zero dependency still score 0 rows
      for (v <- dist.keys if dist(v) > 0)
        want.getOrElseUpdate(v, BigInt(0))
    }
    val got = Graph.betweennessFromSeeds(edges.toDF("s", "d"), "s", "d",
        seeds.toDF("seed"), "seed", maxHops)
      .as[(Long, Long)].collect().toMap
    assert(got == want.map { case (k, v) => k -> v.toLong }.toMap)
  }
}
