package graft

import org.apache.spark.sql.functions._

import graft.operators.{Profile, Selection, Splits}

/** Hot-group specs for the Selection primitives: one group holds 99 %
  * of the rows (the "web = most of the corpus" shape that serialized
  * the old rank-window implementations), results checked against
  * driver-side brute force, and the plan checked for the scale shape —
  * no window over fact rows partitioned by the bare group.
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // 99 % of rows in one group; values Zipf-ish (long-tailed range with
  // the mass clustered low — the shape that defeats a single-level
  // equi-width histogram and needs the second refinement level)
  private lazy val hot = {
    val rows = (1 to 9900).map { i =>
      (i.toLong, "hot", (i % 97).toLong * 3)
    } ++ (1 to 100).map { i =>
      (100000L + i, "cold", if (i == 50) 1000000000L else i.toLong)
    }
    rows.toDF("id", "g", "v")
  }

  private def brute(g: String): Seq[Long] =
    hot.filter(col("g") === g).select("v").as[Long].collect().sorted.toSeq

  test("valueAtRanks: exact order statistics on a 99%-hot group") {
    val got = Selection.valueAtRanks(hot, "g", "v",
      Seq("p1" -> "greatest(1L, (__n * 100L + 9999L) div 10000L)",
        "median" -> "(__n + 1) div 2",
        "p99" -> "(__n * 9900L + 9999L) div 10000L",
        "last" -> "__n",
        "past_end" -> "__n + 1"))
      .select("g", "label", "value").as[(String, String, Long)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    Seq("hot", "cold").foreach { g =>
      val vs = brute(g)
      val n = vs.size
      def at(r: Long): Long = vs((r - 1).toInt)
      assert(got((g, "p1")) == at(math.max(1, (n * 100L + 9999) / 10000)))
      assert(got((g, "median")) == at((n + 1) / 2))
      assert(got((g, "p99")) == at((n * 9900L + 9999) / 10000))
      assert(got((g, "last")) == at(n))
      assert(!got.contains((g, "past_end")), "rank > n must yield no row")
    }
  }

  test("valueAtRanks refinement path: value range wider than 2^32") {
    // forces __w2 > 1, so resolution must fall through to the
    // tie-collapsed value refinement inside the boundary sub-bucket
    val wide = (1 to 500).map { i =>
      (i.toLong, "w", (i.toLong * (1L << 33)) + (i % 7))
    } ++ Seq((1000L, "w", 0L), (1001L, "w", Long.MaxValue - 1))
    val df = wide.toDF("id", "g", "v")
    val vs = wide.map(_._3).sorted
    val got = Selection.valueAtRanks(df, "g", "v",
      Seq("p10" -> "(__n * 1000L + 9999L) div 10000L",
        "median" -> "(__n + 1) div 2", "last" -> "__n"))
      .select("label", "value").as[(String, Long)].collect().toMap
    val n = vs.size
    assert(got("p10") == vs(((n * 1000L + 9999) / 10000).toInt - 1))
    assert(got("median") == vs(((n + 1) / 2).toInt - 1))
    assert(got("last") == vs(n - 1))
  }

  test("valueAtRanks: shuffled fallback equals the driver fast path") {
    // a tiny driverBudgetRows forces the window+broadcast-join
    // resolution; results must be identical row-for-row on the same
    // hot-group input (covers the budget dispatch itself)
    val targets = Seq(
      "p1" -> "greatest(1L, (__n * 100L + 9999L) div 10000L)",
      "median" -> "(__n + 1) div 2",
      "p99" -> "(__n * 9900L + 9999L) div 10000L",
      "last" -> "__n")
    def run(budget: Int) = Selection.valueAtRanks(hot, "g", "v",
        targets, driverBudgetRows = budget)
      .select("g", "label", "value", "n")
      .as[(String, String, Long, Long)].collect().toSet
    assert(run(1) == run(1 << 20))
    // the wide-range shape through BOTH paths too
    val wide = ((1 to 500).map { i =>
      (i.toLong, "w", (i.toLong * (1L << 33)) + (i % 7))
    } ++ Seq((1000L, "w", 0L), (1001L, "w", Long.MaxValue - 1)))
      .toDF("id", "g", "v")
    def runWide(budget: Int) = Selection.valueAtRanks(wide, "g", "v",
        Seq("median" -> "(__n + 1) div 2", "last" -> "__n"),
        driverBudgetRows = budget)
      .select("label", "value").as[(String, Long)].collect().toSet
    assert(runWide(1) == runWide(1 << 20))
  }

  test("valueAtRanks handles constant and single-row groups") {
    val df = Seq((1L, "const", 7L), (2L, "const", 7L), (3L, "one", 42L))
      .toDF("id", "g", "v")
    val got = Selection.valueAtRanks(df, "g", "v",
      Seq("med" -> "(__n + 1) div 2", "max" -> "__n"))
      .select("g", "label", "value").as[(String, String, Long)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(got(("const", "med")) == 7L && got(("const", "max")) == 7L)
    assert(got(("one", "med")) == 42L && got(("one", "max")) == 42L)
  }

  test("valueAtRanks weighted: heavy weights stay on the driver fast path") {
    // 6 rows spread over 80 floor-buckets with Σweight = 6·10^9: the
    // fast-path decision must key on ROW count (6 ≤ budget 32), not on
    // min(span, Σweight) = 80 — and the weighted median must still be
    // exact under the tiny budget
    val v0 = 1L << 20
    val df = Seq.tabulate(6)(i =>
        ((i + 1).toLong, "a", (i + 1) * 10L * v0, 1000000000L))
      .toDF("id", "g", "v", "w")
    val got = Selection.valueAtRanks(df, "g", "v",
        Seq("med" -> "(__n + 1) div 2", "p99" -> "(__n * 99) div 100"),
        driverBudgetRows = 32, weightCol = Some("w"))
      .select("label", "value").as[(String, Long)].collect().toMap
    // rank (6e9+1)/2 = 3e9 (floored) lands in the 3rd row's weight span
    assert(got("med") === 30L * v0)
    assert(got("p99") === 60L * v0)
  }

  test("winsorize on the hot group matches brute force") {
    val out = Profile.winsorize(hot, "g", "v", loBp = 100, hiBp = 9900)
      .select("id", "g", "v", "winsorized")
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == 10000)
    def rankAt(bp: Int, n: Int): Int =
      math.max(1, ((n.toLong * bp + 9999L) / 10000L).toInt)
    val bounds = Seq("hot", "cold").map { g =>
      val vs = brute(g)
      g -> (vs(rankAt(100, vs.size) - 1), vs(rankAt(9900, vs.size) - 1))
    }.toMap
    out.foreach { case (id, g, v, wv) =>
      val (lo, hi) = bounds(g)
      assert(wv == math.min(math.max(v, lo), hi), s"id=$id g=$g v=$v")
    }
  }

  test("equiDepthHistogram on the hot group matches ntile brute force") {
    val k = 8
    val got = Profile.equiDepthHistogram(hot, "g", "v", k)
      .select("g", "bucket", "n", "lo", "hi")
      .as[(String, Int, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4, t._5)).toMap
    Seq("hot", "cold").foreach { g =>
      val vs = brute(g)
      val n = vs.size
      val q = n / k
      val m = n % k
      (1 to k).foreach { t =>
        val size = q + (if (t <= m) 1 else 0)
        if (size >= 1) {
          val start = (t - 1) * q + math.min(t - 1, m)
          val (gn, glo, ghi) = got((g, t))
          assert(gn == size && glo == vs(start) && ghi == vs(start + size - 1),
            s"g=$g tile=$t: got ($gn,$glo,$ghi), want " +
              s"($size,${vs(start)},${vs(start + size - 1)})")
        } else assert(!got.contains((g, t)))
      }
    }
  }

  test("samplePerGroup on the hot group: exact k, ranks dense from 1") {
    val out = Splits.samplePerGroup(hot, "g", "id", k = 25, seed = "hg")
      .select("g", "id", "sample_rank").as[(String, Long, Int)].collect()
    val byG = out.groupBy(_._1)
    assert(byG("hot").length == 25 && byG("cold").length == 25)
    Seq("hot", "cold").foreach { g =>
      assert(byG(g).map(_._3).sorted.toSeq == (1 to 25),
        s"$g ranks not dense")
      // membership: the 25 ids with the smallest (md5 bucket, id)
      val want = hot.filter(col("g") === g)
        .select(col("id"),
          Splits.bucket(concat(col("id").cast("string"), lit("|hg")),
            1000000).as("h"))
        .as[(Long, Long)].collect()
        .sortBy(t => (t._2, t._1)).take(25).map(_._1).toSet
      assert(byG(g).map(_._2).toSet == want, s"$g membership mismatch")
    }
  }

  test("weightedMix on the hot group matches brute force") {
    val weights = Map("hot" -> 3L, "cold" -> 1L)
    val got = Splits.weightedMix(hot, "g", "id", weights)
      .select("g", "id").as[(String, Long)].collect()
    // N = min over groups of cnt_g * 4 div w_g; keep_g = N * w_g div 4
    val cnt = Map("hot" -> 9900L, "cold" -> 100L)
    val n = weights.keys.map(g => cnt(g) * 4L / weights(g)).min
    val byG = got.groupBy(_._1)
    weights.foreach { case (g, w) =>
      val keep = (n * w / 4L).toInt
      val want = hot.filter(col("g") === g)
        .select(col("id"), Splits.bucket(col("id"), 1000000).as("h"))
        .as[(Long, Long)].collect()
        .sortBy(t => (t._2, t._1)).take(keep).map(_._1).toSet
      assert(byG(g).map(_._2).toSet == want, s"$g kept-set mismatch")
    }
  }

  test("no selection window over fact rows partitions by the bare group") {
    import org.apache.spark.sql.catalyst.plans.logical._
    def bare(df: org.apache.spark.sql.DataFrame) = {
      def scanWithoutAgg(p: LogicalPlan): Boolean = p match {
        case _: Aggregate => false
        case _: LocalRelation => false
        case _: LeafNode => true
        case other => other.children.exists(scanWithoutAgg)
      }
      df.queryExecution.optimizedPlan.collect {
        case w: Window if w.partitionSpec.size < 2 &&
          scanWithoutAgg(w.child) => w
      }
    }
    Seq(
      Profile.winsorize(hot, "g", "v", 100, 9900),
      Profile.equiDepthHistogram(hot, "g", "v", 8),
      Splits.samplePerGroup(hot, "g", "id", 25, "hg"),
      Splits.weightedMix(hot, "g", "id", Map("hot" -> 3L, "cold" -> 1L)),
      Selection.valueAtRanks(hot, "g", "v", Seq("m" -> "(__n + 1) div 2"))
    ).foreach { df =>
      assert(bare(df).isEmpty,
        s"bare-group fact window in:\n${df.queryExecution.optimizedPlan}")
    }
  }

  test("topKPerGroup: exact rank-by-value with portable hash tie-break") {
    def bkt(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString, 16) % 1000000L
    }
    // heavy ties: values drawn from a tiny domain
    val rnd = new scala.util.Random(23)
    val rows = (1 to 500).map(i =>
      (i.toLong, "g" + (i % 3), rnd.nextInt(5).toLong))
    for (k <- Seq(1, 7, 200)) {
      val got = Selection.topKPerGroup(rows.toDF("id", "g", "v"),
          "g", "v", "id", k)
        .as[(Long, String, Long)].collect().toSet
      val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
        rs.sortBy(r => (-r._3, bkt(r._1), r._1)).take(k)
      }.toSet
      assert(got === expected, s"k=$k")
    }
    // NULL values have no rank: fail fast instead of silently
    // returning fewer than min(k, |group|) rows
    val withNull = Seq((1L, "g", Some(5L)), (2L, "g", None))
      .toDF("id", "g", "v")
    val ex = intercept[Exception] {
      Selection.topKPerGroup(withNull, "g", "v", "id", 2).collect()
    }
    assert(ex.getMessage.contains("NULL v has no rank") ||
      Option(ex.getCause).exists(_.getMessage.contains("NULL v has no rank")))
  }
}
