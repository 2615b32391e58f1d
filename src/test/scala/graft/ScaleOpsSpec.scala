package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.core.Intervals
import graft.operators.{BloomJoin, Profile, Quantize, Splits, TextIndex}

/** Specs for the scale-posture operators (ScalePack). */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Intervals.overlapJoin ------------------------------------------

  private def ivDf(rows: Seq[(Int, String, String, Int)]) =
    rows.toDF("k", "valid_from", "valid_until", "payload")
      .select(col("k"), col("valid_from").cast("date"),
        col("valid_until").cast("date"), col("payload"))

  test("overlapJoin equals the brute-force overlap join") {
    val rnd = new scala.util.Random(7)
    def randIv(n: Int, tag: Int) = (1 to n).map { i =>
      val from = rnd.nextInt(300)
      val len = 1 + rnd.nextInt(90) // spans several 30-day buckets
      (rnd.nextInt(5),
        java.time.LocalDate.of(2020, 1, 1).plusDays(from).toString,
        java.time.LocalDate.of(2020, 1, 1).plusDays(from + len).toString,
        tag * 1000 + i)
    }
    val a = ivDf(randIv(40, 1))
    val b = ivDf(randIv(40, 2))
      .withColumnRenamed("payload", "payload_b")

    val got = Intervals.overlapJoin(a, b, Seq("k"), bucketDays = 30)
      .select("k", "payload", "payload_b", "overlap_from", "overlap_until")
      .as[(Int, Int, Int, String, String)].collect().toSet

    val brute = a.as("a").join(
        b.select(col("k"), col("valid_from").as("bf"),
          col("valid_until").as("bu"), col("payload_b")), Seq("k"))
      .filter(col("valid_from") < col("bu") && col("bf") < col("valid_until"))
      .select(col("k"), col("payload"), col("payload_b"),
        greatest(col("valid_from"), col("bf")).cast("string"),
        least(col("valid_until"), col("bu")).cast("string"))
      .as[(Int, Int, Int, String, String)].collect().toSet

    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("overlapJoin emits each overlapping pair exactly once") {
    // one pair spanning MANY shared buckets must not duplicate
    val a = ivDf(Seq((1, "2020-01-01", "2020-12-31", 10)))
    val b = ivDf(Seq((1, "2020-02-01", "2020-11-30", 20)))
      .withColumnRenamed("payload", "payload_b")
    val out = Intervals.overlapJoin(a, b, Seq("k"), bucketDays = 7).collect()
    assert(out.length == 1)
  }

  test("overlapJoin preserves genuinely duplicate input rows") {
    // two IDENTICAL a rows must each pair with the b row (a true join
    // yields 2 rows; a distinct-based dedup would collapse them)
    val a = ivDf(Seq((1, "2020-01-01", "2020-03-01", 10),
      (1, "2020-01-01", "2020-03-01", 10)))
    val b = ivDf(Seq((1, "2020-02-01", "2020-04-01", 20)))
      .withColumnRenamed("payload", "payload_b")
    assert(Intervals.overlapJoin(a, b, Seq("k"), bucketDays = 7)
      .count() == 2L)
  }

  // ---- Splits.weightedMix ---------------------------------------------

  test("weightedMix keeps exact integer-derived per-group counts") {
    val df = (1 to 1000).map(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "grp")
    val weights = Map("a" -> 3L, "b" -> 1L) // ΣW = 4
    val out = Splits.weightedMix(df, "grp", "id", weights)
    val counts = out.groupBy("grp").count()
      .as[(String, Long)].collect().toMap
    // cnt_a=333, cnt_b=667 → N = min(333*4/3, 667*4/1) = 444
    // keep_a = 444*3/4 = 333, keep_b = 444*1/4 = 111
    assert(counts == Map("a" -> 333L, "b" -> 111L))
    // deterministic: second run picks the identical id set
    val again = Splits.weightedMix(df, "grp", "id", weights)
    assert(out.select("id").as[Long].collect().toSet ==
      again.select("id").as[Long].collect().toSet)
  }

  test("weightedMix drops groups without a weight") {
    val df = Seq((1L, "a"), (2L, "zz")).toDF("id", "grp")
    val out = Splits.weightedMix(df, "grp", "id", Map("a" -> 1L))
    assert(out.select("grp").as[String].collect().toSet == Set("a"))
  }

  test("weightedMix is empty when a weighted group has no rows") {
    // "fr" can supply nothing → largest feasible N is 0, not a silent
    // 100%-"en" corpus mislabeled as a 50/50 mix
    val df = Seq((1L, "en"), (2L, "en")).toDF("id", "grp")
    val out = Splits.weightedMix(df, "grp", "id",
      Map("en" -> 1L, "fr" -> 1L))
    assert(out.count() == 0L)
  }

  // ---- BloomJoin ------------------------------------------------------

  test("bloom-pruned join equals the plain join") {
    val big = (1L to 5000L).map(i => (i, s"p$i")).toDF("k", "payload")
    val small = Seq((10L, "x"), (4999L, "y"), (77L, "z"), (8888L, "w"))
      .toDF("sk", "tag")
    val got = BloomJoin.prunedJoin(big, small, "k", "sk")
      .select("k", "payload", "tag")
      .as[(Long, String, String)].collect().toSet
    val plain = big.join(small, col("k") === col("sk"))
      .select("k", "payload", "tag")
      .as[(Long, String, String)].collect().toSet
    assert(got == plain)
    assert(got.size == 3)
  }

  test("bloom-pruned join with an empty small side is empty") {
    val big = (1L to 100L).toDF("k").withColumn("p", lit("x"))
    val small = Seq.empty[(Long, String)].toDF("sk", "t")
    assert(BloomJoin.prunedJoin(big, small, "k", "sk").count() == 0L)
  }

  test("bloom-pruned join handles same-named keys as a using-join") {
    val big = (1L to 100L).map(i => (i, s"p$i")).toDF("k", "payload")
    val small = Seq((7L, "x"), (42L, "y")).toDF("k", "tag")
    val out = BloomJoin.prunedJoin(big, small, "k", "k")
      .select("k", "payload", "tag")
      .as[(Long, String, String)].collect().toSet
    assert(out == Set((7L, "p7", "x"), (42L, "p42", "y")))
  }

  // ---- Profile --------------------------------------------------------

  test("histogram buckets partition every row and bound the values") {
    val df = (1 to 500)
      .map(i => (if (i % 2 == 0) "e" else "o", (i * 13) % 97))
      .toDF("grp", "v")
    val h = Profile.histogram(df, "grp", "v", nBuckets = 8)
      .as[(String, Int, Long, Long, Long)].collect()
    assert(h.map(_._5).sum == 500L) // counts partition the input
    h.foreach { case (_, b, lo, hi, _) =>
      assert(b >= 0 && b < 8 && lo < hi)
    }
    // every value lands inside its bucket bounds
    val withB = df.join(
      h.toSeq.toDF("grp", "bucket", "lo", "hi", "n"), Seq("grp"))
      .filter(col("v") >= col("lo") && col("v") < col("hi"))
    assert(withB.count() == 500L)
  }

  test("approxDistinct is within the requested rsd of exact") {
    val df = (1 to 20000).map(i => ("g", i % 1234)).toDF("grp", "v")
    val approx = Profile.approxDistinct(df, "grp", "v", rsd = 0.02)
      .as[(String, Long)].head()._2
    assert(math.abs(approx - 1234.0) / 1234.0 < 0.1)
  }

  test("quantiles: long scalar output within the GK rank-error bound") {
    // values 1..n → a value's rank IS its value, so the Greenwald-Khanna
    // guarantee (rank error ≤ n/accuracy) is directly checkable
    val n = 2000
    val df = (1 to n).map(i => (if (i % 2 == 0) "a" else "b", i))
      .toDF("grp", "v")
    val probs = Seq(0.25, 0.5, 0.75, 0.99)
    val acc = 100
    val got = Profile.quantiles(df, "grp", "v", probs, accuracy = acc)
      .as[(String, Double, Int)].collect()
    // long format: one scalar row per (group, prob)
    assert(got.map(x => (x._1, x._2)).toSet ==
      (for (g <- Seq("a", "b"); p <- probs) yield (g, p)).toSet)
    val half = n / 2 // each group holds every-other value of 1..n
    got.foreach { case (g, p, v) =>
      val rankInGroup = (v + (if (g == "a") 0 else 1)) / 2
      assert(math.abs(rankInGroup - p * half) <= half.toDouble / acc + 1.0,
        s"($g, $p) -> $v outside the GK bound")
    }
  }

  test("quantiles rejects an empty prob list") {
    intercept[IllegalArgumentException] {
      Profile.quantiles(Seq(("a", 1)).toDF("grp", "v"), "grp", "v", Nil)
    }
  }

  // ---- Quantize -------------------------------------------------------

  private val vecs = {
    val rnd = new scala.util.Random(11)
    (0L until 60L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2f - 1f))).toDF("id", "emb")
  }

  test("quantization codes are in range and reconstruct within s/127") {
    val s = Quantize.scaleOf(vecs, "emb")
    assert(s > 0.0 && s <= 1.0)
    val rows = Quantize.quantizedLong(vecs, "id", "emb", s)
      .as[(Long, Int, Long)].collect()
    assert(rows.length == 60 * 16)
    assert(rows.forall { case (_, _, q) => q >= -127L && q <= 127L })
    // reconstruction: |q*s/127 - x| <= s/127 (half-step rounding + clamp)
    val orig = vecs.as[(Long, Array[Float])].collect().toMap
    rows.foreach { case (id, pos, q) =>
      val x = orig(id)(pos - 1).toDouble
      assert(math.abs(q * s / 127.0 - x) <= s / 127.0 + 1e-12)
    }
  }

  test("scaleOf fails loudly on empty and all-zero corpora") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "emb")
    intercept[IllegalArgumentException](Quantize.scaleOf(empty, "emb"))
    val zeros = Seq((1L, Array(0f, 0f))).toDF("id", "emb")
    intercept[IllegalArgumentException](Quantize.scaleOf(zeros, "emb"))
  }

  test("quantized MIPS matches the brute-force integer ranking") {
    val s = Quantize.scaleOf(vecs, "emb")
    val got = Quantize.topKQuantized(vecs, "id", "emb",
        col("id") < 3, k = 5, s)
      .as[(Long, Int, Long, Long)].collect().toSet

    val q = Quantize.quantized(vecs, "id", "emb", s)
      .as[(Long, Array[Long])].collect()
    val brute = (for {
      (qi, qv) <- q if qi < 3
      (ci, cv) <- q if ci != qi
    } yield (qi, ci, qv.zip(cv).map { case (a, b) => a * b }.sum))
      .groupBy(_._1).toSeq.flatMap { case (qi, xs) =>
        xs.sortBy(x => (-x._3, x._2)).take(5).zipWithIndex.map {
          case ((_, ci, d), r) => (qi, r + 1, ci, d) }
      }.toSet
    assert(got == brute)
  }

  // ---- TextIndex ------------------------------------------------------

  private val docs = Seq(
    (1L, "spark shuffle join spark"),
    (2L, "broadcast join spark"),
    (3L, "quantum entanglement chamber"),
    (4L, "join shuffle partition spark"),
    (5L, "partition pruning spark")).toDF("doc_id", "text")

  test("invertedIndex postings: tf exact, df-pruned") {
    val idx = TextIndex.invertedIndex(docs, "doc_id", "text", minDf = 2)
      .as[(String, Long, Long)].collect().toSet
    // "spark" df=5, "join" df=3, "shuffle" df=2, "partition" df=2 survive
    assert(idx.map(_._1) == Set("spark", "join", "shuffle", "partition"))
    assert(idx.contains(("spark", 1L, 2L))) // doubled term counted twice
    assert(idx.contains(("join", 4L, 1L)))
  }

  test("bm25 ranks the query's own distinctive document first") {
    val hits = TextIndex.bm25TopK(docs, "doc_id", "text",
      queries = Seq(9L -> "quantum chamber"), k = 3)
      .as[(Long, Int, Long, Double)].collect()
    assert(hits.head._3 == 3L && hits.head._2 == 1)
    assert(hits.forall(_._4 > 0.0))
  }

  test("bm25 on an empty corpus returns no rows") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextIndex.bm25TopK(empty, "doc_id", "text",
      Seq(1L -> "anything"), k = 3).count() == 0L)
  }

  test("histogram rejects a non-positive bucket count") {
    val df = Seq(("a", 1)).toDF("grp", "v")
    intercept[IllegalArgumentException] {
      Profile.histogram(df, "grp", "v", nBuckets = 0)
    }
  }

  test("bm25 matches a brute-force scorer") {
    val ws = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val n = ws.length.toDouble
    val avgdl = ws.map(_._2.length).sum / n
    val dfm = ws.flatMap(_._2.distinct).groupBy(identity).map {
      case (t, xs) => t -> xs.length }
    val (k1, b) = (1.2, 0.75)
    def score(qterms: Seq[String], terms: Seq[String]): Double =
      qterms.distinct.filter(dfm.contains).map { t =>
        val tf = terms.count(_ == t).toDouble
        if (tf == 0) 0.0
        else {
          val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
          idf * tf * (k1 + 1) /
            (tf + k1 * (1 - b + b * terms.length / avgdl))
        }
      }.sum
    val expected = ws.map { case (id, ts) =>
        (id, score(Seq("spark", "join"), ts)) }
      .filter(_._2 > 0).sortBy(x => (-x._2, x._1)).take(3)
    val got = TextIndex.bm25TopK(docs, "doc_id", "text",
        Seq(1L -> "spark join"), k = 3)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect()
      .map(h => (h._3, h._4))
    assert(got.map(_._1).toSeq == expected.map(_._1).toSeq)
    got.zip(expected).foreach { case ((_, s1), (_, s2)) =>
      assert(math.abs(s1 - s2) < 1e-9)
    }
  }

  test("PortableLn.lnFp tracks 1e6*ln within 3 units; guards fire") {
    import graft.functions.PortableLn
    val cases = Seq((1L, 1L), (3L, 2L), (2L, 1L), (12L, 11L),
      (1000L, 3L), (65537L, 2L), (1L << 39, 1L), (999999937L, 7L),
      (202L, 201L), (4096L, 4095L))
    cases.foreach { case (a, b) =>
      val got = PortableLn.lnFp(BigInt(a), BigInt(b))
      val want = 1e6 * math.log(a.toDouble / b.toDouble)
      assert(math.abs(got - want) <= 3.0, s"lnFp($a,$b)=$got vs $want")
    }
    // monotone in the ratio (needed for rank stability)
    val seq = (1L to 400L).map(d =>
      PortableLn.lnFp(BigInt(2) * 401, BigInt(2) * d + 1))
    assert(seq.zip(seq.tail).forall { case (x, y) => x >= y })
    intercept[IllegalArgumentException] { PortableLn.lnFp(1, 0) }
    intercept[IllegalArgumentException] { PortableLn.lnFp(1, 2) }
    // legal just below the KMax=50 bound, loud require at/above it
    assert(PortableLn.lnFp(BigInt(1) << 49, 1) > 0)
    intercept[IllegalArgumentException] {
      PortableLn.lnFp(BigInt(1) << 51, 1) }
  }

  test("bm25TopKExactFp: ranking matches float bm25 at the same " +
    "profile; scores are the fixed-point scores") {
    val queries = Seq(1L -> "spark join", 2L -> "quantum chamber")
    val float = TextIndex.bm25TopK(docs, "doc_id", "text", queries, 5)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect()
    val exact = TextIndex.bm25TopKExactFp(docs, "doc_id", "text",
        queries, 5)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Long)].collect()
    assert(exact.map(e => (e._1, e._2, e._3)).toSeq ==
      float.map(f => (f._1, f._2, f._3)).toSeq)
    exact.zip(float).foreach { case (e, f) =>
      // fp scale 1e6; per-term floor + ln quantization stay tiny
      assert(math.abs(e._4 / 1e6 - f._4) < 1e-3,
        s"score_fp ${e._4} vs float ${f._4}")
    }
  }
}
