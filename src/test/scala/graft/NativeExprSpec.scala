package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import graft.functions.{MinHashSignature, NativeExprs, SimHash64}
import graft.operators.{Dedup, TextAnalysis}

class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "alpha beta gamma delta epsilon zeta eta theta",
    "one two three four five six seven eight nine",
    "x").toDF("text")

  test("native minhash signature is bit-identical to the HOF formulation") {
    val ws = TextAnalysis.words(col("text"))
    val sh = array_distinct(transform(
      sequence(lit(1), greatest(lit(1), size(ws) - 2)),
      i => concat_ws(" ", slice(ws, i, lit(3)))))
    val rows = texts.select(
      NativeExprs.minhashSignature(sh, 64).as("native"),
      Dedup.minhashSignature(sh, 64).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (n, h) => assert(n == h) }
  }

  test("native simhash is bit-identical to the HOF formulation") {
    val ws = TextAnalysis.words(col("text"))
    val rows = texts.select(
      NativeExprs.simhash64(ws).as("native"),
      Dedup.simhash(col("text")).as("hof"))
      .as[(Long, Long)].collect()
    rows.foreach { case (n, h) => assert(n == h) }
  }

  test("expressions survive codegen and handle nulls") {
    val withNull = Seq(Some("a b c d e"), None).toDF("text")
    val out = withNull.select(
      NativeExprs.simhash64(TextAnalysis.words(col("text"))).as("sh"))
      .as[Option[Long]].collect()
    assert(out(0).isDefined)
  }

  test("native word-ngram shingles are identical to the HOF formulation") {
    val edge = texts.union(Seq("", "   ", "one", "a b", "a a a a a a")
      .toDF("text"))
    val rows = edge.select(
      Dedup.shingleArray(col("text"), 3).as("native"),
      Dedup.shingleArrayHof(col("text"), 3).as("hof"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (n, h) => assert(n == h) }
  }

  test("native word-ngram hashes equal xxhash64 over the shingle strings") {
    val edge = texts.union(Seq("", "one", "a b c d").toDF("text"))
    val ws = graft.operators.TextAnalysis.words(col("text"))
    val rows = edge.select(
      NativeExprs.wordNgramHashes(ws, 3).as("native"),
      transform(NativeExprs.wordNgrams(ws, 3), s => xxhash64(s)).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (n, h) => assert(n == h) }
  }

  test("native ngram stats equal the shuffle formulation") {
    import graft.operators.TextAnalysis
    val edge = texts.union(Seq("", "   ", "one", "a b", "a a a a a a",
      "x y x y x y z").toDF("text"))
      .withColumn("doc_id", monotonically_increasing_id())
    val fast = TextAnalysis.repetitionStats(edge, "doc_id", "text")
      .as[(Long, Int, Int, Long, Long, Long)].collect().toSet
    val slow = TextAnalysis.repetitionStatsShuffle(edge, "doc_id", "text")
      .as[(Long, Int, Int, Long, Long, Long)].collect().toSet
    assert(fast == slow)
  }

  private val vecs = Seq(
    (Array(0.5f, -1.25f, 3.0f, 0.0f), Array(2.0f, 0.5f, -0.75f, 1.5f)),
    (Array(1e-7f, 42.0f, -42.0f, 7.5f), Array(-1e3f, 0.125f, 9.0f, -0.5f)),
    (Array(0.0f, 0.0f, 0.0f, 0.0f), Array(1.0f, 2.0f, 3.0f, 4.0f)))
    .toDF("a", "b")

  test("native dot/norm are bit-identical to the HOF formulations") {
    import graft.operators.Similarity
    val da = Similarity.toDouble(col("a"))
    val db = Similarity.toDouble(col("b"))
    val rows = vecs.select(
      Similarity.dot(da, db).as("nd"),
      Similarity.dotHof(da, db).as("hd"),
      Similarity.norm(da).as("nn"),
      Similarity.normHof(da).as("hn"))
      .as[(Double, Double, Double, Double)].collect()
    rows.foreach { case (nd, hd, nn, hn) =>
      assert(java.lang.Double.doubleToLongBits(nd) ==
        java.lang.Double.doubleToLongBits(hd))
      assert(java.lang.Double.doubleToLongBits(nn) ==
        java.lang.Double.doubleToLongBits(hn))
    }
  }

  test("native lsh sign bits are bit-identical to the HOF formulation") {
    import graft.operators.Similarity
    val rows = vecs.select(
      Similarity.lshSignature(col("a"), 4, 16).as("native"),
      Similarity.lshSignatureHof(col("a"), 4, 16).as("hof"))
      .as[(Seq[Int], Seq[Int])].collect()
    rows.foreach { case (n, h) => assert(n == h) }
  }

  test("native nearest-centroid matches argmin of native sqDists, ties low") {
    val cents = Array(
      Array(0.5, -1.25, 3.0, 0.0),   // equals row 1's vector -> dist 0
      Array(0.5, -1.25, 3.0, 0.0),   // duplicate: tie must go to index 0
      Array(100.0, 100.0, 100.0, 100.0))
    val rows = vecs.select(
      NativeExprs.nearestCentroid(col("a").cast("array<double>"), cents)
        .as("c"),
      NativeExprs.centroidSqDists(col("a").cast("array<double>"), cents)
        .as("d"))
      .as[(Int, Seq[Double])].collect()
    rows.foreach { case (c, d) =>
      assert(c == d.zipWithIndex.minBy(_._1)._2)
    }
    assert(rows(0)._1 == 0) // exact-match tie resolved to the lower index
  }

  test("extension registers SQL functions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // builder-level check: the injected builders construct our expressions
    val mh = MinHashSignature(Literal("x"), 4)
    assert(mh.dataType.typeName == "array")
    val sh = SimHash64(Literal("x"))
    assert(sh.dataType.typeName == "long")
  }

  test("SQL surface round-trips through spark.sql") {
    GraftExtensions.registerInto(spark)
    texts.createOrReplaceTempView("graft_sql_docs")
    val viaSql = spark.sql(
      """SELECT graft_minhash(graft_ngrams(split(trim(text), '\\s+'), 3), 8)
        |         AS mh,
        |       graft_simhash(split(trim(text), '\\s+')) AS sh,
        |       graft_ngram_hashes(split(trim(text), '\\s+'), 3) AS nh,
        |       graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |       graft_norm(array(3.0d, 4.0d)) AS nm,
        |       graft_ngram_stats(split(trim(text), '\\s+'), 2) AS st
        |FROM graft_sql_docs""".stripMargin)
      .as[(Seq[Long], Long, Seq[Long], Double, Double, (Long, Long, Long))]
      .collect()
    val ws = TextAnalysis.words(col("text"))
    val viaCols = texts.select(
      NativeExprs.minhashSignature(NativeExprs.wordNgrams(ws, 3), 8),
      NativeExprs.simhash64(ws))
      .as[(Seq[Long], Long)].collect()
    viaSql.zip(viaCols).foreach { case (s, c) =>
      assert(s._1 == c._1 && s._2 == c._2)
    }
    assert(viaSql.head._4 == 11.0 && viaSql.head._5 == 5.0)
  }

  test("deflate length: SQL round-trip, nulls, and entropy ordering") {
    GraftExtensions.registerInto(spark)
    val rnd = new scala.util.Random(7)
    val repetitive = "the same boilerplate line over and over. " * 50
    val entropy = rnd.nextString(repetitive.length)
    val df = Seq(repetitive, entropy, "").toDF("text")
    val viaCol = df.select(NativeExprs.deflateLen(col("text")))
      .as[Long].collect()
    df.createOrReplaceTempView("graft_deflate_docs")
    val viaSql = spark.sql(
      "SELECT graft_deflate_len(text) FROM graft_deflate_docs")
      .as[Long].collect()
    assert(viaCol.toSeq == viaSql.toSeq)
    // repetition compresses an order of magnitude better than noise
    assert(viaCol(0) * 5 < viaCol(1),
      s"repetitive ${viaCol(0)} vs entropy ${viaCol(1)}")
    // empty input still emits the (tiny) final deflate block
    assert(viaCol(2) > 0 && viaCol(2) < 8)
    // null in, null out; determinism across runs
    val n = Seq(Option.empty[String]).toDF("text")
      .select(NativeExprs.deflateLen(col("text"))).collect()
    assert(n(0).isNullAt(0))
    val again = df.select(NativeExprs.deflateLen(col("text")))
      .as[Long].collect()
    assert(again.toSeq == viaCol.toSeq)

    // the operator-level signal: ratio tails order as documented
    val sig = graft.operators.TextAnalysis.compressionSignals(
      Seq((1L, repetitive), (2L, entropy), (3L, "")).toDF("id", "text"),
      "id", "text")
      .select("id", "raw_bytes", "deflate_bytes", "deflate_ratio_bp")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(sig(0)._4 < sig(1)._4) // boilerplate far more compressible
    assert(sig(2) == ((3L, 0L, sig(2)._3, 0L))) // empty: ratio 0
    assert(sig(0)._2 == repetitive.getBytes("UTF-8").length)
  }

  test("portableBucket kernel equals the conv/substring/md5 recipe") {
    val rnd = new scala.util.Random(11)
    val strs = (0 until 200).map(_ => rnd.nextString(rnd.nextInt(24))) ++
      Seq("", "plain", "id|seed", "日本語テキスト", "emoji 🌊 mix",
        "345987|r4")
    val df = strs.toDF("s")
    for (b <- Seq(1L, 7L, 16L, 1000000L)) {
      val got = df.select(NativeExprs.portableBucket(col("s"), b))
        .as[Long].collect()
      val ref = df.select(
        conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long") % b)
        .as[Long].collect()
      assert(got.toSeq == ref.toSeq, s"buckets=$b")
      assert(got.forall(v => v >= 0 && v < b))
    }
    // SQL surface accepts non-string inputs via the analysis-time
    // implicit cast — same number as hashing the decimal string
    graft.GraftExtensions.registerInto(spark)
    Seq(345987L).toDF("id").createOrReplaceTempView("graft_shard_t")
    val viaSql = spark.sql(
      "SELECT graft_shard(id, 16) FROM graft_shard_t").as[Long].head()
    val viaRecipe = Seq("345987").toDF("s")
      .select(conv(substring(md5(col("s")), 1, 8), 16, 10)
        .cast("long") % 16).as[Long].head()
    assert(viaSql == viaRecipe)
  }
}
