package graft

import org.apache.spark.sql.functions._

import graft.operators.{Linkage, TrainingSet}

/** Point-in-time training-set assembly and blocked fuzzy linkage —
  * the two round-3 operators that until now were oracle-checked only
  * (q73/q74). */
class TrainingSetLinkageSpec extends SparkSpec {
  import spark.implicits._

  private def iv(rows: Seq[(Int, String, String, String)]) =
    rows.toDF("key_k", "valid_from", "valid_until", "v")
      .select(col("key_k"), col("valid_from").cast("date"),
        col("valid_until").cast("date"), col("v"))

  test("assemble attaches the version valid at each spine timestamp") {
    val spine = Seq(
      (1, "2020-01-05", 100L), // inside v1
      (1, "2020-02-01", 101L), // exactly at v2's valid_from (inclusive)
      (1, "2020-03-15", 102L), // after v2 closed → NULL
      (2, "2020-01-01", 103L), // before key 2's first version → NULL
      (3, "2020-06-01", 104L)) // key with no feature rows at all → NULL
      .toDF("key_k", "d", "label")
      .select(col("key_k"), col("d").cast("date"), col("label"))
    val feat = iv(Seq(
      (1, "2020-01-01", "2020-02-01", "v1"),
      (1, "2020-02-01", "2020-03-01", "v2"),
      (2, "2020-02-01", null, "w1")))
    val got = TrainingSet.assemble(spine, Seq("key_k"), "d",
        Seq("f" -> feat))
      .select(col("key_k"), col("d").cast("string"), col("label"), col("v"))
      .as[(Int, String, Long, Option[String])].collect().toSet
    assert(got == Set(
      (1, "2020-01-05", 100L, Some("v1")),
      (1, "2020-02-01", 101L, Some("v2")),
      (1, "2020-03-15", 102L, None),
      (2, "2020-01-01", 103L, None),
      (3, "2020-06-01", 104L, None)))
  }

  test("assemble carries open-ended versions forward indefinitely") {
    val spine = Seq((2, "2021-12-31", 1L)).toDF("key_k", "d", "label")
      .select(col("key_k"), col("d").cast("date"), col("label"))
    val feat = iv(Seq((2, "2020-02-01", null, "w1")))
    val got = TrainingSet.assemble(spine, Seq("key_k"), "d",
        Seq("f" -> feat))
      .select("v").as[String].collect().toSeq
    assert(got == Seq("w1"))
  }

  test("assemble rejects payload collisions with other features and spine") {
    val spine = Seq((1, "2020-01-01", 9L)).toDF("key_k", "d", "label")
      .select(col("key_k"), col("d").cast("date"), col("label"))
    val f1 = iv(Seq((1, "2020-01-01", null, "x")))
    // two feature tables exporting the same payload name
    intercept[IllegalArgumentException] {
      TrainingSet.assemble(spine, Seq("key_k"), "d",
        Seq("a" -> f1, "b" -> f1))
    }
    // payload name shadowing a spine column
    val clash = f1.withColumnRenamed("v", "label")
    intercept[IllegalArgumentException] {
      TrainingSet.assemble(spine, Seq("key_k"), "d", Seq("a" -> clash))
    }
  }

  test("fuzzyPairs equals the brute-force within-block comparison") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Seq(
      (1L, "alpha metal plate"), (2L, "alpha metal plates"),
      (3L, "alpha steel plate"), (4L, "beta metal plate"),
      (5L, "beta metal plank"), (6L, "gamma brass rod"))
    val df = names.toDF("id", "name")
    val got = Linkage.fuzzyPairs(df, "id", "name",
        block = split(col("name"), " ").getItem(0), maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)]
      .collect().toSet
    val brute = (for {
      (ia, na) <- names; (ib, nb) <- names
      if ia < ib && na.split(" ")(0) == nb.split(" ")(0)
      d = lev(na, nb) if d <= 2
    } yield (ia, ib, d)).toSet
    assert(got == brute && got.nonEmpty)
    // cross-block near-matches are (by design) not reported
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(1L, 4L) })
  }

  test("mutualBest keeps only reciprocal top-1 pairs, ties deterministic") {
    // block = first word. Left 1 "a xx" is closest to right 10 "a xy"
    // (d=1) and vice versa -> kept. Left 2 "a zz" best is ALSO 10
    // (d=2) but 10 prefers 1 -> dropped (one-sided). Right 11 "a qq"
    // best is 2 (d=2) but 2 prefers 10 -> dropped. Tie case: left 3
    // "b mm" at d=1 from both 12 "b mn" and 13 "b mo"; (dist, id)
    // order picks 12, and 3 is 12's best -> (3, 12) kept.
    val left = Seq((1L, "a xx"), (2L, "a zz"), (3L, "b mm"))
      .toDF("id", "name")
    val right = Seq((10L, "a xy"), (11L, "a qq"), (12L, "b mn"),
      (13L, "b mo")).toDF("id", "name")
    val out = graft.operators.Linkage.mutualBest(left, right, "id",
        "name", block = split(col("name"), " ").getItem(0), maxDist = 3)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)]
      .collect().toSet
    assert(out == Set((1L, 10L, 1), (3L, 12L, 1)))
  }

  test("dispersionIndex: metronomic series ~0 bp, bursty series high") {
    // flat: 5 events every day for 10 days -> variance 0 -> 0 bp.
    // bursty: 50 events on day 1, 0-ish elsewhere (2 days active:
    // x = [50, 2]; n=2, S=52, sq=2504; F_bp = 10000*(2*2504-2704)
    // div (2*52) = 10000*2304 div 104 = 221538461... / compute:
    // 23040000 div 104 = 221538
    val mk = (g: String, day: Int, n: Int) => (0 until n).map(i =>
      (g, java.sql.Timestamp.valueOf(f"2024-02-${day}%02d 10:00:${i % 60}%02d")))
    val rows = (1 to 10).flatMap(d => mk("flat", d, 5)) ++
      mk("burst", 1, 50) ++ mk("burst", 2, 2)
    val out = graft.operators.Profile.dispersionIndex(
        rows.toDF("g", "ts"), "g", "ts")
      .select("g", "n_days", "total", "fano_bp")
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(out("flat") == ((10L, 50L, 0L)))
    assert(out("burst") == ((2L, 52L, 221538L)))
  }
}
