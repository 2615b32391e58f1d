package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Sources

/** The two join-layout techniques the 100 TB posture depends on:
  * salting for skewed keys and bucketing for co-located joins. */
class ScaleTechniquesSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on skewed data") {
    // one hot key (90% of rows) + a long tail
    val large = (0 until 2000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong)
    }.toDF("k", "v")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k3", "B"), ("miss", "Z"))
      .toDF("k", "label")

    for (how <- Seq("inner", "left")) {
      val plain = large.join(small, Seq("k"), how)
        .select("k", "v", "label").as[(String, Long, Option[String])]
        .collect().sorted
      val salted = Skew.saltedJoin(large, small, Seq("k"), salt = 8, how)
        .select("k", "v", "label").as[(String, Long, Option[String])]
        .collect().sorted
      assert(salted.toSeq == plain.toSeq, s"join type $how")
    }
    // the hot key really is spread across several salt partitions
    val salts = large
      .withColumn("__salt",
        pmod(xxhash64(large.columns.map(col): _*), lit(8)).cast("int"))
      .filter(col("k") === "hot")
      .select("__salt").distinct().count()
    assert(salts > 4, s"hot key only reached $salts of 8 salt buckets")
  }

  test("bucketed tables join without a shuffle") {
    val dim = (0L until 100L).map(i => (i, s"n$i")).toDF("id", "name")
    val fact = (0L until 1000L).map(i => (i % 100, i * 2)).toDF("id", "x")
    Sources.writeBucketed(dim, "graft_dim_b", Seq("id"), 4)
    Sources.writeBucketed(fact, "graft_fact_b", Seq("id"), 4)
    try {
      val joined = spark.sql(
        """SELECT /*+ MERGE(f) */ f.id, f.x, d.name
          |FROM graft_fact_b f JOIN graft_dim_b d ON f.id = d.id
          |""".stripMargin)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_dim_b")
      spark.sql("DROP TABLE IF EXISTS graft_fact_b")
    }
  }
}
