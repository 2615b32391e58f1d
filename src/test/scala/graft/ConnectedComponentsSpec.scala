package graft

import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, Dedup}

/** Large-star/small-star connected components: logarithmic convergence
  * on deep chains and full parity with min-label propagation. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("deep chain collapses to its minimum in logarithmic rounds") {
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = ConnectedComponents.labelsWithRounds(
      chain, "a", "b", driverFinishMaxEdges = 0L) // force distributed
    val got = labels.as[(Long, Long)].collect()
    assert(got.length == 200 && got.forall(_._2 == 0L))
    // diameter 199; min-label propagation would need ~199 rounds
    assert(rounds <= 12, s"took $rounds rounds")
  }

  test("random graph labels equal min-label propagation's, on BOTH " +
    "the r17 union-find driver finish and the distributed loops") {
    val rnd = new scala.util.Random(13)
    val pairs = (1 to 250).map(_ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)).toDF("a", "b")
    val cc = ConnectedComponents.run(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    val ccDist = ConnectedComponents.run(pairs, "a", "b",
        driverFinishMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    val prop = Dedup.nearDupClusters(pairs, "a", "b", maxIter = 120)
      .select(col("doc_id"), col("cluster_id"))
      .as[(Long, Long)].collect().toMap
    val propDist = Dedup.nearDupClusters(pairs, "a", "b", maxIter = 120,
        driverFinishMaxEdges = 0L)
      .select(col("doc_id"), col("cluster_id"))
      .as[(Long, Long)].collect().toMap
    assert(cc == prop && cc.nonEmpty)
    assert(ccDist == cc)
    assert(propDist == prop)
  }

  test("self-loops, duplicates and empty input (both paths)") {
    val weird = Seq((7L, 7L), (1L, 2L), (2L, 1L), (1L, 2L))
      .toDF("a", "b")
    val got = ConnectedComponents.run(weird, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(7L -> 7L, 1L -> 1L, 2L -> 1L))
    val gotDist = ConnectedComponents.run(weird, "a", "b",
        driverFinishMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(gotDist == got)
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.run(empty, "a", "b").count() == 0L)
    assert(ConnectedComponents.run(empty, "a", "b",
      driverFinishMaxEdges = 0L).count() == 0L)
  }

  test("non-bigint ids keep the propagation path and its output type " +
    "(the driver twin only claims bigint graphs)") {
    val intPairs = Seq((1, 2), (2, 3), (7, 7)).toDF("a", "b")
    val out = Dedup.nearDupClusters(intPairs, "a", "b")
    assert(out.schema("doc_id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(out.as[(Int, Int)].collect().toMap ==
      Map(1 -> 1, 2 -> 1, 3 -> 1, 7 -> 7))
  }
}
