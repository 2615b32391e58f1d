package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusSim

/** Corpus-level bottom-k similarity: exact when the sketch swallows the
  * whole union, statistically tight when it doesn't. */
class CorpusSimSpec extends SparkSpec {
  import spark.implicits._

  test("k >= |union| makes the estimate EXACT Jaccard") {
    // unigram shingles with hand-countable overlap: A={w1..w4},
    // B={w3..w6} → inter 2, union 6
    val df = Seq(
      (1L, "w1 w2 w3 w4", "A"),
      (2L, "w3 w4 w5 w6", "B")).toDF("doc_id", "text", "src")
    val out = CorpusSim.corpusSimilarity(df, "src", "text", n = 1, k = 1000)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("A", "B", 6L, 2L, 2L * 10000L / 6L)))
  }

  test("estimate tracks true Jaccard within the KMV error bound") {
    // A = x1..x400, B = x201..x600 → true J = 200/600 = 0.3333
    val a = (1 to 400).map(i => s"x$i").mkString(" ")
    val b = (201 to 600).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, a, "A"), (2L, b, "B")).toDF("doc_id", "text", "src")
    val row = CorpusSim.corpusSimilarity(df, "src", "text", n = 1, k = 256)
      .head
    assert(row.getLong(2) == 256L) // sketch filled
    val est = row.getLong(4) / 10000.0
    // hypergeometric sd ~0.022 at k=256, N=600; 0.1 is >4 sigma
    assert(math.abs(est - 1.0 / 3.0) < 0.1,
      s"estimate $est too far from 1/3")
  }

  test("per-group sketches are partitioning-invariant") {
    val docs = (1 to 50).map(i =>
      (i.toLong, (1 to 30).map(j => s"t${(i * 7 + j) % 97}").mkString(" "),
        s"s${i % 3}"))
    val df = docs.toDF("doc_id", "text", "src")
    val one = CorpusSim.bottomKSketches(df.repartition(1), "src", "text",
      n = 2, k = 32).collect().map(r => r.getString(0) -> r.getSeq[Long](1))
      .toMap
    val many = CorpusSim.bottomKSketches(df.repartition(13), "src", "text",
      n = 2, k = 32).collect().map(r => r.getString(0) -> r.getSeq[Long](1))
      .toMap
    assert(one == many)
    assert(one.values.forall(s => s == s.sorted && s.distinct == s))
  }
}
