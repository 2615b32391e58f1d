package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage: candidate pairs via an equi-join on a
  * cheap blocking key, verified with exact edit distance — the classic
  * two-phase design that keeps the quadratic comparison inside blocks
  * (an unblocked fuzzy join is a cross product; at 100 TB the blocking
  * key IS the operator).
  *
  * Edit distance is Spark's codegen'd `levenshtein` (same classic DP
  * any engine implements, so thresholds are engine-exact).
  */
object Linkage {

  /** Self-linkage: pairs (id_a < id_b) sharing `block` whose `nameCol`
    * values are within `maxDist` edits. Output
    * (id_a, id_b, name_a, name_b, dist). */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
                 block: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val a = df.select(col(idCol).as("id_a"), col(nameCol).as("name_a"),
      block.as("__blk"))
    val b = df.select(col(idCol).as("id_b"), col(nameCol).as("name_b"),
      block.as("__blk"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .drop("__blk")
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("dist").cast("int").as("dist"))
  }

  /** Mutual best-match (reciprocal top-1) linkage across two record
    * sets: a pair survives only if b is a's closest match AND a is b's
    * — the standard high-precision rule that kills the asymmetric
    * junk matches a one-sided nearest join keeps. Ties break on
    * (dist, id), so the result is deterministic and engine-exact.
    * Output: (id_a, id_b, dist).
    *
    * Scale: the quadratic stays inside blocks (as in [[fuzzyPairs]]);
    * each side's best is an `argmin` via `min(struct(dist, id))` —
    * partial-agg shaped, NO per-key window, so a hot block never
    * serializes — and mutuality is one equi-join of the two aggregate
    * frames. Candidates are locally checkpointed (both aggregates
    * read them). */
  def mutualBest(left: DataFrame, right: DataFrame, idCol: String,
                 nameCol: String, block: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val a = left.select(col(idCol).as("id_a"), col(nameCol).as("name_a"),
      block.as("__blk"))
    val b = right.select(col(idCol).as("id_b"), col(nameCol).as("name_b"),
      block.as("__blk"))
    val cand = a.join(b, Seq("__blk"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
      .localCheckpoint(true) // two argmin consumers
    val bestA = cand.groupBy(col("id_a"))
      .agg(min(struct(col("dist"), col("id_b"))).as("__m"))
      .select(col("id_a"), col("__m.dist").as("dist"),
        col("__m.id_b").as("id_b"))
    val bestB = cand.groupBy(col("id_b"))
      .agg(min(struct(col("dist"), col("id_a"))).as("__m"))
      .select(col("id_b"), col("__m.dist").as("dist"),
        col("__m.id_a").as("id_a"))
    bestA.join(bestB, Seq("id_a", "id_b", "dist"))
      .select(col("id_a"), col("id_b"), col("dist").cast("int").as("dist"))
  }
}
