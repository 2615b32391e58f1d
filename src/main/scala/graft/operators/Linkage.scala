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
}
