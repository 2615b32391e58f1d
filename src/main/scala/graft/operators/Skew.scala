package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins.
  *
  * A shuffled join places every row of one key in one partition; a hot
  * key (one user with 10⁸ events, the "und" language bucket…) then
  * serializes the whole stage. `saltedJoin` splits each hot key into
  * `salt` sub-keys: the large side gets a deterministic per-row salt,
  * the small side is replicated across all salt values, and the join
  * key becomes (keys…, salt) — same result set, `salt`× the
  * parallelism on the hottest key. Complements AQE's skew-join
  * splitting (which needs map-output sizes and only helps
  * sort-merge joins).
  */
object Skew {

  /** Equi-join `large ⋈ small` on `keys` with the large side salted.
    * Supported join types: inner / left (the replicated side must be
    * the lookup side). The per-row salt is a deterministic hash of the
    * large side's whole row, so repeated runs produce identical
    * partitioning. */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"unsupported join type for salting: $joinType")
    val l = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(salt)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
