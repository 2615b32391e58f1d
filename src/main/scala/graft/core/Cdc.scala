package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture apply — the keyed MERGE half of table
  * maintenance, next to [[Scd2]]'s snapshot diffing: fold a log of
  * (op ∈ I/U/D, key, ts, payload) changes onto a base table with
  * last-writer-wins semantics (the Delta/Hudi/Iceberg upsert
  * contract, re-expressed as one aggregation).
  *
  * Deterministic total order: changes apply in (ts, idCol) order — the
  * id breaks same-timestamp ties, so replays and re-partitioning
  * cannot reorder the fold. Deletes remove the key; inserts/updates
  * replace the payload wholesale.
  *
  * Scale: base rows become synthetic changes BELOW every real change
  * (epoch −∞ sorts first), then the whole apply is ONE partial-agg
  * shuffle — `max(struct(ts, id, op, payload))` per key, lexicographic
  * struct max, fully codegen'd — no window over the change log, no
  * per-key sort: a hot key with a million updates folds map-side. */
object Cdc {

  /** @param base    current table: `keyCols` + the payload columns
    * @param changes log: `keyCols`, `opCol` ('I'|'U'|'D'), `tsCol`
    *                (castable to long), `idCol` (unique change id,
    *                tie-break), and the same payload columns
    * @return the applied table: `keyCols` + payload of each key's
    *         latest surviving version */
  def apply(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
            opCol: String, tsCol: String, idCol: String): DataFrame = {
    val payload = base.columns.filterNot(keyCols.contains).toSeq
    val baseSide = base.select(
      keyCols.map(col) ++ Seq(lit(Long.MinValue).as("__ts"),
        lit(Long.MinValue).as("__id"), lit("I").as("__op")) ++
        payload.map(col): _*)
    val changeSide = changes.select(
      keyCols.map(col) ++ Seq(col(tsCol).cast("long").as("__ts"),
        col(idCol).cast("long").as("__id"),
        col(opCol).cast("string").as("__op")) ++
        payload.map(c => col(c).cast(base.schema(c).dataType)): _*)
    val latest = baseSide.unionByName(changeSide)
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(col("__ts") +: col("__id") +: col("__op") +:
        payload.map(col): _*)).as("__v"))
    latest.filter(col("__v.__op") =!= "D")
      .select(keyCols.map(col) ++
        payload.map(c => col(s"__v.$c").as(c)): _*)
  }
}
