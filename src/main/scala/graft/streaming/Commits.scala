package graft.streaming

import org.apache.spark.sql.DataFrame

/** The idempotent-append half of every exactly-once foreachBatch
  * commit in this package, in ONE place: append `rows` to the parquet
  * table at `path`, keeping only rows whose `keyCol` is not already
  * present. A replayed (at-least-once) batch finds its rows present
  * and appends nothing; a first batch finds no table and appends
  * everything.
  *
  * The anti-joined frame is pinned with an eager localCheckpoint so
  * the row set is decided EXACTLY once per commit: without it the
  * emptiness probe and the write would each re-execute the anti-join
  * against the table's then-current file listing, and a concurrent
  * writer (or lineage reading a table mutated between the two actions)
  * could duplicate or drop rows. */
object Commits {

  def appendIfAbsent(rows: DataFrame, path: String,
                     keyCol: String): Unit = {
    val spark = rows.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh = (
      if (!fs.exists(p)) rows
      else rows.join(spark.read.parquet(path).select(keyCol),
        Seq(keyCol), "left_anti")
    ).localCheckpoint(true)
    if (!fresh.isEmpty) fresh.write.mode("append").parquet(path)
  }
}
