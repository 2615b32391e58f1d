package graft.streaming

import org.apache.spark.sql.DataFrame

/** The idempotent-append half of every exactly-once foreachBatch
  * commit in this package, in ONE place: append `rows` to the parquet
  * table at `path`, keeping only rows whose `keyCol` is not already
  * present. A replayed (at-least-once) batch finds its rows present
  * and appends nothing; a first batch finds no table and appends
  * everything. */
object Commits {

  def appendIfAbsent(rows: DataFrame, path: String,
                     keyCol: String): Unit = {
    val spark = rows.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh =
      if (!fs.exists(p)) rows
      else rows.join(spark.read.parquet(path).select(keyCol),
        Seq(keyCol), "left_anti")
    if (!fresh.isEmpty) fresh.write.mode("append").parquet(path)
  }
}
