package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators shared by batch and streaming paths. */
object Windows {

  /** Tumbling-window aggregation (batch form; the same `window()` call
    * works under readStream with a watermark — see EventsStream). */
  def tumbling(df: DataFrame, tsCol: String, duration: String,
               keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy((window(col(tsCol), duration) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
}

/** Gap-based sessionization (batch): a new session starts when the gap to
  * the previous event of the same user exceeds `gapSeconds`.
  *
  * Scale: one shuffle (partition by user), window functions within each
  * user's (bounded) event stream. The streaming equivalent keeps per-user
  * state via flatMapGroupsWithState (see EventsStream).
  */
object Sessions {

  /** Assign a 1-based session index per user.
    * `tsUsCol` must be an epoch-microseconds BIGINT column. */
  def assign(df: DataFrame, userCol: String, tsUsCol: String,
             tieBreak: String, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsUsCol), col(tieBreak))
    val prev = lag(col(tsUsCol), 1).over(byUser)
    val newSession = when(
      prev.isNull || col(tsUsCol) - prev > gapSeconds * 1000000L, 1).otherwise(0)
    df.withColumn("__new_s", newSession)
      .withColumn("session_idx",
        sum(col("__new_s")).over(byUser.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .drop("__new_s")
  }

  /** Per-session aggregate: event count and start/end (µs). */
  def aggregate(df: DataFrame, userCol: String, tsUsCol: String,
                tieBreak: String, gapSeconds: Long): DataFrame =
    assign(df, userCol, tsUsCol, tieBreak, gapSeconds)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsUsCol)).as("start_us"),
        max(col(tsUsCol)).as("end_us"))
}
