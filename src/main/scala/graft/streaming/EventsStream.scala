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

  /** Per-window TRENDING items: the mergeable Misra-Gries sketch
    * ([[graft.functions.Sketches]]) under an event-time tumbling window
    * — approximate top-k per window from ONE stateful aggregate whose
    * state is the bounded ≤k-counter summary, never the raw items (an
    * exact per-window groupBy(item) would hold every distinct item in
    * the state store). Watermark closes windows for append output and
    * evicts their summaries. Output: (window_start, item, estimate),
    * sorted by estimate within each window; the MG guarantees
    * (coverage above n/(k+1), bounded undercount) hold per window. */
  def trendingTopK(events: DataFrame, itemCol: String, duration: String,
                   watermark: String, k: Int,
                   tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), duration))
      .agg(graft.functions.Sketches.approxTopK(
        col(itemCol).cast("string"), k).as("__top"))
      .select(col("window.start").as("window_start"),
        explode(col("__top")).as("__e"))
      .select(col("window_start"), col("__e._1").as("item"),
        col("__e._2").as("estimate"))

  case class EwmaEvent(group: String, ts: java.sql.Timestamp)
  case class EwmaState(pending: Map[Long, Long], last: Option[Long])
  case class EwmaOut(group: String, day: Long, n: Long,
                     ewma_scaled: Long)

  /** STREAMING twin of [[graft.operators.Rolling.ewmaDaily]]: per-group
    * day counts accumulate in state until the advancing watermark
    * closes a day, then close in day order folding the same exact-
    * integer recurrence (α = 1/denom at scale×, shift floor-div) and
    * emit (group, day, n, ewma_scaled) — bit-identical to the batch
    * fold on the same data, which the spec proves. State per group is
    * the open-day count map (bounded by the watermark horizon) plus
    * one long of EWMA carry; an event-time timeout flushes idle
    * groups' closed days so nothing waits for a next event. */
  def ewmaStream(events: Dataset[EwmaEvent], watermark: String,
                 scale: Long = 256L, denom: Long = 4L)
      : Dataset[EwmaOut] = {
    require(scale > 0 && denom > 1 && (denom & (denom - 1)) == 0,
      "need scale > 0 and denom a power of two > 1")
    val shift = java.lang.Long.numberOfTrailingZeros(denom)
    val dayMs = 86400000L
    // day bucketing must match the batch twin's `to_date`, which uses
    // the SESSION timezone — a raw epoch-day floorDiv is UTC and would
    // silently break parity off-UTC. The zone rides into the closure
    // as a string (ZoneId isn't serializable-stable across JVMs).
    val zoneId = events.sparkSession.sessionState.conf.sessionLocalTimeZone
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.group)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (group, evs, state: GroupState[EwmaState]) =>
          val zone = java.time.ZoneId.of(zoneId)
          def dayOf(ts: java.sql.Timestamp): Long =
            ts.toInstant.atZone(zone).toLocalDate.toEpochDay
          val prev = state.getOption
            .getOrElse(EwmaState(Map.empty, None))
          val added = evs.foldLeft(prev.pending) { (m, e) =>
            val d = dayOf(e.ts)
            m.updated(d, m.getOrElse(d, 0L) + 1L)
          }
          // close every day fully behind the watermark, in day order,
          // carrying the EWMA forward. Watermark comparison uses the
          // session-zone end-of-day instant.
          val wm = state.getCurrentWatermarkMs()
          def dayEndMs(d: Long): Long = java.time.LocalDate
            .ofEpochDay(d + 1).atStartOfDay(zone).toInstant.toEpochMilli
          val (closed, open) =
            added.partition { case (d, _) => dayEndMs(d) <= wm }
          var carry = prev.last
          val out = closed.toSeq.sortBy(_._1).map { case (d, n) =>
            val e = carry match {
              case None => n * scale
              case Some(p) => (p * (denom - 1) + n * scale) >> shift
            }
            carry = Some(e)
            EwmaOut(group, d, n, e)
          }
          // State never fully clears while the group lives: once all
          // pending days close, what remains IS the recurrence carry
          // (one long) — removing it would silently restart the EWMA
          // on the group's next event. The open-day map, the only
          // unbounded part, is bounded by the watermark horizon.
          state.update(EwmaState(open, carry))
          // wake when the earliest open day can close (no open days →
          // unarmed; the next event re-arms)
          open.keys.minOption.foreach(d =>
            state.setTimeoutTimestamp(dayEndMs(d)))
          out.iterator
      }
  }

  case class SessionEvent(user_id: Long, ts_us: Long)
  case class SessionState(startUs: Long, lastUs: Long, n: Long)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                        n_events: Long)

  /** Gap-based streaming sessionization: a session closes when a later
    * event arrives past the gap, or when the processing-time timeout
    * fires with no further events (so the final session of an idle user
    * is emitted and its state released, not leaked).
    * Batch twin: Sessions.aggregate.
    *
    * @param timeoutMs processing-time state expiry; pass <= 0 to disable
    *   (NoTimeout). Note: with a timeout enabled,
    *   `StreamingQuery.processAllAvailable()` can block indefinitely
    *   because the engine keeps scheduling timeout-evaluation batches —
    *   use awaitTermination/trigger-based control in production and the
    *   NoTimeout mode in deterministic tests. */
  def sessions(events: Dataset[SessionEvent],
               gapSeconds: Long,
               timeoutMs: Long = -1L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeoutConf) {
        case (user, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption
              .map(s => SessionOut(user, s.startUs, s.lastUs, s.n))
            state.remove()
            out.iterator
          } else {
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
            cur.foreach { s =>
              state.update(s)
              if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            }
            closed.result().iterator
          }
      }
  }
}
