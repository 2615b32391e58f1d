package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the continuous twin of
  * [[graft.operators.Funnels.lastTouch]]: per-user state holds ONLY the
  * single latest touch (a constant-size struct, not an event buffer);
  * each conversion is credited on arrival.
  *
  * Tie/order rules match the batch operator exactly: a conversion sees
  * only touches STRICTLY before it (same-microsecond conversions sort
  * before touches via kind 0 < 1), and among same-microsecond touches
  * the highest event id wins. Within a micro-batch events sort by
  * (ts, kind, id); across batches events are assumed per-user
  * time-ordered (the same contract as [[EventsStream.sessions]]) —
  * state keeps the max-(ts, id) touch, so late touches never regress
  * it.
  */
object AttributionStream {

  /** kind 0 = conversion, 1 = touch (channel empty for conversions). */
  case class TouchEvent(user_id: Long, event_id: Long, ts_us: Long,
                        kind: Int, channel: String)
  case class TouchState(tsUs: Long, eventId: Long, channel: String)
  case class AttributionOut(user_id: Long, event_id: Long, ts_us: Long,
                            channel: Option[String])

  /** @param timeoutMs processing-time state expiry (users idle longer
    *   than the attribution window can be dropped); <= 0 disables. */
  def attribute(events: Dataset[TouchEvent], windowUs: Long,
                timeoutMs: Long = -1L): Dataset[AttributionOut] = {
    require(windowUs > 0, "windowUs must be positive")
    import events.sparkSession.implicits._
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, AttributionOut](
        OutputMode.Append(), timeoutConf) {
        case (_, _, state: GroupState[TouchState]) if state.hasTimedOut =>
          state.remove()
          Iterator.empty
        case (user, evs, state: GroupState[TouchState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.kind, e.event_id))
          var cur = state.getOption
          val out = Seq.newBuilder[AttributionOut]
          sorted.foreach { e =>
            if (e.kind == 0) {
              val ch = cur
                .filter(t => t.tsUs < e.ts_us && e.ts_us - t.tsUs <= windowUs)
                .map(_.channel)
              out += AttributionOut(user, e.event_id, e.ts_us, ch)
            } else if (cur.forall(t => e.ts_us > t.tsUs ||
                (e.ts_us == t.tsUs && e.event_id > t.eventId))) {
              cur = Some(TouchState(e.ts_us, e.event_id, e.channel))
            }
          }
          cur.foreach { s =>
            state.update(s)
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
          }
          out.result().iterator
      }
  }
}
