package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the audience/growth accounting reports — the
  * continuous new-vs-returning feed a live ingest runs, in the
  * [[DriftStream]] watermark-closing posture but keyed by USER: each
  * user's pending open periods accumulate in bounded state until the
  * advancing watermark closes them, then periods close IN ORDER
  * against the user's first-seen / last-active high-watermarks (two
  * longs — the [[AttributionStream]] constant-size-state posture).
  *
  * Both operators emit PER-USER DELTA rows, not the aggregated report:
  * the weekly/daily counters are one downstream `groupBy(period,
  * state).count()` — the standard streaming-aggregation layer — so the
  * stateful core never holds cross-user totals. On the weeks closed by
  * the watermark, the aggregated deltas equal the batch operators
  * ([[graft.operators.Rolling.growthAccounting]] / the q183 daily
  * report) row for row; past the batch horizon the stream additionally
  * resolves trailing churn (time advanced without activity — knowledge
  * the batch filter `week <= max(week)` deliberately withholds), which
  * the parity spec pins separately.
  *
  * Scale: state per user = first/prev longs + the open-period set
  * (bounded by the watermark horizon). An event-time timeout resolves
  * churn for idle users without waiting for their next event. Events
  * later than the watermark horizon land per the watermark contract:
  * already-closed periods are ignored (the batch operator, re-run over
  * corrected history, is the replay path — same as every other
  * streaming twin here).
  */
object GrowthStream {

  case class UserEvent(user_id: Long, ts: java.sql.Timestamp)

  private val Unset = Long.MinValue

  /** first/prev = epochDay of the Monday of the first/latest CLOSED
    * active week; churnEmitted guards one churn emission per gap. */
  case class GrowthState(pending: Set[Long], first: Long, prev: Long,
                         churnEmitted: Boolean)
  /** week = epochDay of its Monday; state ∈ new | retained |
    * resurrected | churned. */
  case class GrowthOut(user_id: Long, week: Long, state: String)

  /** STREAMING twin of [[graft.operators.Rolling.growthAccounting]]:
    * per closed active week one delta — `new` (first week ever),
    * `retained` (active previous week), `resurrected` (returning
    * after a gap) — plus exactly one `churned` delta at gap start
    * (prev active week + 7 days), resolved either by the activity
    * that ends the gap or by the event-time timeout when the
    * watermark passes the churn week's end. */
  def growthStream(events: Dataset[UserEvent],
                   watermark: String): Dataset[GrowthOut] = {
    val zoneId = events.sparkSession.sessionState.conf.sessionLocalTimeZone
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GrowthState, GrowthOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, evs, state: GroupState[GrowthState]) =>
          val zone = java.time.ZoneId.of(zoneId)
          def weekOf(ts: java.sql.Timestamp): Long =
            ts.toInstant.atZone(zone).toLocalDate
              .`with`(java.time.temporal.TemporalAdjusters
                .previousOrSame(java.time.DayOfWeek.MONDAY))
              .toEpochDay
          def startMs(day: Long): Long = java.time.LocalDate
            .ofEpochDay(day).atStartOfDay(zone).toInstant.toEpochMilli
          var st = state.getOption.getOrElse(
            GrowthState(Set.empty, Unset, Unset, true))
          st = st.copy(pending = st.pending ++ evs.map(e => weekOf(e.ts)))
          val wm = state.getCurrentWatermarkMs()
          val (closed, open) =
            st.pending.partition(w => startMs(w + 7) <= wm)
          val out = Seq.newBuilder[GrowthOut]
          // ascending order; stragglers at or before prev are ignored
          closed.toSeq.sorted.filter(_ > st.prev).foreach { w =>
            if (st.first == Unset) {
              out += GrowthOut(user, w, "new")
              st = st.copy(first = w, prev = w, churnEmitted = false)
            } else if (w == st.prev + 7) {
              out += GrowthOut(user, w, "retained")
              st = st.copy(prev = w, churnEmitted = false)
            } else { // w > prev + 7: the gap churns once, then returns
              if (!st.churnEmitted)
                out += GrowthOut(user, st.prev + 7, "churned")
              out += GrowthOut(user, w, "resurrected")
              st = st.copy(prev = w, churnEmitted = false)
            }
          }
          // trailing churn: the week after prev closed without activity
          if (st.prev != Unset && !st.churnEmitted &&
              !open.contains(st.prev + 7) && startMs(st.prev + 14) <= wm) {
            out += GrowthOut(user, st.prev + 7, "churned")
            st = st.copy(churnEmitted = true)
          }
          state.update(st.copy(pending = open))
          val next = open.map(w => startMs(w + 7)) ++
            (if (st.prev != Unset && !st.churnEmitted)
               Set(startMs(st.prev + 14)) else Set.empty[Long])
          next.minOption.foreach(t =>
            state.setTimeoutTimestamp(math.max(t, wm + 1L)))
          out.result().iterator
      }
  }

  /** first/last = epochDay of the first/latest CLOSED active day. */
  case class AudienceState(pending: Set[Long], first: Long, last: Long)
  /** day = epochDay; is_new marks the user's first active day ever. */
  case class AudienceOut(user_id: Long, day: Long, is_new: Boolean)

  /** STREAMING twin of the daily audience report (q183): per closed
    * active (user, day) one delta with the first-seen flag. Downstream
    * per-day aggregation gives active = count, new = count(is_new),
    * returning = active − new, cum = running sum of new — identical
    * to the batch report on closed days. */
  def audienceStream(events: Dataset[UserEvent],
                     watermark: String): Dataset[AudienceOut] = {
    val zoneId = events.sparkSession.sessionState.conf.sessionLocalTimeZone
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AudienceState, AudienceOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, evs, state: GroupState[AudienceState]) =>
          val zone = java.time.ZoneId.of(zoneId)
          def dayOf(ts: java.sql.Timestamp): Long =
            ts.toInstant.atZone(zone).toLocalDate.toEpochDay
          def startMs(day: Long): Long = java.time.LocalDate
            .ofEpochDay(day).atStartOfDay(zone).toInstant.toEpochMilli
          var st = state.getOption.getOrElse(
            AudienceState(Set.empty, Unset, Unset))
          st = st.copy(pending = st.pending ++ evs.map(e => dayOf(e.ts)))
          val wm = state.getCurrentWatermarkMs()
          val (closed, open) =
            st.pending.partition(d => startMs(d + 1) <= wm)
          val out = Seq.newBuilder[AudienceOut]
          closed.toSeq.sorted.filter(_ > st.last).foreach { d =>
            out += AudienceOut(user, d, st.first == Unset)
            if (st.first == Unset) st = st.copy(first = d)
            st = st.copy(last = d)
          }
          state.update(st.copy(pending = open))
          open.map(d => startMs(d + 1)).minOption.foreach(t =>
            state.setTimeoutTimestamp(math.max(t, wm + 1L)))
          out.result().iterator
      }
  }
}
