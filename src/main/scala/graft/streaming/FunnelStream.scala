package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING twin of [[graft.operators.Funnels.windowFunnel]] — the
  * time-constrained sequential funnel evaluated continuously: each
  * user's step-i time is the earliest admitted step-i event strictly
  * after step-(i−1) and within `windowUs` of it (first-match
  * min-recurrence, identical to the batch operator), and the final
  * (t1..tN, stage) row is emitted exactly once, when the advancing
  * event-time watermark proves the funnel can no longer change:
  * improvements need an event EARLIER than an already-fixed step time
  * (below the watermark ⇒ dropped) and deepening needs an event within
  * `windowUs` of the deepest step time (≤ t_stage + windowUs ≤ wm ⇒
  * dropped). So `freeze = t_stage (+ windowUs if stage < N)` — once the
  * watermark passes it, the chain is settled and state clears.
  *
  * State per user is BOUNDED: `t1` plus the later-step events inside
  * `(t1, t1 + (N−1)·windowUs]` (nothing beyond that horizon can chain);
  * users without a step-1 event hold only their above-watermark later
  * -step events (an old event can never follow a still-future t1) and
  * evaporate when the watermark passes them. Event-time timeouts
  * re-evaluate the freeze with no new input. The parity spec drives
  * out-of-order, cross-batch delivery and compares rows bit-for-bit
  * with the batch operator. */
object FunnelStream {

  case class StepEvent(user: Long, ts: java.sql.Timestamp, step: String)
  case class FunnelState(t1: Long, hasT1: Boolean,
                         pending: Seq[(Int, Long)])
  case class FunnelOut(user: Long, times: Seq[Long], stage: Long)

  private def tsUs(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  def windowFunnelStream(events: Dataset[StepEvent], watermark: String,
                         steps: Seq[String],
                         windowUs: Long): Dataset[FunnelOut] = {
    require(steps.size >= 2, "declare at least two steps")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    require(windowUs > 0, "windowUs must be positive")
    val stepIdx = steps.zipWithIndex.toMap
    val n = steps.size
    import events.sparkSession.implicits._
    events
      .filter(e => stepIdx.contains(e.step))
      .withWatermark("ts", watermark)
      .groupByKey(_.user)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, evs, state: GroupState[FunnelState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(FunnelState(0L, false, Nil))
          val incoming = evs.map(e => (stepIdx(e.step), tsUs(e.ts))).toSeq
          val s1 = (if (st.hasT1) Seq(st.t1) else Nil) ++
            incoming.collect { case (0, ts) => ts }
          val t1Opt = s1.minOption
          val pend0 = st.pending ++ incoming.filter(_._1 > 0)
          t1Opt match {
            case Some(t1) =>
              // horizon: a chain of N−1 gaps of ≤ windowUs each. Events
              // at ts ≤ t1 can't chain TODAY but must survive while
              // above the watermark: a step-1 event ≥ wm arriving in a
              // later batch can lower t1 below them (the horizon only
              // shrinks when t1 drops, so the upper cut is final).
              val pend = pend0.filter { case (_, ts) =>
                (ts > t1 || ts > wmUs) &&
                  ts <= t1 + (n - 1).toLong * windowUs }
              val times = Array.fill(n)(-1L)
              times(0) = t1
              var prev = t1
              var stage = 1
              var broke = false
              for (i <- 1 until n if !broke) {
                val cand = pend.iterator.filter(p => p._1 == i &&
                  p._2 > prev && p._2 - prev <= windowUs).map(_._2)
                if (cand.isEmpty) broke = true
                else {
                  val m = cand.min
                  times(i) = m; prev = m; stage += 1
                }
              }
              val freezeUs =
                if (stage == n) times(n - 1)
                else times(stage - 1) + windowUs
              if (wmUs >= freezeUs) {
                state.remove()
                Iterator.single(
                  FunnelOut(user, times.toSeq, stage.toLong))
              } else {
                state.update(FunnelState(t1, hasT1 = true, pend))
                state.setTimeoutTimestamp(freezeUs / 1000L + 1L)
                Iterator.empty
              }
            case None =>
              // an old later-step event can never follow a t1 that is
              // still in the future (above the watermark)
              val pend = pend0.filter(_._2 > wmUs)
              if (pend.isEmpty) { state.remove(); Iterator.empty }
              else {
                state.update(FunnelState(0L, hasT1 = false, pend))
                state.setTimeoutTimestamp(
                  pend.iterator.map(_._2).max / 1000L + 1L)
                Iterator.empty
              }
          }
      }
  }
}
