package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the drift/ops detectors — the alarms a 100 TB
  * continuous ingest would actually run, in the [[EventsStream.ewmaStream]]
  * posture: per-group day counts accumulate in bounded state until the
  * advancing watermark closes a day, then days close IN ORDER folding
  * the same exact-integer recurrences as the batch operators, so every
  * emission is bit-comparable to the batch twin on the closed prefix.
  *
  * State per group = the open-day count map (bounded by the watermark
  * horizon) + an O(1) recurrence carry (CUSUM: reference stats and the
  * running C/min/max; seasonal: 7 weekday (total, ndays) cells). An
  * event-time timeout flushes idle groups' closed days.
  */
object DriftStream {

  case class DayEvent(group: String, ts: java.sql.Timestamp)

  case class CusumState(pending: Map[Long, Long], refLeft: Int,
                        refN: Long, refSum: Long, started: Boolean,
                        c: Long, minC: Long, maxC: Long)
  case class CusumOut(group: String, day: Long, n: Long,
                      s_up: Long, s_dn: Long)

  /** STREAMING twin of [[graft.operators.Rolling.cusum]]: the first
    * `refDays` closed days of each group form the in-control
    * reference (no emission), then every later closed day folds
    * `d = refN·n − refSum` into the running cumulative C and its
    * running min/max, emitting the identical one-sided statistics
    * `s_up = C − min(0, runmin C)` / `s_dn = max(0, runmax C) − C`
    * the batch closed form computes — bit-identical on the same
    * closed days, which the spec proves under out-of-order delivery.
    */
  def cusumStream(events: Dataset[DayEvent], watermark: String,
                  refDays: Int): Dataset[CusumOut] = {
    require(refDays >= 1, "refDays must be >= 1")
    val zoneId = events.sparkSession.sessionState.conf.sessionLocalTimeZone
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.group)
      .flatMapGroupsWithState[CusumState, CusumOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (group, evs, state: GroupState[CusumState]) =>
          val zone = java.time.ZoneId.of(zoneId)
          def dayOf(ts: java.sql.Timestamp): Long =
            ts.toInstant.atZone(zone).toLocalDate.toEpochDay
          def dayEndMs(d: Long): Long = java.time.LocalDate
            .ofEpochDay(d + 1).atStartOfDay(zone).toInstant.toEpochMilli
          var st = state.getOption.getOrElse(
            CusumState(Map.empty, refDays, 0L, 0L, false, 0L, 0L, 0L))
          val added = evs.foldLeft(st.pending) { (m, e) =>
            val d = dayOf(e.ts)
            m.updated(d, m.getOrElse(d, 0L) + 1L)
          }
          val wm = state.getCurrentWatermarkMs()
          val (closed, open) =
            added.partition { case (d, _) => dayEndMs(d) <= wm }
          val out = Seq.newBuilder[CusumOut]
          closed.toSeq.sortBy(_._1).foreach { case (d, n) =>
            if (st.refLeft > 0)
              st = st.copy(refLeft = st.refLeft - 1,
                refN = st.refN + 1L, refSum = st.refSum + n)
            else {
              val dev = st.refN * n - st.refSum
              val c = if (st.started) st.c + dev else dev
              val mn = if (st.started) math.min(st.minC, c) else c
              val mx = if (st.started) math.max(st.maxC, c) else c
              st = st.copy(started = true, c = c, minC = mn, maxC = mx)
              out += CusumOut(group, d, n,
                c - math.min(0L, mn), math.max(0L, mx) - c)
            }
          }
          // the carry (reference + C/min/max) must survive even when
          // no day is open — clearing it would restart the detector
          state.update(st.copy(pending = open))
          open.keys.minOption.foreach(d =>
            state.setTimeoutTimestamp(dayEndMs(d)))
          out.result().iterator
      }
  }

  case class SeasonalState(pending: Map[Long, Long],
                           base: Map[Int, (Long, Long)])
  case class SeasonalOut(group: String, day: Long, isodow: Int, n: Long,
                         expected_fp: Long, residual_fp: Long)

  /** STREAMING twin of [[graft.operators.Rolling.seasonalProfile]],
    * PREQUENTIAL by construction: each closing day first folds into
    * its weekday's running (total, ndays) cell, then scores against
    * the baseline-so-far — `expected_fp = scale·tot_w div nd_w`,
    * `residual_fp = scale·n − expected_fp` — exactly what the batch
    * operator emits for that day when run over the closed prefix
    * (the spec proves prefix parity row by row). The batch twin's
    * retrospective baseline (whole history) is recovered at any
    * moment by the final weekday cells, which equal the batch
    * aggregate over the closed days. State per group: open-day map +
    * 7 weekday cells. */
  def seasonalStream(events: Dataset[DayEvent], watermark: String,
                     scale: Long = 10000L): Dataset[SeasonalOut] = {
    require(scale >= 1, "scale must be >= 1")
    val zoneId = events.sparkSession.sessionState.conf.sessionLocalTimeZone
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.group)
      .flatMapGroupsWithState[SeasonalState, SeasonalOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (group, evs, state: GroupState[SeasonalState]) =>
          val zone = java.time.ZoneId.of(zoneId)
          def dayOf(ts: java.sql.Timestamp): Long =
            ts.toInstant.atZone(zone).toLocalDate.toEpochDay
          def dayEndMs(d: Long): Long = java.time.LocalDate
            .ofEpochDay(d + 1).atStartOfDay(zone).toInstant.toEpochMilli
          var st = state.getOption.getOrElse(
            SeasonalState(Map.empty, Map.empty))
          val added = evs.foldLeft(st.pending) { (m, e) =>
            val d = dayOf(e.ts)
            m.updated(d, m.getOrElse(d, 0L) + 1L)
          }
          val wm = state.getCurrentWatermarkMs()
          val (closed, open) =
            added.partition { case (d, _) => dayEndMs(d) <= wm }
          val out = Seq.newBuilder[SeasonalOut]
          closed.toSeq.sortBy(_._1).foreach { case (d, n) =>
            // ISO day-of-week 1=Mon..7=Sun — matches the batch
            // weekday(date) + 1
            val dow = java.time.LocalDate.ofEpochDay(d)
              .getDayOfWeek.getValue
            val (tot0, nd0) = st.base.getOrElse(dow, (0L, 0L))
            val (tot, nd) = (tot0 + n, nd0 + 1L)
            st = st.copy(base = st.base.updated(dow, (tot, nd)))
            val expected = Math.floorDiv(scale * tot, nd)
            out += SeasonalOut(group, d, dow, n, expected,
              scale * n - expected)
          }
          state.update(st.copy(pending = open))
          open.keys.minOption.foreach(d =>
            state.setTimeoutTimestamp(dayEndMs(d)))
          out.result().iterator
      }
  }

  case class HoltState(pending: Map[Long, Long], started: Boolean,
                       level: Long, trend: Long)
  case class HoltOut(group: String, day: Long, n: Long,
                     level_scaled: Long, trend_scaled: Long,
                     forecast_scaled: Long)

  /** STREAMING twin of [[graft.operators.Rolling.holtDaily]]: as the
    * watermark closes days in order, each closed day folds the same
    * exact-integer level+trend shift recurrence
    * (`l ← ((l+b)·(dA−1) + scale·x) >> log2 dA`,
    * `b ← (b·(dB−1) + Δl) >> log2 dB`) and emits the one-step-ahead
    * forecast — bit-identical to the batch fold on the closed days,
    * which the spec proves under out-of-order delivery. State per
    * group: open-day map + the (level, trend) carry. */
  def holtStream(events: Dataset[DayEvent], watermark: String,
                 scale: Long = 256L, denomA: Long = 4L,
                 denomB: Long = 4L): Dataset[HoltOut] = {
    require(scale > 0, "scale must be positive")
    require(denomA > 1 && (denomA & (denomA - 1)) == 0 &&
      denomB > 1 && (denomB & (denomB - 1)) == 0,
      "denomA/denomB must be powers of two > 1")
    val shA = java.lang.Long.numberOfTrailingZeros(denomA)
    val shB = java.lang.Long.numberOfTrailingZeros(denomB)
    val zoneId = events.sparkSession.sessionState.conf.sessionLocalTimeZone
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.group)
      .flatMapGroupsWithState[HoltState, HoltOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (group, evs, state: GroupState[HoltState]) =>
          val zone = java.time.ZoneId.of(zoneId)
          def dayOf(ts: java.sql.Timestamp): Long =
            ts.toInstant.atZone(zone).toLocalDate.toEpochDay
          def dayEndMs(d: Long): Long = java.time.LocalDate
            .ofEpochDay(d + 1).atStartOfDay(zone).toInstant.toEpochMilli
          var st = state.getOption.getOrElse(
            HoltState(Map.empty, false, 0L, 0L))
          val added = evs.foldLeft(st.pending) { (m, e) =>
            val d = dayOf(e.ts)
            m.updated(d, m.getOrElse(d, 0L) + 1L)
          }
          val wm = state.getCurrentWatermarkMs()
          val (closed, open) =
            added.partition { case (d, _) => dayEndMs(d) <= wm }
          val out = Seq.newBuilder[HoltOut]
          closed.toSeq.sortBy(_._1).foreach { case (d, n) =>
            val (l, b) =
              if (!st.started) (n * scale, 0L)
              else {
                val nl = ((st.level + st.trend) * (denomA - 1) +
                  n * scale) >> shA
                (nl, (st.trend * (denomB - 1) + (nl - st.level)) >> shB)
              }
            st = st.copy(started = true, level = l, trend = b)
            out += HoltOut(group, d, n, l, b, l + b)
          }
          state.update(st.copy(pending = open))
          open.keys.minOption.foreach(d =>
            state.setTimeoutTimestamp(dayEndMs(d)))
          out.result().iterator
      }
  }
}
