package graft

import org.apache.spark.sql.functions._

import graft.streaming.GrowthStream
import graft.streaming.GrowthStream.UserEvent

/** Cross-batch parity of the streaming growth/audience accounting
  * twins with their batch reports under OUT-OF-ORDER delivery, plus
  * the stream-only trailing-churn resolution past the batch horizon. */
class GrowthStreamSpec extends SparkSpec {
  import spark.implicits._

  // weeks are Mondays; epoch day 4 = Monday 1970-01-05
  private val Mon0 = 4L
  private def ts(day: Long, hour: Int) = new java.sql.Timestamp(
    day * 86400000L + hour * 3600000L)

  // u1: active weeks 0,1,2 (retained twice); u2: weeks 0,2 (gap →
  // churn at 1, resurrect at 2); u3: week 1 only (churns at 2);
  // u4: week 3 only (new late). Multiple events per active week and
  // a second active day inside u1's week 0 exercise the dedup.
  private val rows: Seq[(Long, java.sql.Timestamp)] = Seq(
    (1L, ts(Mon0, 1)), (1L, ts(Mon0 + 2, 5)), (1L, ts(Mon0 + 7, 1)),
    (1L, ts(Mon0 + 14, 3)),
    (2L, ts(Mon0 + 1, 2)), (2L, ts(Mon0 + 15, 2)),
    (3L, ts(Mon0 + 8, 9)), (3L, ts(Mon0 + 8, 11)),
    (4L, ts(Mon0 + 22, 6)))
  private val sentinelDay = Mon0 + 70

  private def drive[O](makeQuery: org.apache.spark.sql.Dataset[UserEvent] =>
      org.apache.spark.sql.Dataset[O], sink: String): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[UserEvent]
    val q = makeQuery(ms.toDS()).writeStream.format("memory")
      .queryName(sink).outputMode("append").start()
    try {
      val rnd = new scala.util.Random(11)
      val evs = rows.map { case (u, t) => UserEvent(u, t) }
      def dayOf(e: UserEvent): Long = e.ts.getTime / 86400000L
      // one late event held into the next batch — inside the 7-day
      // horizon, so it is newer than the watermark when it arrives
      // (Spark drops stateful-op input OLDER than the watermark)
      val late = evs.find(e => e.user_id == 1L && dayOf(e) == Mon0 + 2).get
      val b1 = rnd.shuffle(evs.filter(e => dayOf(e) <= Mon0 + 7 && e != late))
      val b2 = rnd.shuffle(evs.filter(e =>
        dayOf(e) > Mon0 + 7 && dayOf(e) <= Mon0 + 15) :+ late)
      val b3 = rnd.shuffle(evs.filter(e => dayOf(e) > Mon0 + 15))
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
      ms.addData(b3: _*); q.processAllAvailable()
      ms.addData(UserEvent(999L, ts(sentinelDay, 0)))
      q.processAllAvailable()
    } finally q.stop()
  }

  test("growthStream deltas aggregate to Rolling.growthAccounting") {
    drive(ds => GrowthStream.growthStream(ds, watermark = "7 days"),
      "growthstream")
    val got = spark.table("growthstream")
      .as[GrowthStream.GrowthOut].collect()
    // deltas are per-user-unique per (week, state)
    assert(got.length == got.map(o => (o.user_id, o.week, o.state))
      .distinct.length)
    val gotAgg = got.filter(_.week < sentinelDay)
      .groupBy(_.week).map { case (w, os) =>
        val c = os.groupBy(_.state).view.mapValues(_.size.toLong).toMap
        val active = c.getOrElse("new", 0L) + c.getOrElse("retained", 0L) +
          c.getOrElse("resurrected", 0L)
        w -> ((c.getOrElse("new", 0L), c.getOrElse("retained", 0L),
          c.getOrElse("resurrected", 0L), c.getOrElse("churned", 0L),
          active))
      }
    // batch over the SAME events incl. the sentinel (its far-future
    // week pushes maxW out, so every real user's trailing churn is in
    // scope on both sides); the sentinel's own week stays open in the
    // stream and is excluded from the compare
    val all = rows :+ ((999L, ts(sentinelDay, 0)))
    val batch = graft.operators.Rolling.growthAccounting(
        all.toDF("u", "ts"), "u", "ts")
      .select(datediff(col("week"), lit("1970-01-01")).cast("long"),
        col("new_users"), col("retained_users"),
        col("resurrected_users"), col("churned_users"),
        col("active_users"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .filter(_._1 < sentinelDay)
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap
    assert(gotAgg == batch)
    // the gap churn (u2 at week 1) and trailing churns (u1 at week 3,
    // u2 at week 3, u3 at week 2, u4 at week 4) all resolved
    val churns = got.filter(_.state == "churned")
      .map(o => (o.user_id, o.week)).toSet
    assert(churns == Set((2L, Mon0 + 7), (1L, Mon0 + 21),
      (2L, Mon0 + 21), (3L, Mon0 + 14), (4L, Mon0 + 28)))
  }

  test("audienceStream deltas aggregate to the daily audience report") {
    drive(ds => GrowthStream.audienceStream(ds, watermark = "7 days"),
      "audiencestream")
    val got = spark.table("audiencestream")
      .as[GrowthStream.AudienceOut].collect()
      .filter(_.day < sentinelDay)
    // q183's batch formulation over the same events
    val e = rows.toDF("user_id", "ts")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val firsts = e.groupBy(col("user_id")).agg(min(col("d")).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("new_users"))
    val active = e.groupBy(col("d")).agg(count(lit(1)).as("active_users"))
    val batch = active.join(firsts, Seq("d"), "left")
      .na.fill(0L, Seq("new_users"))
      .select(datediff(col("d"), lit("1970-01-01")).cast("long"),
        col("active_users"), col("new_users"))
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val gotAgg = got.groupBy(_.day).map { case (d, os) =>
      d -> ((os.size.toLong, os.count(_.is_new).toLong))
    }
    assert(gotAgg == batch)
    // per-user single first: exactly one is_new row per user
    assert(got.filter(_.is_new).map(_.user_id).distinct.length ==
      got.map(_.user_id).distinct.length)
  }
}
