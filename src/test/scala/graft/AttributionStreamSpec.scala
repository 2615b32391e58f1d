package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Funnels
import graft.streaming.AttributionStream
import graft.streaming.AttributionStream.TouchEvent

/** Streaming last-touch attribution: batch parity + state semantics. */
class AttributionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val W = 2000L

  private def randomEvents(seed: Int, n: Int): Seq[TouchEvent] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val kind = if (rnd.nextInt(3) == 0) 0 else 1
      TouchEvent(rnd.nextInt(5).toLong, i.toLong,
        rnd.nextInt(10000).toLong, kind,
        if (kind == 0) "" else "ch" + (1 + rnd.nextInt(2)))
    }
  }

  private def batchExpected(evs: Seq[TouchEvent]): Map[Long, Option[String]] = {
    val conv = evs.filter(_.kind == 0)
      .map(e => (e.user_id, e.event_id, e.ts_us)).toDF("u", "id", "ts")
    val tch = evs.filter(_.kind == 1)
      .map(e => (e.user_id, e.event_id, e.ts_us, e.channel))
      .toDF("u", "id", "ts", "chan")
    Funnels.lastTouch(conv, tch, "u", "ts", "id", "chan", W)
      .as[(Long, Long, Long, Option[String])].collect()
      .map(r => r._2 -> r._4).toMap
  }

  test("single-batch stream matches Funnels.lastTouch exactly") {
    val evs = randomEvents(seed = 3, n = 250)
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[TouchEvent]
    val q = AttributionStream.attribute(ms.toDS(), W)
      .writeStream.format("memory").queryName("attr1")
      .outputMode("append").start()
    try {
      ms.addData(evs: _*)
      q.processAllAvailable()
      val got = spark.table("attr1")
        .as[(Long, Long, Long, Option[String])].collect()
        .map(r => r._2 -> r._4).toMap
      assert(got === batchExpected(evs))
    } finally q.stop()
  }

  test("time-ordered multi-batch stream matches batch; state is last-touch only") {
    val evs = randomEvents(seed = 9, n = 300)
      .sortBy(e => (e.ts_us, e.kind, e.event_id))
    val chunks = evs.grouped(60).toSeq // per-user time-ordered arrival
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[TouchEvent]
    val q = AttributionStream.attribute(ms.toDS(), W)
      .writeStream.format("memory").queryName("attrN")
      .outputMode("append").start()
    try {
      chunks.foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      val got = spark.table("attrN")
        .as[(Long, Long, Long, Option[String])].collect()
        .map(r => r._2 -> r._4).toMap
      assert(got === batchExpected(evs))
    } finally q.stop()
  }

  test("same-microsecond rules: conversion before touch, max id wins") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[TouchEvent]
    val q = AttributionStream.attribute(ms.toDS(), W)
      .writeStream.format("memory").queryName("attrT")
      .outputMode("append").start()
    try {
      ms.addData(
        TouchEvent(1L, 10L, 100L, 1, "early"),
        TouchEvent(1L, 12L, 500L, 1, "low"),
        TouchEvent(1L, 13L, 500L, 1, "high"), // same ts, higher id
        TouchEvent(1L, 14L, 500L, 0, ""), // same-ts conversion: strict <
        TouchEvent(1L, 15L, 600L, 0, ""))
      q.processAllAvailable()
      val got = spark.table("attrT")
        .as[(Long, Long, Long, Option[String])].collect()
        .map(r => r._2 -> r._4).toMap
      assert(got(14L) === Some("early")) // only strictly-earlier touch
      assert(got(15L) === Some("high")) // same-ts tie → max event id
    } finally q.stop()
  }
}
