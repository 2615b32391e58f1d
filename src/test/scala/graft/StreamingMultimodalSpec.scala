package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.Multimodal
import graft.streaming.{EventsStream, Sessions, Windows}

class StreamingMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def eventDf = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00"), "view"),
    (2L, 10L, ts("2024-01-01 10:10:00"), "view"),
    (3L, 10L, ts("2024-01-01 11:05:00"), "click"),
    (4L, 20L, ts("2024-01-01 10:20:00"), "view")
  ).toDF("event_id", "user_id", "ts", "event_type")

  test("batch sessionize splits on gap") {
    val out = Sessions.aggregate(
      eventDf.withColumn("ts_us", unix_micros(col("ts"))),
      "user_id", "ts_us", "event_id", gapSeconds = 1800)
      .select("user_id", "session_idx", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((10L, 1L, 2L), (10L, 2L, 1L), (20L, 1L, 1L)))
  }

  test("streaming windowed counts match batch tumbling") {
    val dir = Files.createTempDirectory("graft-stream").toFile
    eventDf.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val streamed = EventsStream.read(spark, dir.getAbsolutePath, eventDf.schema)
    val q = EventsStream.windowedCounts(streamed, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamRows = spark.table("wc")
        .select(col("window_start").cast("string"), col("event_type"), col("n"))
        .as[(String, String, Long)].collect().toSet
      val batchRows = Windows.tumbling(eventDf, "ts", "1 hour",
        Seq("event_type"), Seq(count(lit(1)).as("n")))
        .select(col("window_start").cast("string"), col("event_type"), col("n"))
        .as[(String, String, Long)].collect().toSet
      assert(streamRows == batchRows && streamRows.nonEmpty)
    } finally q.stop()
  }

  test("streaming sessions emit closed sessions on gap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[EventsStream.SessionEvent]
    val q = EventsStream.sessions(ms.toDS(), 1800)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      ms.addData(EventsStream.SessionEvent(10L, 1000000L),
        EventsStream.SessionEvent(10L, 2000000L))
      q.processAllAvailable()
      ms.addData(EventsStream.SessionEvent(10L, 4000000000L))
      q.processAllAvailable()
      val rows = spark.table("sess")
        .as[EventsStream.SessionOut].collect().toSet
      assert(rows == Set(EventsStream.SessionOut(10L, 1000000L, 2000000L, 2L)))
    } finally q.stop()
  }

  test("streaming dedup drops duplicate doc ids within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = ms.toDF().toDF("doc_id", "text", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicates("doc_id")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      ms.addData((1L, "a", ts("2024-01-01 10:00:00")),
        (1L, "a-dup", ts("2024-01-01 10:01:00")),
        (2L, "b", ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      ms.addData((2L, "b-dup", ts("2024-01-01 10:03:00")),
        (3L, "c", ts("2024-01-01 10:04:00")))
      q.processAllAvailable()
      val ids = spark.table("sdedup").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("multimodal feature extraction keeps schema, deterministic") {
    val rows = Seq(
      Row(1L, "image", Array[Byte](1, 2, 3, 4, 5), Row(8, 8, "png")),
      Row(2L, "image", Array[Byte](1, 2, 3, 4, 5), Row(8, 8, "png")),
      Row(3L, "audio", Array[Byte](9, 9, 9), Row(0, 0, "wav")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.assetSchema)
    val out = Multimodal.extractFeatures(df, dim = 4)
    assert(out.columns.toSeq ==
      Seq("asset_id", "kind", "meta", "features"))
    val feats = out.orderBy("asset_id")
      .select("features").as[Seq[Float]].collect()
    assert(feats(0) == feats(1))
    assert(feats(0) != feats(2))
  }

  test("multimodal frame sampling emits n frames with offsets") {
    val rows = Seq(Row(1L, "video", Array.tabulate(100)(_.toByte),
      Row(16, 16, "mp4")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.assetSchema)
    val out = Multimodal.frameSample(df, 4)
      .select("frame_idx", "frame_offset").as[(Int, Long)].collect().toSeq
    assert(out == Seq((0, 0L), (1, 25L), (2, 50L), (3, 75L)))
  }

  test("audio windows: stride overlap, sample-aligned, partial tail kept") {
    // 90 bytes @ 2 bytes/sample = 45 samples; 1 kHz, 20 ms window
    // (20 samples), 10 ms stride -> starts 0,10,20,30 (Chunking-style:
    // nWin = 1 + ceil((45-20)/10) = 4); the last window is the partial
    // 15-sample tail.
    val rows = Seq(Row(1L, "audio", Array.tabulate(90)(_.toByte),
      Row(0, 0, "pcm")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.assetSchema)
    val out = Multimodal.audioWindows(df, sampleRate = 1000,
      windowMs = 20, strideMs = 10, bytesPerSample = 2)
      .select("window_idx", "start_sample", "n_samples", "window_bytes")
      .as[(Int, Long, Long, Array[Byte])].collect().toSeq
    assert(out.map(w => (w._1, w._2, w._3)) ==
      Seq((0, 0L, 20L), (1, 10L, 20L), (2, 20L, 20L), (3, 30L, 15L)))
    out.foreach { w =>
      assert(w._4.length == w._3 * 2)
      assert(w._4.headOption.contains((w._2 * 2).toByte))
    }
  }

  test("streaming windowed counts drop data later than the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = EventsStream.windowedCounts(
      ms.toDF().toDF("event_id", "ts", "event_type"),
      "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    try {
      ms.addData((1L, ts("2024-01-01 10:05:00"), "view"),
        (2L, ts("2024-01-01 10:10:00"), "view"))
      q.processAllAvailable()
      // advance event time far enough that the watermark
      // (max_ts - 30 min) passes the 10:00 window end -> it finalizes
      ms.addData((3L, ts("2024-01-01 12:00:00"), "view"))
      q.processAllAvailable()
      // this event is older than the watermark: must NOT reopen 10:00
      ms.addData((4L, ts("2024-01-01 10:20:00"), "view"))
      q.processAllAvailable()
      // close the 12:00 window too so the final table is stable
      ms.addData((5L, ts("2024-01-01 14:00:00"), "view"))
      q.processAllAvailable()
      val rows = spark.table("late")
        .select(col("window_start").cast("string"), col("n"))
        .as[(String, Long)].collect().toMap
      // the late event 4 did not bump the 10:00 window past 2
      assert(rows("2024-01-01 10:00:00") == 2L)
      assert(rows("2024-01-01 12:00:00") == 1L)
    } finally q.stop()
  }

  private def pngBytes(w: Int, h: Int,
                       rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("imageFeatures: real PNG decode, exact dims and channel stats") {
    // 3×2: R = 40·x (cols 0/40/80, two rows each), G = 100·y
    // (rows 0/100, three cols each), B = constant 7 — PNG is
    // lossless, so the decoded raster must reproduce them exactly
    val img = pngBytes(3, 2, (x, y) => (x * 40 << 16) | (y * 100 << 8) | 7)
    val corrupt = Array[Byte](1, 2, 3, 4)
    val df = Seq((1L, "image", img), (2L, "image", corrupt))
      .toDF("asset_id", "kind", "content")
      .repartition(2) // decode must be partition-local
    val out = Multimodal.imageFeatures(df)
      .select("asset_id", "decode_ok", "width", "height", "n_channels",
        "mean_centi", "px_min", "px_max")
      .collect().map(r => r.getLong(0) -> r).toMap
    val ok = out(1L)
    assert(ok.getBoolean(1))
    assert(ok.getInt(2) === 3 && ok.getInt(3) === 2 && ok.getInt(4) === 3)
    // sums over 6 px: R = 2·(0+40+80) = 240, G = 3·(0+100) = 300,
    // B = 6·7 = 42 → mean_centi = 100·sum/6
    assert(ok.getSeq[Long](5) === Seq(4000L, 5000L, 700L))
    assert(ok.getSeq[Int](6) === Seq(0, 0, 7))
    assert(ok.getSeq[Int](7) === Seq(80, 100, 7))
    // corrupt payload: row kept, decode_ok = false, null features
    val bad = out(2L)
    assert(!bad.getBoolean(1) && bad.isNullAt(2) && bad.isNullAt(5))
  }

  test("imageFeatures: grayscale single band and parquet round-trip") {
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSample(0, 0, 0, 10)
    img.getRaster.setSample(1, 0, 0, 20)
    img.getRaster.setSample(0, 1, 0, 30)
    img.getRaster.setSample(1, 1, 0, 200)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    // through parquet: binary columns must survive a real source
    val dir = Files.createTempDirectory("graft-img").toFile
    Seq((7L, "image", bos.toByteArray))
      .toDF("asset_id", "kind", "content")
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val out = Multimodal.imageFeatures(spark.read.parquet(dir.getAbsolutePath))
      .select("asset_id", "decode_ok", "width", "height", "n_channels",
        "mean_centi", "px_min", "px_max").collect().head
    assert(out.getBoolean(1) && out.getInt(2) === 2 && out.getInt(3) === 2)
    assert(out.getInt(4) === 1)
    assert(out.getSeq[Long](5) === Seq(100L * 260 / 4)) // = 6500
    assert(out.getSeq[Int](6) === Seq(10))
    assert(out.getSeq[Int](7) === Seq(200))
  }
}
