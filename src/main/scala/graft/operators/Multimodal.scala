package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Assets travel as opaque `BINARY` columns plus a typed metadata struct;
  * decode / feature-extraction runs partition-parallel over batches.
  * IMAGE decode is REAL — [[imageFeatures]] decodes PNG/JPEG/GIF/BMP
  * payloads through `javax.imageio` (JDK-builtin, zero extra
  * dependencies) into exact dimensions and per-channel pixel stats.
  * Audio/video decoding stays STUBBED (this container has no
  * audio/video codecs): `decodeStub` derives a deterministic fake
  * feature vector from the bytes, while the Spark-side contracts —
  * schema, batching, partition parallelism, output shapes — are real
  * and tested.
  */
object Multimodal {

  /** Canonical asset schema: (asset_id, kind, content, meta{width,height,format}). */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType))))
  ))

  /** STUB decode: a real implementation would decode the media and run a
    * feature extractor; this derives `dim` deterministic pseudo-features
    * from a rolling hash of the bytes so the plumbing is testable. */
  def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L
    val out = new Array[Float](dim)
    var i = 0
    while (i < content.length) {
      h = 31 * h + content(i)
      out(i % dim) += ((h >>> 33) % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** Decoded-image summary: exact dimensions plus per-band pixel
    * sums/extrema (bands in raster order, e.g. R,G,B[,A]). */
  final case class ImageStats(width: Int, height: Int, nChannels: Int,
                              sums: Array[Long], mins: Array[Int],
                              maxs: Array[Int])

  /** REAL image decode via `javax.imageio.ImageIO` (JDK-builtin PNG /
    * JPEG / GIF / BMP readers). Returns None for bytes no installed
    * reader accepts — corrupt payloads degrade to a reported miss,
    * never a task failure. One raster pass, O(pixels) per image,
    * no allocation beyond the band accumulators. */
  def decodeImage(content: Array[Byte]): Option[ImageStats] = {
    val img =
      try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))
      catch { case _: java.io.IOException => null }
    Option(img).map { bi =>
      val raster = bi.getRaster
      val (w, h, bands) =
        (bi.getWidth, bi.getHeight, raster.getNumBands)
      val sums = new Array[Long](bands)
      val mins = Array.fill(bands)(Int.MaxValue)
      val maxs = Array.fill(bands)(Int.MinValue)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < bands) {
            val v = raster.getSample(x, y, b)
            sums(b) += v
            if (v < mins(b)) mins(b) = v
            if (v > maxs(b)) maxs(b) = v
            b += 1
          }
          x += 1
        }
        y += 1
      }
      ImageStats(w, h, bands, sums, mins, maxs)
    }
  }

  /** Partition-parallel REAL image feature extraction: decode the
    * `content` column with [[decodeImage]] and emit exact dimensions
    * and per-channel stats (`mean_centi` = floored 100·sum/pixels per
    * band). Undecodable payloads keep their row with `decode_ok =
    * false` and null features, so coverage is REPORTED, not silently
    * dropped. Same batch shape as [[extractFeatures]]: one task per
    * partition, rows streamed, constant memory — repartition upstream
    * to bound per-task bytes; at cluster scale the decode is
    * embarrassingly parallel scan work with no shuffle. */
  def imageFeatures(df: DataFrame): DataFrame = {
    val session = df.sparkSession
    val outSchema = StructType(
      df.schema.fields.filterNot(_.name == "content") ++ Seq(
        StructField("decode_ok", BooleanType, nullable = false),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("n_channels", IntegerType),
        StructField("mean_centi", ArrayType(LongType)),
        StructField("px_min", ArrayType(IntegerType)),
        StructField("px_max", ArrayType(IntegerType))))
    val contentIdx = df.schema.fieldIndex("content")
    val keepIdx = df.schema.fields.indices.filterNot(_ == contentIdx)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val kept = keepIdx.map(r.get)
        decodeImage(r.getAs[Array[Byte]](contentIdx)) match {
          case Some(st) =>
            val npix = st.width.toLong * st.height
            Row.fromSeq(kept ++ Seq(true, st.width, st.height,
              st.nChannels, st.sums.toSeq.map(s => 100L * s / npix),
              st.mins.toSeq, st.maxs.toSeq))
          case None =>
            Row.fromSeq(kept ++ Seq(false, null, null, null, null,
              null, null))
        }
      }
    }
    session.createDataFrame(rdd, outSchema)
  }

  /** Partition-parallel feature extraction over the binary column.
    * Batch shape: one task per partition, rows streamed — constant
    * memory; repartition upstream to bound per-task bytes. */
  def extractFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    val session = df.sparkSession
    val outSchema = StructType(df.schema.fields.filterNot(_.name == "content") :+
      StructField("features", ArrayType(FloatType), nullable = false))
    val contentIdx = df.schema.fieldIndex("content")
    val keepIdx = df.schema.fields.indices.filterNot(_ == contentIdx)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val feats = decodeStub(r.getAs[Array[Byte]](contentIdx), dim)
        Row.fromSeq(keepIdx.map(r.get) :+ feats.toSeq)
      }
    }
    session.createDataFrame(rdd, outSchema)
  }

  /** Deterministic frame sampling for "video" assets: split the payload
    * into `n` evenly spaced chunks (stub for frame extraction); output one
    * row per sampled frame with its index and byte span. */
  def frameSample(df: DataFrame, n: Int): DataFrame = {
    df.withColumn("__len", length(col("content")))
      .withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_offset",
        (col("frame_idx") * col("__len") / n).cast("long"))
      .withColumn("frame_bytes",
        expr(s"substring(content, cast(frame_offset + 1 as int), " +
          s"cast(greatest(__len div $n, 1) as int))"))
      .drop("__len")
  }

  /** Sliding sample windows over "audio" assets: metadata-driven
    * (sampleRate, bytesPerSample) byte-range windows with stride, the
    * audio twin of Chunking.chunk — window boundaries land on sample
    * boundaries, the final partial window is kept. Output: one row per
    * window with (window_idx, start_sample, n_samples, window_bytes);
    * decode of the PCM payload itself stays stubbed like the rest of
    * this module. Pure per-row codegen'd expressions — no shuffle. */
  def audioWindows(df: DataFrame, sampleRate: Int, windowMs: Int,
                   strideMs: Int, bytesPerSample: Int = 2): DataFrame = {
    require(windowMs > 0 && strideMs > 0 && strideMs <= windowMs)
    val winSamples = sampleRate.toLong * windowMs / 1000
    val strideSamples = sampleRate.toLong * strideMs / 1000
    val totalSamples = (length(col("content")) / bytesPerSample).cast("long")
    val extra = greatest(lit(0L), totalSamples - winSamples)
    val nWin = lit(1) +
      ceil(extra.cast("double") / strideSamples).cast("int")
    df.withColumn("__total", totalSamples)
      .withColumn("window_idx", explode(sequence(lit(0), nWin - 1)))
      .withColumn("start_sample", col("window_idx") * strideSamples)
      .withColumn("n_samples",
        least(lit(winSamples), col("__total") - col("start_sample")))
      .withColumn("window_bytes",
        expr(s"substring(content, cast(start_sample * $bytesPerSample + 1 " +
          s"as int), cast(n_samples * $bytesPerSample as int))"))
      .drop("__total")
  }

  /** Resize metadata transform (stub: real path would re-encode pixels;
    * here only the typed metadata is rewritten, content passed through). */
  def resizeMeta(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta",
      struct(lit(w).as("width"), lit(h).as("height"),
        col("meta.format").as("format")))
}
