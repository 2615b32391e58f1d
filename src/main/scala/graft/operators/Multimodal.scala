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

  /** Decoded-audio summary over the interleaved PCM sample stream:
    * exact extrema/sums (integer, so downstream aggregation
    * hash-checks) plus strict sign-change zero crossings
    * (`s_{i-1}·s_i < 0`; zeros break runs). */
  final case class WavStats(sampleRate: Int, channels: Int, bits: Int,
                            nSamples: Long, sMin: Int, sMax: Int,
                            sumAbs: Long, sumSq: Long, zeroCross: Long)

  /** Minimal RIFF/WAVE writer for integer PCM (16-bit LE or 8-bit
    * unsigned), the fixture/export half of [[decodeWav]]. */
  def encodeWav(samples: Array[Int], sampleRate: Int, channels: Int,
                bits: Int = 16): Array[Byte] = {
    require(bits == 16 || bits == 8, s"unsupported PCM width $bits")
    require(channels >= 1 && sampleRate > 0)
    val bytesPer = bits / 8
    val dataLen = samples.length * bytesPer
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * bytesPer)
      .putShort((channels * bytesPer).toShort).putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) {
      if (bits == 16) bb.putShort(samples(i).toShort)
      else bb.put((samples(i) + 128).toByte) // 8-bit PCM: unsigned disk
      i += 1
    }
    bb.array()
  }

  /** REAL audio decode: a from-scratch RIFF/WAVE chunk walker +
    * integer-PCM reader (16-bit signed LE / 8-bit unsigned, the
    * overwhelmingly common uncompressed layouts) — pure JVM byte
    * arithmetic, zero codec dependencies, so it runs identically on
    * every executor. Non-RIFF / compressed / truncated payloads return
    * None (degrade to a reported miss, never a task failure). One pass
    * over the sample bytes, O(1) scratch. 8-bit samples are re-centered
    * to signed (−128..127) so stats share one scale. */
  def decodeWav(content: Array[Byte]): Option[WavStats] = {
    if (content.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(content)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(content, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmtOk = false
    var channels = 0; var rate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= content.length && (dataOff < 0 || !fmtOk)) {
      val id = tag(off); val size = bb.getInt(off + 4)
      if (size < 0 || off + 8 + size > content.length) return None
      if (id == "fmt " && size >= 16) {
        val audioFormat = bb.getShort(off + 8) & 0xffff
        channels = bb.getShort(off + 10) & 0xffff
        rate = bb.getInt(off + 12)
        bits = bb.getShort(off + 22) & 0xffff
        if (audioFormat != 1 || (bits != 16 && bits != 8) ||
          channels < 1 || rate <= 0) return None
        fmtOk = true
      } else if (id == "data") { dataOff = off + 8; dataLen = size }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0) return None
    val bytesPer = bits / 8
    val n = dataLen / bytesPer
    var i = 0
    var mn = Int.MaxValue; var mx = Int.MinValue
    var sumAbs = 0L; var sumSq = 0L; var zc = 0L; var prev = 0
    while (i < n) {
      val v =
        if (bits == 16) bb.getShort(dataOff + i * 2).toInt
        else (content(dataOff + i) & 0xff) - 128
      if (v < mn) mn = v
      if (v > mx) mx = v
      sumAbs += math.abs(v).toLong
      sumSq += v.toLong * v
      if (i > 0 && prev.toLong * v < 0) zc += 1
      prev = v
      i += 1
    }
    if (n == 0) { mn = 0; mx = 0 }
    Some(WavStats(rate, channels, bits, n, mn, mx, sumAbs, sumSq, zc))
  }

  /** Decoded-video summary: container geometry plus exact luma-plane
    * stats over all frames (integer, so aggregation hash-checks). */
  final case class Y4mStats(width: Int, height: Int, nFrames: Int,
                            ySum: Long, yMin: Int, yMax: Int)

  /** Minimal YUV4MPEG2 writer (C420, constant-gray chroma): the
    * fixture/export half of [[decodeY4m]]. `frames` are w·h luma
    * planes in raster order. */
  def encodeY4m(width: Int, height: Int,
                frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0)
    require(frames.forall(_.length == width * height))
    val header =
      s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C420jpeg\n"
        .getBytes("US-ASCII")
    val chroma = Array.fill[Byte]((width / 2) * (height / 2))(128.toByte)
    val marker = "FRAME\n".getBytes("US-ASCII")
    val bb = java.nio.ByteBuffer.allocate(header.length +
      frames.size * (marker.length + width * height + 2 * chroma.length))
    bb.put(header)
    for (f <- frames) { bb.put(marker); bb.put(f); bb.put(chroma)
      bb.put(chroma) }
    bb.array()
  }

  /** REAL video-container decode: a from-scratch YUV4MPEG2
    * (`ffmpeg`'s uncompressed interchange format) header parser +
    * C420/C444/C422 frame walker — pure JVM byte arithmetic, zero
    * codec dependencies. Per frame it folds the LUMA plane into exact
    * integer stats; chroma is skipped by size. Compressed codecs stay
    * out of scope (no codec libs in this container) — but "video as an
    * opaque binary column" is now REAL end-to-end for the standard
    * uncompressed format, closing #36's video leg the way
    * [[decodeWav]] closed audio. Non-Y4M / truncated payloads return
    * None. */
  def decodeY4m(content: Array[Byte]): Option[Y4mStats] = {
    val magic = "YUV4MPEG2"
    if (content.length < magic.length + 1) return None
    if (new String(content, 0, magic.length, "US-ASCII") != magic)
      return None
    val nl = content.indexOf('\n'.toByte)
    if (nl < 0) return None
    val header = new String(content, 0, nl, "US-ASCII")
    var w = -1; var h = -1; var chromaDiv = 4 // C420 default
    for (tok <- header.split(' ').drop(1)) {
      if (tok.startsWith("W")) w =
        try tok.substring(1).toInt catch { case _: Exception => -1 }
      else if (tok.startsWith("H")) h =
        try tok.substring(1).toInt catch { case _: Exception => -1 }
      else if (tok.startsWith("C")) {
        if (tok.startsWith("C420")) chromaDiv = 4
        else if (tok.startsWith("C422")) chromaDiv = 2
        else if (tok.startsWith("C444")) chromaDiv = 1
        else return None
      }
    }
    if (w <= 0 || h <= 0) return None
    val ySize = w * h
    val frameSize = ySize + 2 * (ySize / chromaDiv)
    var off = nl + 1
    var n = 0
    var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
    while (off < content.length) {
      // frame header: "FRAME" + optional params + '\n'
      if (off + 6 > content.length ||
        new String(content, off, 5, "US-ASCII") != "FRAME") return None
      val fnl = content.indexOf('\n'.toByte, off)
      if (fnl < 0 || fnl + 1 + frameSize > content.length) return None
      var i = fnl + 1
      val yEnd = i + ySize
      while (i < yEnd) {
        val v = content(i) & 0xff
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      off = fnl + 1 + frameSize
      n += 1
    }
    if (n == 0) { mn = 0; mx = 0 }
    Some(Y4mStats(w, h, n, sum, mn, mx))
  }

  /** Per-frame LUMA planes of a Y4M container — the frame accessor
    * [[VideoHash]] hashes over ([[decodeY4m]] folds stats without
    * materializing frames; this variant materializes one w·h luma
    * grid per frame, scratch bounded by one frame at a time through
    * the iterator). None on non-Y4M / truncated payloads. */
  private[operators] def y4mFrames(content: Array[Byte])
      : Option[(Int, Int, Iterator[Array[Int]])] = {
    val magic = "YUV4MPEG2"
    if (content.length < magic.length + 1) return None
    if (new String(content, 0, magic.length, "US-ASCII") != magic)
      return None
    val nl = content.indexOf('\n'.toByte)
    if (nl < 0) return None
    val header = new String(content, 0, nl, "US-ASCII")
    var w = -1; var h = -1; var chromaDiv = 4
    for (tok <- header.split(' ').drop(1)) {
      if (tok.startsWith("W")) w =
        try tok.substring(1).toInt catch { case _: Exception => -1 }
      else if (tok.startsWith("H")) h =
        try tok.substring(1).toInt catch { case _: Exception => -1 }
      else if (tok.startsWith("C")) {
        if (tok.startsWith("C420")) chromaDiv = 4
        else if (tok.startsWith("C422")) chromaDiv = 2
        else if (tok.startsWith("C444")) chromaDiv = 1
        else return None
      }
    }
    if (w <= 0 || h <= 0) return None
    val ySize = w * h
    val frameSize = ySize + 2 * (ySize / chromaDiv)
    val it = new Iterator[Array[Int]] {
      private var off = nl + 1
      private var bad = false
      def hasNext: Boolean = !bad && off < content.length
      def next(): Array[Int] = {
        if (off + 6 > content.length ||
          new String(content, off, 5, "US-ASCII") != "FRAME")
          throw new java.io.IOException("bad frame header")
        val fnl = content.indexOf('\n'.toByte, off)
        if (fnl < 0 || fnl + 1 + frameSize > content.length) {
          bad = true
          throw new java.io.IOException("truncated frame")
        }
        val out = new Array[Int](ySize)
        var i = 0
        while (i < ySize) {
          out(i) = content(fnl + 1 + i) & 0xff
          i += 1
        }
        off = fnl + 1 + frameSize
        out
      }
    }
    Some((w, h, it))
  }

  /** Partition-parallel REAL video feature extraction — the Y4M twin
    * of [[imageFeatures]]/[[wavFeatures]]. */
  def y4mFeatures(df: DataFrame): DataFrame = {
    val session = df.sparkSession
    val outSchema = StructType(
      df.schema.fields.filterNot(_.name == "content") ++ Seq(
        StructField("decode_ok", BooleanType, nullable = false),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("n_frames", IntegerType),
        StructField("y_sum", LongType),
        StructField("y_min", IntegerType),
        StructField("y_max", IntegerType)))
    val contentIdx = df.schema.fieldIndex("content")
    val keepIdx = df.schema.fields.indices.filterNot(_ == contentIdx)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val kept = keepIdx.map(r.get)
        decodeY4m(r.getAs[Array[Byte]](contentIdx)) match {
          case Some(st) =>
            Row.fromSeq(kept ++ Seq(true, st.width, st.height,
              st.nFrames, st.ySum, st.yMin, st.yMax))
          case None =>
            Row.fromSeq(kept ++ Seq(false, null, null, null, null,
              null, null))
        }
      }
    }
    session.createDataFrame(rdd, outSchema)
  }

  /** Partition-parallel REAL audio feature extraction — the WAV twin of
    * [[imageFeatures]]: decode `content` with [[decodeWav]] into exact
    * integer PCM stats; undecodable payloads keep their row with
    * `decode_ok = false`. Embarrassingly parallel scan work, no
    * shuffle. */
  def wavFeatures(df: DataFrame): DataFrame = {
    val session = df.sparkSession
    val outSchema = StructType(
      df.schema.fields.filterNot(_.name == "content") ++ Seq(
        StructField("decode_ok", BooleanType, nullable = false),
        StructField("sample_rate", IntegerType),
        StructField("channels", IntegerType),
        StructField("bits", IntegerType),
        StructField("n_samples", LongType),
        StructField("s_min", IntegerType),
        StructField("s_max", IntegerType),
        StructField("sum_abs", LongType),
        StructField("sum_sq", LongType),
        StructField("zero_crossings", LongType)))
    val contentIdx = df.schema.fieldIndex("content")
    val keepIdx = df.schema.fields.indices.filterNot(_ == contentIdx)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val kept = keepIdx.map(r.get)
        decodeWav(r.getAs[Array[Byte]](contentIdx)) match {
          case Some(st) =>
            Row.fromSeq(kept ++ Seq(true, st.sampleRate, st.channels,
              st.bits, st.nSamples, st.sMin, st.sMax, st.sumAbs,
              st.sumSq, st.zeroCross))
          case None =>
            Row.fromSeq(kept ++ Seq(false, null, null, null, null,
              null, null, null, null, null))
        }
      }
    }
    session.createDataFrame(rdd, outSchema)
  }
}
