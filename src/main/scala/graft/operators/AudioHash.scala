package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Integer audio fingerprinting + hamming-banded audio near-dup —
  * the audio leg of the multimodal dedup matrix (text: SimHash/LSH,
  * image: [[ImageHash]]; this closes audio the same way).
  *
  * Fingerprint: the Haitsma–Kalker sign-of-band-energy-difference
  * construction (ISMIR 2002, "A Highly Robust Audio Fingerprint
  * System") in its ALL-INTEGER time-domain variant — no FFT, no
  * floats, so the 64-bit signature is engine-exact and oracle-able:
  *
  *   - the decoded PCM stream splits into a 9×9 ENERGY GRID
  *     (9 frames × 9 bands per frame) with floor boundaries
  *     (cell k of 81 spans samples [⌊k·n/81⌋, ⌊(k+1)·n/81⌋)) —
  *     the [[ImageHash.blockMeans]] boundary rule on a 1-D stream;
  *   - cell energy E(k) = Σ s², exact in a long (≤ n·2^30);
  *   - bit (f, b), f, b ∈ 0..7: sign of the TIME-AND-BAND second
  *     difference, set iff (E(f,b) − E(f,b+1)) − (E(f+1,b) −
  *     E(f+1,b+1)) > 0 — Haitsma–Kalker's exact bit rule with band
  *     energies from time-domain slices instead of spectral bins.
  *
  * Robustness shape: a localized perturbation touches one grid cell,
  * and one cell feeds at most 4 bits (its four adjacent second
  * differences), so small edits stay within a small hamming radius —
  * the property banded pairing exploits.
  *
  * Near-dup pairing reuses [[ImageHash.nearDupPairs]] (4×16-bit
  * bands): EXACT for hamming ≤ 3 by pigeonhole, never all-pairs.
  *
  * Scale: hashing is embarrassingly parallel per-row decode work (one
  * PCM pass per clip, no shuffle); pairing shuffles 4 small rows per
  * clip. */
object AudioHash {

  val Frames = 9 // time frames
  val Bands = 9 // bands per frame (9 -> 8 differences)
  val Cells: Int = Frames * Bands

  /** 81-cell floor-boundary energy grid over an interleaved PCM
    * stream; None when n < 81 (some cell would be empty). */
  private[graft] def energyGrid(samples: Array[Int]): Option[Array[Long]] = {
    val n = samples.length
    if (n < Cells) return None
    val out = new Array[Long](Cells)
    var k = 0
    while (k < Cells) {
      val lo = (k.toLong * n / Cells).toInt
      val hi = ((k + 1).toLong * n / Cells).toInt
      var s = 0L
      var i = lo
      while (i < hi) { val v = samples(i).toLong; s += v * v; i += 1 }
      out(k) = s
      k += 1
    }
    Some(out)
  }

  /** The 64 Haitsma–Kalker sign bits over a 9×9 energy grid; bit
    * index f·8+b. */
  private[graft] def fingerprint64(e: Array[Long]): Long = {
    var h = 0L
    var f = 0
    while (f < Frames - 1) {
      var b = 0
      while (b < Bands - 1) {
        val d1 = e(f * Bands + b) - e(f * Bands + b + 1)
        val d2 = e((f + 1) * Bands + b) - e((f + 1) * Bands + b + 1)
        if (d1 - d2 > 0) h |= (1L << (f * (Bands - 1) + b))
        b += 1
      }
      f += 1
    }
    h
  }

  /** Decode PCM for fingerprinting: one pass re-reading the samples
    * (the [[Multimodal.decodeWav]] walker locates the data chunk; the
    * stats fold there doesn't keep samples, so this variant re-walks
    * and materializes them — per-row scratch bounded by one clip). */
  private[graft] def decodeSamples(content: Array[Byte])
      : Option[Array[Int]] =
    Multimodal.decodeWav(content).map { st =>
      // stats confirmed the layout; re-read the sample words
      val bb = java.nio.ByteBuffer.wrap(content)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      // find the data chunk again (same walk as decodeWav)
      var off = 12
      var dataOff = -1; var dataLen = 0
      while (off + 8 <= content.length && dataOff < 0) {
        val id = new String(content, off, 4, "US-ASCII")
        val size = bb.getInt(off + 4)
        if (id == "data") { dataOff = off + 8; dataLen = size }
        off += 8 + size + (size & 1)
      }
      val bytesPer = st.bits / 8
      val n = dataLen / bytesPer
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) =
          if (st.bits == 16) bb.getShort(dataOff + i * 2).toInt
          else (content(dataOff + i) & 0xff) - 128
        i += 1
      }
      out
    }

  /** Fingerprint a binary WAV column: appends (decode_ok, n_samples,
    * afp). Undecodable payloads and clips shorter than 81 samples
    * report decode_ok = false with null fingerprint — reported, never
    * dropped. */
  def fingerprints(df: DataFrame, contentCol: String = "content")
      : DataFrame = {
    val session = df.sparkSession
    val outSchema = StructType(
      df.schema.fields.filterNot(_.name == contentCol) ++ Seq(
        StructField("decode_ok", BooleanType, nullable = false),
        StructField("n_samples", LongType),
        StructField("afp", LongType)))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val keepIdx = df.schema.fields.indices.filterNot(_ == contentIdx)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val kept = keepIdx.map(r.get)
        val fp = for {
          s <- decodeSamples(r.getAs[Array[Byte]](contentIdx))
          e <- energyGrid(s)
        } yield (s.length.toLong, fingerprint64(e))
        fp match {
          case Some((n, h)) =>
            Row.fromSeq(kept ++ Seq(true, n, h))
          case None =>
            Row.fromSeq(kept ++ Seq(false, null, null))
        }
      }
    }
    session.createDataFrame(rdd, outSchema)
  }

  /** Banded hamming near-dup pairs over the fingerprint — exact for
    * maxHamming ≤ 3 (see [[ImageHash.nearDupPairs]], which this
    * delegates to: the banding is hash-agnostic). */
  def nearDupPairs(fingerprinted: DataFrame, idCol: String,
                   maxHamming: Int): DataFrame =
    ImageHash.nearDupPairs(fingerprinted, idCol, "afp", maxHamming)

  /** SLIDING-WINDOW fingerprints — the per-window variant of
    * [[fingerprints]] that makes audio near-dup tolerant to temporal
    * shifts (trims, padded silence), which a single whole-clip grid
    * by construction is not: window w spans samples [w·hop, w·hop +
    * window), each fingerprinted independently (Haitsma–Kalker's
    * actual framing), giving one `array<long>` per clip. A pad or
    * trim of k·hop samples shifts the window sequence by exactly k —
    * the offset [[nearDupPairsShifted]] votes over. Appends
    * (decode_ok, n_samples, n_windows, wfps); clips shorter than one
    * window report 0 windows with an empty array; undecodable
    * payloads report decode_ok = false — reported, never dropped.
    * Per-row decode scan, no shuffle. */
  def windowFingerprints(df: DataFrame, contentCol: String = "content",
                         windowSamples: Int = 162,
                         hopSamples: Int = 81): DataFrame = {
    require(windowSamples >= Cells,
      s"window must cover the $Cells-cell grid")
    require(hopSamples >= 1)
    val session = df.sparkSession
    val outSchema = StructType(
      df.schema.fields.filterNot(_.name == contentCol) ++ Seq(
        StructField("decode_ok", BooleanType, nullable = false),
        StructField("n_samples", LongType),
        StructField("n_windows", IntegerType),
        StructField("wfps", ArrayType(LongType, containsNull = false))))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val keepIdx = df.schema.fields.indices.filterNot(_ == contentIdx)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val kept = keepIdx.map(r.get)
        decodeSamples(r.getAs[Array[Byte]](contentIdx)) match {
          case Some(s) =>
            val fps = scala.collection.mutable.ArrayBuffer.empty[Long]
            var start = 0
            while (start + windowSamples <= s.length) {
              val grid = energyGrid(
                java.util.Arrays.copyOfRange(s, start,
                  start + windowSamples))
              fps += fingerprint64(grid.get) // window >= Cells samples
              start += hopSamples
            }
            Row.fromSeq(kept ++ Seq(true, s.length.toLong, fps.length,
              fps.toSeq))
          case None =>
            Row.fromSeq(kept ++ Seq(false, null, null, null))
        }
      }
    }
    session.createDataFrame(rdd, outSchema)
  }

  /** Temporal-offset-tolerant audio near-dup over
    * [[windowFingerprints]] output — delegates to the hash-array-
    * generic [[VideoHash.nearDupPairsShifted]] (banded candidates
    * without the window index, best-offset vote verify; exact for
    * maxHamming ≤ 3). A clip padded/trimmed by k·hop samples matches
    * at offset ±k with hamming 0 on every aligned interior window. */
  def nearDupPairsShifted(windowed: DataFrame, idCol: String,
                          maxHamming: Int, maxOffset: Int,
                          minMatchBp: Int = 8000): DataFrame =
    VideoHash.nearDupPairsShifted(windowed, idCol, maxHamming,
      maxOffset, minMatchBp, hashesCol = "wfps")
}
