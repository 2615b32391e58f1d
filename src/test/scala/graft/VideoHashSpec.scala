package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, VideoHash}

/** Video near-dup battery: frame-hash decode parity, the
  * one-pixel-per-frame perturbation bound, frame-count alignment,
  * the majority gate, banded-pairing parity with brute force, and
  * decode_ok reporting. */
class VideoHashSpec extends SparkSpec {
  import spark.implicits._

  private val W = 18; private val H = 16
  private def frame(seed: Long, f: Int, perturb: Int = 0): Array[Byte] =
    Array.tabulate(W * H) { i =>
      val v = ((seed * 31 + f * 977 + i * 104729) % 256).toInt
      (if (i == 0) (v + perturb) % 256 else v).toByte
    }

  private def video(seed: Long, nf: Int, perturb: Int = 0): Array[Byte] =
    Multimodal.encodeY4m(W, H, (0 until nf).map(frame(seed, _, perturb)))

  test("frameHashes: one dHash per frame, stable across decode") {
    val df = Seq((1L, video(7, 3))).toDF("id", "content")
    val r = VideoHash.frameHashes(df, "content").head()
    assert(r.getBoolean(r.fieldIndex("decode_ok")))
    assert(r.getInt(r.fieldIndex("n_frames")) == 3)
    val hs = r.getSeq[Long](r.fieldIndex("fhashes"))
    assert(hs.length == 3 && hs.distinct.length == 3)
    // re-decode reproduces the hashes bit for bit
    val r2 = VideoHash.frameHashes(df, "content").head()
    assert(r2.getSeq[Long](r2.fieldIndex("fhashes")) == hs)
  }

  test("one-pixel-per-frame twin stays within hamming 1 per frame") {
    val a = VideoHash.frameHashes(
      Seq((1L, video(3, 4))).toDF("id", "content"), "content").head()
    val b = VideoHash.frameHashes(
      Seq((1L, video(3, 4, perturb = 100))).toDF("id", "content"),
      "content").head()
    val ha = a.getSeq[Long](a.fieldIndex("fhashes"))
    val hb = b.getSeq[Long](b.fieldIndex("fhashes"))
    ha.zip(hb).foreach { case (x, y) =>
      assert(java.lang.Long.bitCount(x ^ y) <= 1)
    }
  }

  test("nearDupPairs: planted twins pair; different lengths and " +
    "unrelated videos do not; majority gate counts matches") {
    val vids = Seq(
      (0L, video(10, 3)), (1L, video(10, 3, perturb = 100)), // twins
      (2L, video(99, 3)), // unrelated, same length
      (3L, video(10, 4))) // same seed, different frame count
      .toDF("id", "content")
    val hashed = VideoHash.frameHashes(vids, "content")
    val pairs = VideoHash.nearDupPairs(hashed, "id", maxHamming = 3)
      .select("id_a", "id_b", "n_frames", "n_match")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(pairs.map(p => (p._1, p._2)) == Set((0L, 1L)))
    val p = pairs.head
    assert(p._3 == 3L && p._4 == 3L)
  }

  test("banded candidates + verify == brute-force aligned majority") {
    val vids = (0L until 24L).map { id =>
      val seed = id / 2
      (id, video(seed, 3, perturb = if (id % 2 == 1) 100 else 0))
    }.toDF("id", "content")
    val hashed = VideoHash.frameHashes(vids, "content")
      .localCheckpoint(true)
    val sig = hashed.select(col("id"), col("fhashes"))
      .as[(Long, Seq[Long])].collect().toMap
    val brute = (for {
      a <- sig.keys; b <- sig.keys if a < b
      if sig(a).length == sig(b).length
      m = sig(a).zip(sig(b)).count { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) <= 3 }
      if m * 10000 >= 8000 * sig(a).length
    } yield (a, b)).toSet
    val banded = VideoHash.nearDupPairs(hashed, "id", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded == brute)
    assert(brute.size >= 12) // every planted twin pair found
  }

  private def videoFrom(seed: Long, from: Int, nf: Int,
                        perturb: Int = 0): Array[Byte] =
    Multimodal.encodeY4m(W, H,
      (from until from + nf).map(frame(seed, _, perturb)))

  /** Reference offset scorer: best (n_match, -|d|, -d) over
    * d ∈ [-maxOff, maxOff], gate on the overlap fraction. */
  private def bruteShift(sig: Map[Long, Seq[Long]], maxOff: Int,
                         maxHam: Int, bp: Int)
      : Set[(Long, Long, Long, Long, Long)] =
    (for {
      a <- sig.keys; b <- sig.keys if a < b
      (ha, hb) = (sig(a), sig(b))
      best = (-maxOff to maxOff).map { d =>
        val lo = math.max(0, -d)
        val hi = math.min(ha.length, hb.length - d)
        val ov = math.max(0, hi - lo)
        val m = (lo until hi).count(i =>
          java.lang.Long.bitCount(ha(i) ^ hb(i + d)) <= maxHam)
        (m, -math.abs(d), -d, ov, d)
      }.max
      if best._4 > 0 && best._1 * 10000 >= bp * best._4
    } yield (a, b, best._5.toLong, best._4.toLong, best._1.toLong))
      .toSet

  test("nearDupPairsShifted: trimmed twin found at its offset, " +
    "2-frame trim beyond maxOffset=1 missed, brute parity") {
    val vids = Seq(
      (0L, videoFrom(5, 0, 4)),               // the full sequence
      (1L, videoFrom(5, 1, 3, perturb = 100)), // first frame trimmed
      (2L, videoFrom(5, 2, 2)),               // trimmed by TWO
      (3L, videoFrom(77, 4, 0))               // unrelated
    ).toDF("id", "content")
    val hashed = VideoHash.frameHashes(vids, "content")
      .localCheckpoint(true)
    val out = VideoHash.nearDupPairsShifted(hashed, "id",
        maxHamming = 3, maxOffset = 1)
      .select("id_a", "id_b", "best_offset", "n_overlap", "n_match")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val sig = hashed.select(col("id"), col("fhashes"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out == bruteShift(sig, 1, 3, 8000))
    // the one-frame trim pairs at offset -1 over all 3 shared frames
    assert(out.contains((0L, 1L, -1L, 3L, 3L)))
    // frames 2..3 ARE frames 1..2 of video 1 (same series): offset -1
    assert(out.contains((1L, 2L, -1L, 2L, 2L)))
    // the two-frame trim vs video 0 sits at offset -2 — out of reach
    assert(!out.exists(p => p._1 == 0L && p._2 == 2L))
    // widening the offset window finds it
    val wide = VideoHash.nearDupPairsShifted(hashed, "id",
        maxHamming = 3, maxOffset = 2)
      .select("id_a", "id_b", "best_offset", "n_overlap", "n_match")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(wide == bruteShift(sig, 2, 3, 8000))
    assert(wide.contains((0L, 2L, -2L, 2L, 2L)))
  }

  test("decode_ok=false for non-Y4M bytes and sub-grid frames") {
    val small = Multimodal.encodeY4m(4, 4,
      Seq(Array.fill[Byte](16)(3))) // 4x4 < 9x8 grid
    val df = Seq((1L, "junk".getBytes("UTF-8")), (2L, small))
      .toDF("id", "content")
    val out = VideoHash.frameHashes(df, "content").orderBy("id")
      .select("decode_ok").as[Boolean].collect()
    assert(out.toSeq == Seq(false, false))
  }
}
