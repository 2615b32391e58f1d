package graft

import org.apache.spark.sql.functions._

import graft.operators.{AudioHash, Multimodal}

/** Audio fingerprint battery: energy-grid boundaries, the
  * one-cell-perturbation hamming bound, decode_ok reporting for
  * undecodable/short clips, and banded-pairing parity with the brute
  * force. */
class AudioHashSpec extends SparkSpec {
  import spark.implicits._

  private def clip(id: Long, perturb: Int = 0): Array[Int] =
    Array.tabulate(324) { i =>
      val base = ((id * 7919 + i * 104729) % 65536).toInt - 32768
      if (i == 0) ((base + 32768 + perturb) % 65536) - 32768 else base
    }

  test("energy grid: floor boundaries cover every sample exactly " +
    "once; short clips refuse") {
    val s = Array.tabulate(100)(i => i - 50)
    val e = AudioHash.energyGrid(s).get
    assert(e.length == 81)
    assert(e.sum == s.map(v => v.toLong * v).sum) // partition of the stream
    assert(AudioHash.energyGrid(Array.fill(80)(1)).isEmpty)
    assert(AudioHash.energyGrid(Array.fill(81)(1)).nonEmpty)
  }

  test("one-sample perturbation flips at most 4 bits (one grid cell " +
    "feeds 4 second-differences)") {
    for (id <- 0L until 20L) {
      val a = AudioHash.fingerprint64(
        AudioHash.energyGrid(clip(id)).get)
      val b = AudioHash.fingerprint64(
        AudioHash.energyGrid(clip(id, perturb = 1000)).get)
      val ham = java.lang.Long.bitCount(a ^ b)
      assert(ham <= 4, s"clip $id: hamming $ham > 4")
    }
  }

  test("fingerprints: decode_ok=false for non-WAV and too-short " +
    "clips, true with a stable hash for real clips") {
    val wav = Multimodal.encodeWav(clip(1), 8000, 1)
    val tiny = Multimodal.encodeWav(Array.fill(50)(7), 8000, 1)
    val junk = "not a riff".getBytes("UTF-8")
    val df = Seq((1L, wav), (2L, tiny), (3L, junk))
      .toDF("id", "content")
    val out = AudioHash.fingerprints(df, "content")
      .orderBy("id").collect()
    assert(out(0).getBoolean(1) && out(0).getLong(2) == 324L)
    assert(!out(1).getBoolean(1) && out(1).isNullAt(3)) // 50 < 81
    assert(!out(2).getBoolean(1))
    // decode path == direct fold
    val direct = AudioHash.fingerprint64(
      AudioHash.energyGrid(clip(1)).get)
    assert(out(0).getLong(3) == direct)
  }

  test("windowFingerprints: per-window fp == slice fingerprints; " +
    "short clip reports zero windows, junk reports decode_ok=false") {
    val s = clip(9) // 324 samples -> windows at 0, 81 (win 162, hop 81)
    val df = Seq(
      (1L, Multimodal.encodeWav(s, 8000, 1)),
      (2L, Multimodal.encodeWav(Array.fill(100)(5), 8000, 1)),
      (3L, "junk".getBytes("UTF-8"))).toDF("id", "content")
    val out = AudioHash.windowFingerprints(df, "content",
      windowSamples = 162, hopSamples = 81).orderBy("id").collect()
    val r1 = out(0)
    assert(r1.getBoolean(1) && r1.getInt(3) == 3)
    val expected = (0 to 2).map(w => AudioHash.fingerprint64(
      AudioHash.energyGrid(s.slice(w * 81, w * 81 + 162)).get))
    assert(r1.getSeq[Long](4) == expected)
    assert(out(1).getBoolean(1) && out(1).getInt(3) == 0 &&
      out(1).getSeq[Long](4).isEmpty) // 100 < 162: no window fits
    assert(!out(2).getBoolean(1))
  }

  test("nearDupPairsShifted: one-hop silence pad found at offset 1, " +
    "two-hop pad beyond maxOffset=1 missed, brute parity") {
    def padded(base: Array[Int], hops: Int): Array[Int] =
      Array.fill(hops * 81)(0) ++ base.dropRight(hops * 81)
    val base = clip(4) ++ clip(5) // 648 samples -> 7 windows
    val clips = Seq(
      (0L, base), (1L, padded(base, 1)), (2L, padded(base, 2)),
      (3L, clip(6) ++ clip(7))) // unrelated
      .map { case (id, s) => (id, Multimodal.encodeWav(s, 8000, 1)) }
      .toDF("id", "content")
    val windowed = AudioHash.windowFingerprints(clips, "content",
      windowSamples = 162, hopSamples = 81).localCheckpoint(true)
    val out = AudioHash.nearDupPairsShifted(windowed, "id",
        maxHamming = 3, maxOffset = 1, minMatchBp = 7000)
      .select("id_a", "id_b", "best_offset", "n_overlap", "n_match")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // pad of one hop: windows shift by exactly 1; the 6 interior
    // aligned windows are bit-identical
    assert(out.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 1L &&
      p._5 >= 5L))
    // (1,2) is also a one-hop shift of the same series
    assert(out.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1L))
    // the two-hop pad vs the original sits at offset 2 — out of reach
    assert(!out.exists(p => p._1 == 0L && p._2 == 2L))
    // parity with the reference scorer over the window arrays
    import org.apache.spark.sql.functions.col
    val sig = windowed.select(col("id"), col("wfps"))
      .as[(Long, Seq[Long])].collect().toMap
    val brute = (for {
      a <- sig.keys; b <- sig.keys if a < b
      (ha, hb) = (sig(a), sig(b))
      best = (-1 to 1).map { d =>
        val lo = math.max(0, -d)
        val hi = math.min(ha.length, hb.length - d)
        val ov = math.max(0, hi - lo)
        val m = (lo until hi).count(i =>
          java.lang.Long.bitCount(ha(i) ^ hb(i + d)) <= 3)
        (m, -math.abs(d), -d, ov, d)
      }.max
      if best._4 > 0 && best._1 * 10000 >= 7000 * best._4
    } yield (a, b, best._5.toLong, best._4.toLong, best._1.toLong))
      .toSet
    assert(out == brute)
  }

  test("banded near-dup pairs == brute force for hamming <= 3") {
    val clips = (0L until 30L).map { id =>
      val base = clip(id / 3) // triples share a base
      val s = base.clone()
      if (id % 3 == 1) s(0) += 1000
      if (id % 3 == 2) s(161) = -s(161) // a different single cell
      (id, Multimodal.encodeWav(s, 8000, 1))
    }
    val fp = AudioHash.fingerprints(
      clips.toDF("id", "content"), "content")
      .select(col("id"), col("afp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, ha) <- fp; (ib, hb) <- fp if ia < ib
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    val banded = AudioHash.nearDupPairs(
        AudioHash.fingerprints(clips.toDF("id", "content"), "content"),
        "id", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded == brute)
  }
}
