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
