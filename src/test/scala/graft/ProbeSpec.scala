package graft

import org.apache.spark.sql.functions._

import graft.operators.{AudioHash, BandProbe, ImageHash, Multimodal,
  VideoHash}

/** BandProbe battery: the incremental probe's exactness contract —
  * cross-side slices of the full banded joins, for scalar signatures
  * (image dHash) and array signatures (video frame hashes / audio
  * window fingerprints), plus the standing-index path. */
class ProbeSpec extends SparkSpec {
  import spark.implicits._

  private val W = 18; private val H = 16
  private def frame(seed: Long, f: Int, perturb: Int = 0): Array[Byte] =
    Array.tabulate(W * H) { i =>
      val v = ((seed * 31 + f * 977 + i * 104729) % 256).toInt
      (if (i == 0) (v + perturb) % 256 else v).toByte
    }

  test("scalar probe == cross-side slice of nearDupPairs; " +
    "batch-internal pairs out of scope; probeIndexed == probePairs") {
    val imgs = (0L until 20L).map { id =>
      val px = Array.tabulate(256) { i =>
        (((id / 2) * 131 + i * 2654435761L) % 256 +
          (if (id % 2 == 1 && i == 0) 100 else 0)).toInt % 256
      }
      (id, ImageHash.encodeGrayPng(px, 16, 16))
    }.toDF("id", "content")
    val hashed = ImageHash.hashes(imgs, "content").localCheckpoint(true)
    val corpus = hashed.filter(col("id") % 2 === 0)
    val batch = hashed.filter(col("id") % 2 === 1)
    val probed = BandProbe.probePairs(corpus, batch, "id", "dhash",
        maxHamming = 3)
      .select("new_id", "corpus_id", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    // reference: full pairs restricted to (even, odd)
    val sig = hashed.select(col("id"), col("dhash"))
      .as[(Long, Long)].collect().toMap
    val expected = (for {
      c <- sig.keys if c % 2 == 0; n <- sig.keys if n % 2 == 1
      h = java.lang.Long.bitCount(sig(c) ^ sig(n)) if h <= 3
    } yield (n, c, h)).toSet
    assert(probed == expected)
    assert(expected.size >= 10) // every planted twin crosses sides
    // no batch-internal pair can appear (both ids odd)
    assert(probed.forall { case (n, c, _) => n % 2 == 1 && c % 2 == 0 })
    // the standing-index path is the same function
    val viaIndex = BandProbe.probeIndexed(
        BandProbe.bandIndex(corpus, "id", "dhash"), batch, "id",
        "dhash", maxHamming = 3)
      .select("new_id", "corpus_id", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(viaIndex == probed)
  }

  test("array probe == cross-side slice of nearDupPairsShifted " +
    "(video frame arrays, trimmed twins across sides)") {
    // even id = full 3-frame clip; odd id = the even's TRIMMED twin
    val vids = (0L until 12L).map { id =>
      val seed = id / 2
      val from = (id % 2).toInt // odd drops frame 0
      (id, Multimodal.encodeY4m(W, H,
        (from until 3).map(frame(seed, _,
          perturb = if (id % 2 == 1) 100 else 0))))
    }.toDF("id", "content")
    val hashed = VideoHash.frameHashes(vids, "content")
      .localCheckpoint(true)
    val corpus = hashed.filter(col("id") % 2 === 0)
    val batch = hashed.filter(col("id") % 2 === 1)
    val probed = BandProbe.probePairsShifted(corpus, batch, "id",
        "fhashes", maxHamming = 3, maxOffset = 1)
      .select("new_id", "corpus_id", "best_offset", "n_overlap",
        "n_match")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // reference: the full shifted pairing restricted to cross-side,
    // reoriented so offsets align corpus[i] with batch[i + d]
    val full = VideoHash.nearDupPairsShifted(hashed, "id",
        maxHamming = 3, maxOffset = 1)
      .select("id_a", "id_b", "best_offset", "n_overlap", "n_match")
      .as[(Long, Long, Long, Long, Long)].collect()
    val expected = full.collect {
      // the cross-side slice is every mixed-parity pair; when the
      // odd id is the SMALLER one the full pairing reports (odd a,
      // even b) with __ha on the odd side, so reorienting to
      // (new = odd, corpus = even) NEGATES the offset
      case (a, b, d, ov, m) if a % 2 == 0 && b % 2 == 1 =>
        (b, a, d, ov, m)
      case (a, b, d, ov, m) if a % 2 == 1 && b % 2 == 0 =>
        (a, b, -d, ov, m)
    }.toSet
    assert(probed == expected)
    assert(probed.size >= 6) // every trimmed twin found cross-side
    // every planted twin (corpus = new - 1) pairs at the trim offset
    assert((0L until 12L by 2).forall(c =>
      probed.exists(p => p._1 == c + 1 && p._2 == c && p._3 == -1L)))
  }

  test("audio window arrays ride the same probe (wfps as hashesCol)") {
    def pcm(seed: Long): Array[Int] = Array.tabulate(486) { i =>
      (((seed * 7919 + i * 104729) % 65536) - 32768).toInt
    }
    val clips = (0L until 8L).map { id =>
      val base = pcm(id / 2)
      val s = if (id % 2 == 1) Array.fill(81)(0) ++ base.dropRight(81)
              else base
      (id, Multimodal.encodeWav(s, 8000, 1))
    }.toDF("id", "content")
    val windowed = AudioHash.windowFingerprints(clips, "content",
      windowSamples = 162, hopSamples = 81).localCheckpoint(true)
    val probed = BandProbe.probePairsShifted(
        windowed.filter(col("id") % 2 === 0),
        windowed.filter(col("id") % 2 === 1),
        "id", "wfps", maxHamming = 3, maxOffset = 1)
      .select("new_id", "corpus_id", "best_offset")
      .as[(Long, Long, Long)].collect().toSet
    // every padded twin lands cross-side at offset +1
    assert((0L until 8L by 2).forall(c =>
      probed.contains((c + 1, c, 1L))))
  }
}
