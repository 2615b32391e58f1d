package graft

import org.apache.spark.sql.functions._

import graft.operators.ImageHash

/** Perceptual image hashing battery: PNG roundtrip exactness, hand
  * aHash/dHash values, luma folding, the one-pixel-perturbation bound
  * behind q279's planted twins, and banded-pairing parity against
  * brute-force hamming. */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private def grid(w: Int, h: Int)(f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(i => f(i % w, i / w))

  private def hashOf(px: Array[Int], w: Int, h: Int): (Long, Long) = {
    val a = ImageHash.aHash64(ImageHash.blockMeans(px, w, h, 8, 8))
    val d = ImageHash.dHash64(ImageHash.blockMeans(px, w, h, 9, 8))
    (a, d)
  }

  test("PNG encode -> decode roundtrip is bit-exact (hashing the " +
    "generator IS hashing the raster — the q278 oracle premise)") {
    val px = grid(18, 16)((x, y) => (x * 37 + y * 101) % 256)
    val bytes = ImageHash.encodeGrayPng(px, 18, 16)
    val Some((w, h, back)) = ImageHash.decodeLuma(bytes)
    assert((w, h) == (18, 16))
    assert(back.toSeq == px.toSeq)
  }

  test("hand values: uniform -> aHash 0; monotone gradients -> dHash " +
    "all-zeros / all-ones") {
    val flat = grid(16, 16)((_, _) => 77)
    assert(hashOf(flat, 16, 16) == ((0L, 0L)))
    val inc = grid(18, 16)((x, _) => 10 + 13 * x) // strictly increasing
    assert(hashOf(inc, 18, 16)._2 == 0L)
    val dec = grid(18, 16)((x, _) => 255 - 13 * x) // strictly decreasing
    assert(hashOf(dec, 18, 16)._2 == -1L) // all 64 bits set
    // left-dark/right-bright: exactly the right-half aHash blocks set
    val halves = grid(16, 16)((x, _) => if (x < 8) 0 else 200)
    val a = hashOf(halves, 16, 16)._1
    (0 until 64).foreach { i =>
      val expectBit = (i % 8) >= 4 // block cols 4-7 are the bright half
      assert(((a >> i) & 1L) == (if (expectBit) 1L else 0L),
        s"aHash bit $i")
    }
  }

  test("multi-band rasters fold to integer BT.601 luma") {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 16; y <- 0 until 16)
      img.setRGB(x, y, (10 << 16) | (200 << 8) | 60)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val Some((_, _, px)) = ImageHash.decodeLuma(bos.toByteArray)
    val expected = (299 * 10 + 587 * 200 + 114 * 60) / 1000
    assert(px.forall(_ == expected))
  }

  test("one-pixel perturbation moves dHash by at most 2 bits (the " +
    "planted-twin bound)") {
    for (seed <- 1 to 5) {
      val base = grid(24, 16)((x, y) =>
        ((x * 7919 + y * 104729 + seed * 31) % 256))
      val twin = base.clone(); twin(0) = (twin(0) + 100) % 256
      val d0 = hashOf(base, 24, 16)._2
      val d1 = hashOf(twin, 24, 16)._2
      assert(java.lang.Long.bitCount(d0 ^ d1) <= 2, s"seed $seed")
    }
  }

  test("banded nearDupPairs == brute-force hamming; undecodable and " +
    "too-small payloads report decode_ok=false") {
    val imgs = (0L until 40L).map { id =>
      val pb = id - id % 2
      val px = grid(16, 16)((x, y) =>
        ((x * 31 + y * 17 + pb * 97) % 256).toInt)
      if (id % 2 == 1) px(5) = (px(5) + 120) % 256
      (id, ImageHash.encodeGrayPng(px, 16, 16))
    } ++ Seq(
      (100L, Array[Byte](1, 2, 3)), // undecodable
      (101L, ImageHash.encodeGrayPng(Array.fill(8 * 4)(9), 8, 4))) // tiny
    val hashed = ImageHash.hashes(
      imgs.toDF("doc_id", "content"), "content").localCheckpoint(true)
    val bad = hashed.filter(!col("decode_ok"))
      .select("doc_id").as[Long].collect().toSet
    assert(bad == Set(100L, 101L))
    assert(hashed.filter(!col("decode_ok"))
      .filter(col("dhash").isNotNull).count() == 0)
    val sigs = hashed.filter(col("decode_ok"))
      .select("doc_id", "dhash").as[(Long, Long)].collect()
    val brute = (for {
      (ia, ha) <- sigs; (ib, hb) <- sigs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    val banded = ImageHash.nearDupPairs(hashed, "doc_id", "dhash", 3)
      .as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2, r._3.toLong)).toSet
    assert(banded == brute)
    assert(brute.nonEmpty, "no planted twin landed under hamming 3")
    // every even/odd twin is found
    (0L until 40L by 2).foreach { pb =>
      assert(brute.exists(p => p._1 == pb && p._2 == pb + 1),
        s"twin ($pb, ${pb + 1}) missed")
    }
  }
}
