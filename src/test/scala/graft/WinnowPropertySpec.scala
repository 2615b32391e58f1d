package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.sources.Sources

/** Property tests: winnowStats vs a direct Scala evaluation, and
  * resolveDated invariants over random listings. */
class WinnowPropertySpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.session

  private def md5PrefixLong(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }

  /** Direct reimplementation of winnowing (k-gram md5 hashes, window
    * min, distinct). */
  private def bruteWinnow(text: String, k: Int, w: Int): Set[Long] = {
    val nGrams = math.max(1, text.length - (k - 1))
    val grams = (1 to nGrams).map(i =>
      md5PrefixLong(text.substring(i - 1, math.min(i - 1 + k, text.length))))
    val nWins = math.max(1, nGrams - (w - 1))
    (1 to nWins).map(j => grams.slice(j - 1, j - 1 + w).min).toSet
  }

  test("winnowStats matches brute-force winnowing on random texts") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "abcde fgh"
    val texts = (0 until 60).map { i =>
      val len = rnd.nextInt(40) // includes 0..7 < k cases
      (i.toLong, (0 until len).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = texts.toDF("doc_id", "text")
    val got = TextAnalysis.winnowStats(df, "doc_id", "text", k = 8, w = 4)
      .select("doc_id", "n_fp", "min_fp", "max_fp")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    texts.foreach { case (id, text) =>
      val fps = bruteWinnow(text, 8, 4)
      assert(got(id) == ((fps.size.toLong, fps.min, fps.max)),
        s"mismatch for doc $id text='$text'")
    }
  }

  test("winnowing guarantee: shared substring of length >= w+k-1 shares a fingerprint") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 20 random pairs sharing a >= (4+8-1)=11-char substring
    val pairs = (0 until 20).map { i =>
      val shared = (0 until 11 + rnd.nextInt(8)).map(_ =>
        ('a' + rnd.nextInt(26)).toChar).mkString
      val pad = () => (0 until rnd.nextInt(15)).map(_ =>
        ('A' + rnd.nextInt(26)).toChar).mkString
      (i, pad() + shared + pad(), pad() + shared + pad())
    }
    pairs.foreach { case (i, a, b) =>
      assert(bruteWinnow(a, 8, 4).intersect(bruteWinnow(b, 8, 4)).nonEmpty,
        s"pair $i shares no fingerprint")
    }
  }

  test("resolveDated invariants over random listings") {
    val rnd = new scala.util.Random(13)
    (0 until 50).foreach { _ =>
      val dates = (0 until 1 + rnd.nextInt(10)).map { _ =>
        f"2024-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d"
      }.distinct
      val listing = dates.map(d => s"drop_$d.csv") ++
        Seq("noise.txt", "other_2024-01-01.json")
      val want = f"2024-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d"
      val got = Sources.resolveDated(listing, s"drop_$want.csv")
      val eligible = dates.filter(_ <= want)
      if (eligible.isEmpty) assert(got.isEmpty)
      else assert(got.contains(s"drop_${eligible.max}.csv"),
        s"want=$want dates=$dates got=$got")
    }
  }
}
