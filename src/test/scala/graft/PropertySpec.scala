package graft

import java.nio.file.Files
import java.time.LocalDate
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core._
import graft.operators.Interlace

/** Property-based semantics checks on randomized interval data:
  * the engine's windowed-delta pipeline must agree with brute-force
  * per-day evaluation for ANY interval layout. */
class PropertySpec extends SparkSpec {

  /** Drive a scalacheck generator over fixed seeds (the
    * scalatest-scalacheck bridge is not on the offline classpath). */
  private def forSeeds[T](gen: Gen[T], n: Int)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }
  import spark.implicits._

  private val start = LocalDate.parse("2020-01-01")
  private val endIncl = LocalDate.parse("2020-01-20")

  private case class Iv(key: Long, from: Int, until: Option[Int])

  private val ivGen: Gen[Iv] = for {
    key <- Gen.choose(0L, 4L)
    from <- Gen.choose(-5, 25)
    len <- Gen.choose(0, 15)
    open <- Gen.prob(0.15)
  } yield Iv(key, from, if (open) None else Some(from + len))

  test("keyJoinFeatures count equals brute-force per-day prevalence") {
    forSeeds(Gen.listOfN(30, ivGen), 12) { ivs =>
      {
        val df = ivs.map(iv => (
            iv.key,
            java.sql.Date.valueOf(start.plusDays(iv.from)),
            iv.until.map(u => java.sql.Date.valueOf(start.plusDays(u)))))
          .toDF("key_k", "valid_from", "valid_until")
        val sliced = Intervals.slice(df, start.toString, endIncl.toString)
        val out = KeyJoinFeatures(sliced, "n", "key_k", Aggregators.Count,
          Seq.empty, Seq.empty, start.toString, endIncl.toString)
          .orderBy("date").as[(java.sql.Date, Long)].collect()

        val expected = (0 to 19).map { d =>
          ivs.count(iv => iv.from <= d && iv.until.forall(_ > d)).toLong
        }
        assert(out.map(_._2).toSeq == expected)
        assert(out.map(_._1.toString).toSeq ==
          (0 to 19).map(d => start.plusDays(d).toString))
      }
    }
  }

  /** interlace (like the reference's SCDB input contract) expects each
    * source table to be SCD-valid: intervals disjoint per key. Clip the
    * random intervals into that shape. */
  private def disjointPerKey(ivs: Seq[Iv]): Seq[Iv] =
    ivs.groupBy(_.key).values.flatMap { g =>
      g.sortBy(_.from).foldLeft((Seq.empty[Iv], Int.MinValue)) {
        case ((acc, hi), iv) =>
          if (hi == Int.MaxValue) (acc, hi) // previous open-ended: drop rest
          else {
            val from = math.max(iv.from, hi)
            iv.until match {
              case None => (acc :+ Iv(iv.key, from, None), Int.MaxValue)
              case Some(u) if u > from =>
                (acc :+ Iv(iv.key, from, Some(u)), u)
              case _ => (acc, hi)
            }
          }
      }._1
    }.toSeq

  test("scd2 time travel recovers every snapshot version exactly") {
    val kvGen = Gen.listOfN(12,
      Gen.zip(Gen.choose(0L, 5L), Gen.choose(0, 3)))
      .map(_.distinctBy(_._1)) // one row per key per version
    forSeeds(Gen.listOfN(3, kvGen), 8) { versions =>
      val tss = Seq("t1", "t2", "t3")
      var table = Option.empty[org.apache.spark.sql.DataFrame]
      versions.zip(tss).foreach { case (v, ts) =>
        val df = v.toDF("id", "v")
        table = Some(Scd2.updateSnapshot(table, df, ts, Seq("id", "v"))
          .localCheckpoint(true))
      }
      versions.zip(tss).foreach { case (v, ts) =>
        val got = Scd2.sliceAt(table.get, ts)
          .select("id", "v").as[(Long, Int)].collect().toSet
        assert(got == v.toSet, s"snapshot at $ts not recovered")
      }
    }
  }

  test("interlace segments tile each key's covered timeline w/o overlap") {
    forSeeds(Gen.zip(Gen.listOfN(8, ivGen), Gen.listOfN(8, ivGen)), 8) {
      case (xs0, ys0) =>
        val xs = disjointPerKey(xs0); val ys = disjointPerKey(ys0)
        def mk(ivs: Seq[Iv], valName: String) =
          ivs.zipWithIndex.map { case (iv, i) => (
              iv.key, s"$valName$i",
              java.sql.Date.valueOf(start.plusDays(iv.from)),
              iv.until.map(u => java.sql.Date.valueOf(start.plusDays(u))))}
            .toDF("key_k", valName, "valid_from", "valid_until")
            // interlace assumes non-degenerate intervals
            .filter(col("valid_until").isNull ||
              col("valid_until") > col("valid_from"))
        val a = mk(xs, "a"); val b = mk(ys, "b")
        val segs = Interlace.interlace(Seq(a, b), Seq("key_k"))
          .select("key_k", "valid_from", "valid_until")
          .as[(Long, java.sql.Date, Option[java.sql.Date])]
          .collect()
        // no overlapping segments per key
        segs.groupBy(_._1).foreach { case (_, g) =>
          val sorted = g.sortBy(_._2.toString)
          sorted.sliding(2).foreach {
            case Array(s1, s2) =>
              assert(s1._3.isDefined && !s2._2.before(s1._3.get),
                s"overlap: $s1 vs $s2")
            case _ => ()
          }
        }
        // every day covered by any source interval appears in some segment
        val all = xs.map((_, true)) ++ ys.map((_, true))
        (0 to 30).foreach { d =>
          val day = java.sql.Date.valueOf(start.plusDays(d))
          all.map(_._1).groupBy(_.key).foreach { case (k, ivs2) =>
            val covered = ivs2.exists(iv => iv.from <= d &&
              iv.until.forall(_ > d) && iv.until.forall(_ > iv.from))
            if (covered) {
              val inSeg = segs.exists(s => s._1 == k &&
                !day.before(s._2) && s._3.forall(day.before))
              assert(inSeg, s"day $day key $k covered but not in a segment")
            }
          }
        }
    }
  }
}
