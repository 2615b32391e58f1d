package graft

import org.apache.spark.sql.functions._

import graft.operators.SuffixDedup

/** Distributed suffix-array substring dedup vs a brute-force suffix
  * sort: the operator's prefix-doubling order and adjacent-pair LCPs
  * must equal the naive enumerate-sort-compare answer exactly. */
class SuffixDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Brute force: all suffixes sorted by (tokens, doc, pos), adjacent
    * pairs, LCP capped, filter ≥ minLen. */
  private def brute(docs: Seq[(Long, String)], minLen: Int,
                    maxLcp: Int): Set[(Long, Int, Long, Int, Long)] = {
    import scala.math.Ordering.Implicits._
    val sufs = docs.flatMap { case (d, text) =>
      val ts = text.trim.split("\\s+").toSeq
      (1 to ts.length).map(p => (d, p, ts.drop(p - 1)))
    }
    val sorted = sufs.sortBy { case (d, p, s) => (s, d, p) }
    sorted.zip(sorted.tail).map { case ((da, pa, sa), (db, pb, sb)) =>
      val lcp = sa.take(maxLcp).zip(sb.take(maxLcp))
        .takeWhile { case (x, y) => x == y }.size.toLong
      (da, pa, db, pb, math.min(lcp, math.min(sa.length, sb.length)))
    }.filter(_._5 >= minLen).toSet
  }

  private def run(docs: Seq[(Long, String)], minLen: Int,
                  maxLcp: Int = 512): Set[(Long, Int, Long, Int, Long)] =
    SuffixDedup.duplicatedSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen, maxLcp)
      .as[(Long, Int, Long, Int, Long)].collect().toSet

  test("duplicatedSpans equals the brute-force suffix sort, including " +
    "unaligned cross-doc duplicates and within-doc repetition") {
    val shared = (1 to 30).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      1L -> s"alpha beta $shared gamma delta",
      2L -> s"x1 x2 x3 x4 x5 $shared y1",             // other alignment
      3L -> "rep rep rep rep rep rep rep rep",        // self-repetition
      4L -> "solo tokens that appear nowhere else at all",
      5L -> s"alpha beta $shared gamma delta")        // exact doc dup
    val minLen = 5
    val got = run(docs, minLen)
    val want = brute(docs, minLen, 512)
    assert(got == want, s"got ${got.toSeq.sorted}\nwant ${want.toSeq.sorted}")
    assert(got.nonEmpty)
    // the 30-token planted span is found at FULL length from doc 1 vs 2
    // (adjacent in suffix order at the span start) or via doc 5
    assert(got.exists(_._5 >= 30L))
    // within-doc repetition reported (doc 3 suffix pairs)
    assert(got.exists(t => t._1 == 3L && t._3 == 3L))
  }

  test("duplicatedSpans: lcp caps at maxLcp; empty and tiny inputs") {
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(1L -> long, 2L -> long)
    val capped = run(docs, minLen = 3, maxLcp = 5)
    assert(capped == brute(docs, 3, 5))
    assert(capped.exists(_._5 == 5L)) // the 40-token dup reports AT cap
    assert(capped.forall(_._5 <= 5L))
    // single position: no adjacent pair to report
    assert(run(Seq(1L -> "one"), minLen = 1).isEmpty)
    assert(run(Seq.empty[(Long, String)], minLen = 1).isEmpty)
    intercept[IllegalArgumentException] {
      SuffixDedup.duplicatedSpans(Seq(1L -> "a").toDF("doc_id", "text"),
        "doc_id", "text", minLen = 9, maxLcp = 5)
    }
  }

  test("exciseRanges: larger-copy candidates merge into per-doc cut " +
    "ranges; smallest copy survives; brute-merge parity") {
    val shared = (1 to 20).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      1L -> s"alpha beta $shared gamma",
      2L -> s"x1 x2 $shared y1",
      3L -> s"q1 $shared q2 $shared q3") // two copies inside one doc
    val spans = SuffixDedup.duplicatedSpans(
      docs.toDF("doc_id", "text"), "doc_id", "text", minLen = 5)
    val got = SuffixDedup.exciseRanges(spans)
      .as[(Long, Long, Long, Long)].collect().toSet
    // brute merge of the same candidate intervals
    val cand = spans.as[(Long, Int, Long, Int, Long)].collect().map {
      case (da, pa, db, pb, lcp) =>
        val aLarger = da > db || (da == db && pa > pb)
        val (d, p) = if (aLarger) (da, pa) else (db, pb)
        (d, p.toLong, p + lcp)
    }
    val want = cand.groupBy(_._1).flatMap { case (d, xs) =>
      val sorted = xs.map(x => (x._2, x._3)).sorted
      val merged = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long)] // (from, until, n)
      sorted.foreach { case (f, u) =>
        if (merged.nonEmpty && f <= merged.last._2) {
          val (mf, mu, n) = merged.remove(merged.size - 1)
          merged += ((mf, math.max(mu, u), n + 1))
        } else merged += ((f, u, 1L))
      }
      merged.map { case (f, u, n) => (d, f, u, n) }
    }.toSet
    assert(got == want, s"got ${got.toSeq.sorted}\nwant ${want.toSeq.sorted}")
    // doc 1 holds the lexicographically-smallest copy start? Not
    // necessarily — but SOME copy of the 20-token span must survive:
    // at least one of the three docs keeps an uncut span occurrence
    val cutDocs = got.map(_._1)
    assert(cutDocs.subsetOf(Set(1L, 2L, 3L)) && cutDocs.size <= 3)
    assert(got.nonEmpty)
  }

  test("duplicatedSpans: randomized parity with brute force") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val docs = (1L to 12L).map { d =>
      d -> (1 to (3 + rnd.nextInt(10)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    assert(run(docs, minLen = 2) == brute(docs, 2, 512))
    assert(run(docs, minLen = 1) == brute(docs, 1, 512))
  }

  test("exciseText applies the merged ranges: later copies cut, the " +
    "smallest copy survives, counts and cleaned text exact") {
    val shared = (1 to 20).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      1L -> s"alpha beta $shared gamma",
      2L -> s"x1 x2 $shared y1",
      3L -> "unique words only here")
    val got = SuffixDedup.exciseText(
        docs.toDF("doc_id", "text"), "doc_id", "text", minLen = 5)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1 holds the smaller (doc, pos) copy -> survives intact
    assert(got(1L) == ((1L, 23L, 0L, docs(0)._2)))
    // doc 2's copy is cut: 20 dup tokens removed, frame survives
    assert(got(2L)._3 == 20L && got(2L)._4 == "x1 x2 y1")
    // untouched doc passes through whitespace-normalized
    assert(got(3L) == ((3L, 4L, 0L, "unique words only here")))
    // every reported count is consistent with the cleaned text
    got.values.foreach { case (_, n, rem, ct) =>
      val kept = if (ct.isEmpty) 0 else ct.split(" ").length
      assert(kept == n - rem)
    }
  }

  /** Zero budgets disable the exact driver finish, forcing the full
    * distributed multi-doubling loop — the path a 100-TB duplication-
    * heavy corpus takes. */
  private def runDistributed(docs: Seq[(Long, String)], minLen: Int,
      maxLcp: Int = 512): Set[(Long, Int, Long, Int, Long)] =
    SuffixDedup.duplicatedSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen, maxLcp,
        driverFinishMaxPos = 0L, driverFinishMaxTok = 0L)
      .as[(Long, Int, Long, Int, Long)].collect().toSet

  test("distributed doubling path (driver finish disabled): brute-force" +
    " parity and agreement with the driver-finish path") {
    val shared = (1 to 30).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      1L -> s"alpha beta $shared gamma delta",
      2L -> s"x1 x2 x3 x4 x5 $shared y1",
      3L -> "rep rep rep rep rep rep rep rep",
      4L -> "solo tokens that appear nowhere else at all",
      5L -> s"alpha beta $shared gamma delta")
    val dist = runDistributed(docs, minLen = 5)
    assert(dist == brute(docs, 5, 512))
    assert(dist == run(docs, minLen = 5))
    // randomized: multi-doubling levels + tied-class refinement
    val rnd = new scala.util.Random(13)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val rdocs = (1L to 12L).map { d =>
      d -> (1 to (3 + rnd.nextInt(10)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    assert(runDistributed(rdocs, minLen = 1) == brute(rdocs, 1, 512))
  }

  test("r17 vocab paths agree: driver UTF-8 fold == distributed range " +
    "sort, including non-ASCII tokens and multi-partition adjacency") {
    def runVocabDistributed(docs: Seq[(Long, String)], minLen: Int)
        : Set[(Long, Int, Long, Int, Long)] =
      SuffixDedup.duplicatedSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", minLen, 512,
          // force the distributed vocab rank AND the distributed SA
          // tail (r17 ADVICE: with the default driverFinishMaxPos the
          // full-driver SA fired before the mapPartitions adjacency /
          // LCP stage ever ran, so this test's claimed multi-partition
          // boundary-stitching coverage was only incidental)
          driverFinishMaxPos = 0L, driverFinishMaxTok = 0L,
          vocabDriverMaxPos = 0L)
        .as[(Long, Int, Long, Int, Long)].collect().toSet
    // non-ASCII tokens: é (2-byte UTF-8), 中 (3-byte), 😀 (4-byte,
    // supplementary — where UTF-16 compareTo and UTF-8 byte order
    // could diverge); the two operator paths must order identically
    val uni = Seq(
      1L -> "é 中 😀 zz é 中 😀 zz aa",
      2L -> "bb é 中 😀 zz é 中",
      3L -> "中 中 中 😀 😀 é é zz")
    assert(runVocabDistributed(uni, 2) == run(uni, 2))
    assert(runVocabDistributed(uni, 1) == run(uni, 1))
    // ASCII randomized: both paths == brute (brute's String ordering
    // is safe on ASCII); enough positions that the range sort spreads
    // over several partitions, exercising the boundary stitching of
    // the r17 mapPartitions adjacency
    val rnd = new scala.util.Random(47)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val rdocs = (1L to 40L).map { d =>
      d -> (1 to (5 + rnd.nextInt(12)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val want = brute(rdocs, 1, 512)
    assert(run(rdocs, 1) == want)
    assert(runVocabDistributed(rdocs, 1) == want)
  }

  test("mid-loop overlay driver finish still exercised (r17): bounds " +
    "chosen so the full-driver path is skipped, one distributed level " +
    "runs, then the overlay finish fires at off > 1") {
    val run20 = (1 to 20).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      1L -> s"a1 a2 a3 $run20 a4",
      2L -> s"b1 b2 $run20 b3 b4 b5")
    // nPos = 51 > 30 → full-driver SA path skipped; level-0 tied = 40
    // (the 20 run tokens × 2 docs) > 30 → one multi-doubling level
    // (off 1 → 8); the survivors (suffixes sharing ≥ 8 tokens) are 26
    // ≤ 30 → driverFinishOverlay fires mid-loop
    val got = SuffixDedup.duplicatedSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen = 5, maxLcp = 512,
        driverFinishMaxPos = 30L, driverFinishMaxTok = 10000L)
      .as[(Long, Int, Long, Int, Long)].collect().toSet
    assert(got == brute(docs, 5, 512))
    assert(got.exists(_._5 >= 20L))
  }

  test("block pre-filter path (forced on): brute-force parity — " +
    "restricting the SA tail to dup-gram positions changes nothing") {
    def runFiltered(docs: Seq[(Long, String)], minLen: Int,
        maxLcp: Int = 512): Set[(Long, Int, Long, Int, Long)] =
      SuffixDedup.duplicatedSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", minLen, maxLcp,
          blockFilterMinPos = 0L) // force the filter at any size
        .as[(Long, Int, Long, Int, Long)].collect().toSet
    val shared = (1 to 30).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      1L -> s"alpha beta $shared gamma delta",
      2L -> s"x1 x2 x3 x4 x5 $shared y1",
      3L -> "rep rep rep rep rep rep rep rep",
      4L -> "solo tokens that appear nowhere else at all",
      5L -> s"alpha beta $shared gamma delta")
    assert(runFiltered(docs, minLen = 5) == brute(docs, 5, 512))
    // cap interaction + short-suffix exclusion edges
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val twins = Seq(1L -> long, 2L -> long)
    assert(runFiltered(twins, 3, maxLcp = 5) == brute(twins, 3, 5))
    // randomized, minLen = 1 (blocks = repeated single tokens) and 2
    val rnd = new scala.util.Random(31)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val rdocs = (1L to 12L).map { d =>
      d -> (1 to (3 + rnd.nextInt(10)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    assert(runFiltered(rdocs, 1) == brute(rdocs, 1, 512))
    assert(runFiltered(rdocs, 2) == brute(rdocs, 2, 512))
    // no duplication at all: the filtered SA tail is empty, not wrong
    val uniq = Seq(1L -> "p q r s t u v w", 2L -> "h i j k l m n o")
    assert(runFiltered(uniq, 2).isEmpty)
  }

  test("decontaminateExact: every >= minLen span shared with the bench " +
    "set is cut at any alignment; train-train duplicates survive") {
    // brute force: covered = union over (train pos p, bench pos q) of
    // [p, p + cappedLcp) where cappedLcp >= minLen
    def bruteDecon(docs: Seq[(Long, String)], bench: Seq[(Long, String)],
        minLen: Int, maxLcp: Int = 512)
        : Map[Long, (Long, Long, String)] =
      docs.map { case (d, text) =>
        val ts = text.trim.split("\\s+").toSeq
        val covered = scala.collection.mutable.Set.empty[Int]
        for ((_, btext) <- bench) {
          val bs = btext.trim.split("\\s+").toSeq
          for (p <- 1 to ts.length; q <- 1 to bs.length) {
            val l = math.min(maxLcp,
              ts.drop(p - 1).zip(bs.drop(q - 1))
                .takeWhile { case (x, y) => x == y }.size)
            if (l >= minLen) (p until p + l).foreach(covered += _)
          }
        }
        val kept = (1 to ts.length).filterNot(covered)
        d -> ((ts.length.toLong, covered.size.toLong,
          kept.map(p => ts(p - 1)).mkString(" ")))
      }.toMap
    def run(docs: Seq[(Long, String)], bench: Seq[(Long, String)],
        minLen: Int, maxLcp: Int = 512)
        : Map[Long, (Long, Long, String)] =
      SuffixDedup.decontaminateExact(docs.toDF("doc_id", "text"),
          bench.toDF("doc_id", "text"), "doc_id", "text", minLen, maxLcp)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val leak = (1 to 10).map(i => s"ev$i").mkString(" ")
    val docs = Seq(
      1L -> s"intro words $leak tail words here",   // unaligned leak
      2L -> s"$leak",                               // fully contaminated
      3L -> "clean document with no overlap at all honest",
      4L -> "twin twin2 twin3 twin4 twin5 twin6 twin7 twin8 twin9",
      5L -> "twin twin2 twin3 twin4 twin5 twin6 twin7 twin8 twin9")
    val bench = Seq(
      100L -> s"question prefix $leak answer suffix")
    val got = run(docs, bench, minLen = 4)
    assert(got == bruteDecon(docs, bench, 4))
    // the leak is excised wherever it sat; the frame survives
    assert(got(1L)._3 == "intro words tail words here")
    assert(got(2L) == ((10L, 10L, "")))
    // no benchmark overlap -> untouched; train-train duplicates (docs
    // 4/5 are identical) are NOT decontamination targets
    assert(got(3L)._2 == 0L && got(4L)._2 == 0L && got(5L)._2 == 0L)
    // bench docs never appear in the output
    assert(!got.contains(100L))
    // overlapping hits from different bench docs merge
    val bench2 = bench :+
      (101L, "other copy ev3 ev4 ev5 ev6 ev7 ev8 ev9 ev10 extra1 extra2")
    assert(run(docs, bench2, 4) == bruteDecon(docs, bench2, 4))
    // cap: a shared run longer than maxLcp is cut only to the cap per
    // anchor, but successive anchors tile the whole run — brute agrees
    assert(run(docs, bench, 4, maxLcp = 5) == bruteDecon(docs, bench, 4, 5))
    // randomized small-vocab (heavy accidental sharing)
    val rnd = new scala.util.Random(37)
    val vocab = Vector("aa", "bb", "cc", "dd")
    def mk(ids: Range) = ids.map { d =>
      d.toLong -> (1 to (3 + rnd.nextInt(10)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val rd = mk(1 to 8); val rb = mk(50 to 53)
    assert(run(rd, rb, 2) == bruteDecon(rd, rb, 2))
    assert(run(rd, rb, 3) == bruteDecon(rd, rb, 3))
  }

  test("contaminationReport: per (doc, bench-doc) merged spans, " +
    "totals and longest run match brute force") {
    def brute(docs: Seq[(Long, String)], bench: Seq[(Long, String)],
        minLen: Int, maxLcp: Int = 512)
        : Set[(Long, Long, Long, Long, Long)] = {
      val out = for {
        (d, text) <- docs
        (b, btext) <- bench
      } yield {
        val ts = text.trim.split("\\s+").toSeq
        val bs = btext.trim.split("\\s+").toSeq
        val ivs = for {
          p <- 1 to ts.length; q <- 1 to bs.length
          l = math.min(maxLcp, ts.drop(p - 1).zip(bs.drop(q - 1))
            .takeWhile { case (x, y) => x == y }.size)
          if l >= minLen
        } yield (p.toLong, (p + l).toLong)
        if (ivs.isEmpty) None
        else {
          // merge overlap-or-touch
          val sorted = ivs.sorted
          val merged = sorted.tail.foldLeft(List(sorted.head)) {
            case (acc @ ((f0, u0) :: rest), (f, u)) =>
              if (f > u0) (f, u) :: acc
              else (f0, math.max(u0, u)) :: rest
            case (Nil, iv) => List(iv)
          }
          Some((d, b, merged.size.toLong,
            merged.map(m => m._2 - m._1).sum,
            merged.map(m => m._2 - m._1).max))
        }
      }
      out.flatten.toSet
    }
    def run(docs: Seq[(Long, String)], bench: Seq[(Long, String)],
        minLen: Int, maxLcp: Int = 512)
        : Set[(Long, Long, Long, Long, Long)] =
      SuffixDedup.contaminationReport(docs.toDF("doc_id", "text"),
          bench.toDF("doc_id", "text"), "doc_id", "text", minLen, maxLcp)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    val leak = (1 to 10).map(i => s"ev$i").mkString(" ")
    val docs = Seq(
      1L -> s"intro words $leak mid other $leak tail", // two spans
      2L -> "clean document with no overlap at all honest",
      3L -> s"$leak")
    val bench = Seq(
      100L -> s"q prefix $leak a suffix",
      101L -> "ev3 ev4 ev5 ev6 ev7 other benchmark words")
    val got = run(docs, bench, minLen = 4)
    assert(got == brute(docs, bench, 4))
    // doc 1 x bench 100: both leak copies -> 2 merged spans of 10
    assert(got.contains((1L, 100L, 2L, 20L, 10L)))
    // clean doc never appears
    assert(!got.exists(_._1 == 2L))
    // cap interacts with merging identically on both sides
    assert(run(docs, bench, 4, maxLcp = 6) == brute(docs, bench, 4, 6))
    // randomized small-vocab
    val rnd = new scala.util.Random(41)
    val vocab = Vector("aa", "bb", "cc", "dd")
    def mk(ids: Range) = ids.map { d =>
      d.toLong -> (1 to (3 + rnd.nextInt(10)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val rd = mk(1 to 8); val rb = mk(50 to 53)
    assert(run(rd, rb, 2) == brute(rd, rb, 2))
  }

  test("probeSpans == full rebuild restricted to batch-endpoint pairs; " +
    "affectedDocs is exact; ranges restricted-parity; no-overlap " +
    "batches never pull corpus docs into the doubling scope") {
    def probe(corpus: Seq[(Long, String)], batch: Seq[(Long, String)],
        minLen: Int): Set[(Long, Int, Long, Int, Long)] =
      SuffixDedup.probeSpans(corpus.toDF("doc_id", "text"),
          batch.toDF("doc_id", "text"), "doc_id", "text", minLen)
        .as[(Long, Int, Long, Int, Long)].collect().toSet
    def fullRestricted(corpus: Seq[(Long, String)],
        batch: Seq[(Long, String)], minLen: Int)
        : Set[(Long, Int, Long, Int, Long)] = {
      val bIds = batch.map(_._1).toSet
      run(corpus ++ batch, minLen)
        .filter(t => bIds.contains(t._1) || bIds.contains(t._3))
    }
    val shared = (1 to 12).map(i => s"dup$i").mkString(" ")
    val corpus = Seq(
      1L -> s"alpha beta $shared gamma delta",
      2L -> "solo corpus words appearing nowhere else at all",
      3L -> s"pre $shared post",
      4L -> "rep rep rep rep rep rep")
    val batch = Seq(
      10L -> s"x1 x2 $shared y1",       // cross batch-corpus duplicate
      11L -> "rep rep rep rep",          // duplicates doc 4
      12L -> "fresh batch only content") // no duplication
    val got = probe(corpus, batch, minLen = 4)
    assert(got == fullRestricted(corpus, batch, 4),
      "probe != full rebuild restricted to batch endpoints")
    assert(got.nonEmpty)
    // affectedDocs: exactly the corpus docs sharing a 4-gram with the
    // batch — 1 and 3 (the planted span) and 4 (the rep run); never 2
    val aff = SuffixDedup.affectedDocs(corpus.toDF("doc_id", "text"),
        batch.toDF("doc_id", "text"), "doc_id", "text", minLen = 4)
      .as[Long].collect().toSet
    assert(aff == Set(1L, 3L, 4L), s"affected = $aff")
    // the excision contract downstream: batch cut ranges from the
    // probe equal the full rebuild's, restricted to batch docs
    val bIds = batch.map(_._1).toSet
    def ranges(spans: Set[(Long, Int, Long, Int, Long)]) =
      SuffixDedup.exciseRanges(
          spans.toSeq.toDF("doc_a", "pos_a", "doc_b", "pos_b", "lcp"))
        .as[(Long, Long, Long, Long)].collect().toSet
        .filter(r => bIds.contains(r._1))
    assert(ranges(got) ==
      ranges(run(corpus ++ batch, 4)).filter(r => bIds.contains(r._1)))
    // a batch with no shared grams probes an EMPTY corpus scope: the
    // doubling loop never sees a corpus doc (the cost contract)
    val loner = Seq(20L -> "totally novel tokens without any twin")
    assert(SuffixDedup.affectedDocs(corpus.toDF("doc_id", "text"),
        loner.toDF("doc_id", "text"), "doc_id", "text", minLen = 4)
      .count() == 0L)
    assert(probe(corpus, loner, minLen = 4).isEmpty)
    // randomized parity (small vocab => heavy accidental duplication)
    val rnd = new scala.util.Random(29)
    val vocab = Vector("aa", "bb", "cc", "dd")
    def mk(ids: Range) = ids.map { d =>
      d.toLong -> (1 to (3 + rnd.nextInt(10)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val rc = mk(1 to 10)
    val rb = mk(21 to 26)
    assert(probe(rc, rb, minLen = 2) == fullRestricted(rc, rb, 2))
    assert(probe(rc, rb, minLen = 3) == fullRestricted(rc, rb, 3))
  }
}
