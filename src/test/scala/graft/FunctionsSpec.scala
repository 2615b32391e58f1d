package graft

import org.apache.spark.sql.functions._
import graft.functions.Ages
import graft.operators.TextAnalysis

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("ageLabels zero-pads and sorts") {
    assert(Ages.ageLabels(Seq(5, 12)) == Seq("00-04", "05-11", "12+"))
    assert(Ages.ageLabels(Seq(5, 12, 100)) ==
      Seq("000-004", "005-011", "012-099", "100+"))
    assert(Ages.ageLabels(Seq.empty) == Seq("0+"))
  }

  test("ageOnDate exact calendar age incl. birthday edges") {
    val df = Seq(
      ("2000-06-15", "2024-06-14", 23), // day before birthday
      ("2000-06-15", "2024-06-15", 24), // on birthday
      ("2000-02-29", "2023-02-28", 22), // leap birth, non-leap year
      ("2000-02-29", "2023-03-01", 23), // increments Mar 1
      ("2000-02-29", "2024-02-29", 24)
    ).toDF("b", "r", "expected")
    val bad = df.filter(
      Ages.ageOnDate(to_date(col("b")), to_date(col("r"))) =!= col("expected"))
    assert(bad.count() == 0)
  }

  test("cutAges buckets against labels") {
    val df = Seq(0, 4, 5, 11, 12, 85).toDF("age")
      .select(Ages.cutAges(col("age"), Seq(5, 12, 80)).as("g"))
    assert(df.as[String].collect().toSeq ==
      Seq("00-04", "00-04", "05-11", "05-11", "12-79", "80+"))
  }

  test("addYears clamps leap day") {
    val out = Seq("2000-02-29").toDF("d")
      .select(Ages.addYears(to_date(col("d")), lit(1)).cast("string"))
      .as[String].head()
    assert(out == "2001-02-28")
  }

  test("token counts and quality score are sane") {
    val df = Seq("the cat, sat!  on a mat").toDF("text")
    val r = df.select(
      TextAnalysis.wsTokenCount(col("text")).as("ws"),
      TextAnalysis.bpeTokenCount(col("text")).as("bpe"),
      TextAnalysis.punctCount(col("text")).as("p"),
      TextAnalysis.stopwordRatio(col("text")).as("sr"),
      TextAnalysis.qualityScore(col("text")).as("q"))
      .as[(Int, Int, Int, Double, Double)].head()
    assert(r._1 == 6)           // the cat, sat! on a mat
    assert(r._2 == 8)           // 6 words + ',' + '!'
    assert(r._3 == 2)
    assert(math.abs(r._4 - 3.0 / 6) < 1e-12) // the, on, a
    assert(r._5 > 0 && r._5 <= 1)
  }

  test("langId markers and CJK") {
    val df = Seq(
      ("the cat and the dog of a house", "en"),
      ("der hund und die katze", "de"),
      ("le chat et les chiens est", "fr"),
      ("el gato los perros las casas", "es"),
      ("你好世界", "zh"),
      ("xyzzy qwerty", "und")
    ).toDF("text", "expected")
    val bad = df.filter(TextAnalysis.langId(col("text")) =!= col("expected"))
    assert(bad.count() == 0)
  }

  test("fingerprint deterministic and discriminative") {
    val df = Seq("abcdefghij-klmnop-qrstuvwxyz", "abcdefghij-klmnop-qrstuvwxyz",
      "completely different text here").toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("f"))
    val rows = df.select("f.min_hash", "f.distinct_grams")
      .as[(Long, Int)].collect()
    assert(rows(0) == rows(1))
    assert(rows(0) != rows(2))
  }

  test("domain extraction and per-domain stats") {
    val df = Seq(
      (1L, "see https://Example.COM/path and http://sub.site.org?q=1"),
      (2L, "dup mention https://example.com/other no scheme www.skip.me"),
      (3L, "no urls at all")).toDF("doc_id", "text")
    val doms = df.select(col("doc_id"),
      TextAnalysis.domains(col("text")).as("d"))
      .as[(Long, Seq[String])].collect().toMap
    assert(doms(1L) == Seq("example.com", "sub.site.org"))
    assert(doms(2L) == Seq("example.com"))
    assert(doms(3L) == Seq.empty)
    val stats = TextAnalysis.domainStats(df, "doc_id", "text")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(stats == Map(
      "example.com" -> ((2L, 2L)), "sub.site.org" -> ((1L, 1L))))
  }

  test("bigramNovelty matches brute force; short docs get zeros") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a b c a b"),         // bigrams: a b, b c, c a, a b
      (2L, "a b x y"),           // "a b" and "x y" shared; "b x" novel
      (3L, "one"),               // no bigrams
      (4L, "x y z"))             // shares "x y"; "y z" novel
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .bigramNovelty(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    // brute force: df("a b")=2, df("x y")=2, others 1
    assert(got(1L) == ((4L, 3L, 2L, 2L * 10000 / 3)))
    assert(got(2L) == ((3L, 3L, 1L, 10000 / 3)))
    assert(got(3L) == ((0L, 0L, 0L, 0L)))
    assert(got(4L) == ((2L, 2L, 1L, 5000L)))
  }

  test("splitByGroup: zero leakage, append-stable, engine-portable") {
    import org.apache.spark.sql.functions.col
    val rows = (1 to 300).map(i => (i.toLong, (i % 40).toLong))
    val df = rows.toDF("row_id", "grp")
    val out = graft.operators.Splits.splitByGroup(df, "grp",
      Seq("train" -> 80, "val" -> 10, "test" -> 10), seed = "s1")
      .select("grp", "split").as[(Long, String)].collect()
    // leakage: every group maps to exactly one split
    val byGrp = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byGrp.values.forall(_.size == 1))
    // append stability: adding rows never moves an existing group
    val more = (301 to 400).map(i => (i.toLong, (i % 40).toLong))
    val out2 = graft.operators.Splits.splitByGroup(
      (rows ++ more).toDF("row_id", "grp"), "grp",
      Seq("train" -> 80, "val" -> 10, "test" -> 10), seed = "s1")
      .select("grp", "split").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    byGrp.foreach { case (g, s) => assert(out2(g) == s) }
    // the seed changes assignments (independent draws)
    val reseeded = graft.operators.Splits.splitByGroup(df, "grp",
      Seq("train" -> 80, "val" -> 10, "test" -> 10), seed = "s2")
      .select("grp", "split").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byGrp.exists { case (g, s) => reseeded(g) != s })
  }

  test("curriculumSchedule: per-phase budget exactness, pure-mix endpoints") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("a", 100L), ("b", 300L), ("c", 600L)).toDF("g", "n")
    val start = Map("a" -> 8L, "b" -> 1L, "c" -> 1L)
    val end = Map("a" -> 1L, "b" -> 1L, "c" -> 8L)
    val budgets = Seq(999L, 1000L, 1001L)
    val out = graft.operators.Splits.curriculumSchedule(
        df, "g", "n", budgets, start, end)
      .select("phase", "g", "target_tokens")
      .as[(Int, String, Long)].collect()
    // largest remainder: every phase's targets sum EXACTLY to its budget
    val byPhase = out.groupBy(_._1)
    budgets.zipWithIndex.foreach { case (b, p) =>
      assert(byPhase(p).map(_._3).sum == b, s"phase $p misses its budget")
    }
    // endpoint phases equal the pure start/end mixes (lerp scale factors
    // cancel in the ratios)
    def pure(b: Long, w: Map[String, Long]) =
      graft.operators.Splits.mixtureAllocate(df, "g", "n", b, w)
        .select("g", "target_tokens").as[(String, Long)].collect().toMap
    assert(byPhase(0).map(t => t._2 -> t._3).toMap == pure(999L, start))
    assert(byPhase(2).map(t => t._2 -> t._3).toMap == pure(1001L, end))
  }

  test("dedupSafeSplit: near-dup clusters never straddle splits") {
    import org.apache.spark.sql.functions.col
    val docs = (1 to 200).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "t")
    // planted clusters: {1..5}, {10,11}, everything else singleton
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (10L, 10L), (11L, 10L)).toDF("doc_id", "cluster_id")
    val out = graft.operators.Splits.dedupSafeSplit(docs, "doc_id",
      clusters, Seq("train" -> 80, "val" -> 10, "test" -> 10), seed = "z")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out.size == 200)
    assert(Set(1L, 2L, 3L, 4L, 5L).map(out).size == 1,
      "cluster 1 straddles splits")
    assert(Set(10L, 11L).map(out).size == 1, "cluster 10 straddles splits")
    // singletons are independent draws, so all three splits appear
    assert(out.filterNot(kv => kv._1 <= 5 || kv._1 == 10 || kv._1 == 11)
      .values.toSet.size == 3)
    // a NEW member joining a known cluster inherits the cluster's split
    val grown = clusters.union(Seq((42L, 1L)).toDF("doc_id", "cluster_id"))
    val out2 = graft.operators.Splits.dedupSafeSplit(docs, "doc_id",
      grown, Seq("train" -> 80, "val" -> 10, "test" -> 10), seed = "z")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out2(42L) == out(1L))
    // and no pre-existing assignment moved except 42's
    assert(out.forall { case (id, s) => id == 42L || out2(id) == s })
  }

  test("encodingQuality: planted artifacts are counted, clean text is clean") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "plain ascii text"),
      (2L, "lossy � decode �"),            // 2 replacement chars
      (3L, "ctrl\u0001chars\u0007here"),             // 2 C0 controls
      (4L, "mojibake Ã©tÃ© and â€™"), // Ã© ×2, â€
      (5L, "légitime français pâte"), // real accents: NOT mojibake
      (6L, ""))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .encodingQuality(docs, "doc_id", "text")
      .select("doc_id", "n_chars", "n_bytes", "bytes_per_char_bp",
        "n_replacement", "n_ctrl", "n_mojibake", "clean")
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].collect()
      .map(t => t._1 -> t).toMap
    assert(out(1L)._8 && out(1L)._5 == 0 && out(1L)._6 == 0 && out(1L)._7 == 0)
    assert(out(2L)._5 == 2L && !out(2L)._8)
    assert(out(3L)._6 == 2L && !out(3L)._8)
    assert(out(4L)._7 == 3L && !out(4L)._8)
    assert(out(5L)._8, "legitimate accented French flagged as mojibake")
    assert(out(6L)._2 == 0L && out(6L)._4 == 0L && out(6L)._8)
    // bytes/char profile: ASCII is exactly 10000 bp; accents push it up
    assert(out(1L)._4 == 10000L)
    assert(out(5L)._4 > 10000L)
  }

  test("mixtureAllocate: hand-checked largest-remainder apportionment") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("a", 100L), ("a", 50L), ("b", 500L), ("c", 10L))
      .toDF("g", "toks")
    val out = graft.operators.Splits.mixtureAllocate(df, "g", "toks",
      budget = 1000L, weights = Map("a" -> 1L, "b" -> 2L, "c" -> 4L))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    // ΣW=7: t=(142 r6, 285 r5, 571 r3), Σt=998 → +1 to a and b
    assert(out("a") == ((150L, 143L, 143L, 0L)))
    assert(out("b") == ((500L, 286L, 286L, 0L)))
    assert(out("c") == ((10L, 571L, 10L, 561L)))
    // the invariant the plan exists for: targets exhaust the budget
    assert(out.values.map(_._2).sum == 1000L)
  }

  test("mixtureAllocate: only weighted groups present in the data") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("a", 10L), ("d", 99L)).toDF("g", "toks")
    val out = graft.operators.Splits.mixtureAllocate(df, "g", "toks",
      budget = 70L, weights = Map("a" -> 1L, "z" -> 6L))
      .as[(String, Long, Long, Long, Long)].collect()
    // "d" is unweighted, "z" is absent → one row. z's 60-token share
    // is NOT re-assigned; the leftover bonus is capped at one token
    // per present group (row_number), so a = 10 + 1 against avail 10
    assert(out.toSeq == Seq(("a", 10L, 11L, 10L, 1L)))
  }

  test("redactPii: staged typed placeholders, no double counting") {
    val df = Seq(
      (1L, "mail a.b+c@x.example.org then ssn 123-45-6789 done"),
      (2L, "host 10.0.0.1 and 192.168.255.3 call +1 (555) 010-4242 ok"),
      (3L, "two mails p@q.example.com q@p.example.org"),
      (4L, "nothing sensitive here"),
      (5L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, String, Boolean)]
      .collect().sortBy(_._1)
    assert(out(0) == ((1L, 1L, 1L, 0L, 0L,
      "mail <EMAIL> then ssn <SSN> done", true)))
    // the SSN-shaped digits were consumed by the SSN stage — the
    // phone stage must NOT re-count them; the true phone still hits
    assert(out(1) == ((2L, 0L, 0L, 2L, 1L,
      "host <IP> and <IP> call <PHONE> ok", true)))
    assert(out(2)._2 == 2L &&
      out(2)._6 == "two mails <EMAIL> <EMAIL>")
    assert(out(3) == ((4L, 0L, 0L, 0L, 0L, "nothing sensitive here",
      false)))
    assert(out(4) == ((5L, 0L, 0L, 0L, 0L, "", false)))
  }

  test("c4Rules: line and page rules on a crafted page") {
    val page =
      "Heading with no punctuation\n" +
        "This line has at least five words.\n" +
        "Tiny line.\n" +
        "Another sentence with plenty of words to keep!\n" +
        "   \n" +
        "does this rhetorical line count as a sentence?"
    val bad = "lorem ipsum filler. But code { x } too.\n" +
      "A good long line that would otherwise survive fine."
    val out = TextAnalysis.c4Rules(
      Seq((1L, page), (2L, bad), (3L, "")).toDF("doc_id", "text"),
      "doc_id", "text")
      .as[(Long, Long, Long, Boolean, Boolean, Boolean, Boolean,
        String, Boolean)].collect().sortBy(_._1)
    // page 1: 5 non-blank lines; heading (no terminal punct) and
    // "Tiny line." (<5 words) are dropped, 3 survive → keep
    assert(out(0)._2 == 5L && out(0)._3 == 3L)
    assert(out(0)._8 ==
      "This line has at least five words.\n" +
        "Another sentence with plenty of words to keep!\n" +
        "does this rhetorical line count as a sentence?")
    assert(out(0)._9)
    // page 2: lorem + brace flags veto the page outright
    assert(out(1)._4 && out(1)._5 && !out(1)._9)
    // empty page: zero lines, empty clean text, not kept
    assert(out(2) == ((3L, 0L, 0L, false, false, false, false, "",
      false)))
  }

  test("nfcProfile: decomposed collapses, canonical passes through") {
    val decomposed = "expose\u0301 cafe\u0301" // e + U+0301
    val precomposed = "caf\u00e9 d\u00e9j\u00e0"
    val out = TextAnalysis.nfcProfile(
      Seq((1L, decomposed), (2L, precomposed), (3L, "plain ascii"))
        .toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Boolean, String)].collect().sortBy(_._1)
    // two combining marks fold away: 13 chars → 11, not NFC before
    assert(out(0) == ((1L, 13L, 11L, false, "expos\u00e9 caf\u00e9")))
    // already canonical: byte-identical pass-through
    assert(out(1) == ((2L, 9L, 9L, true, precomposed)))
    assert(out(2) == ((3L, 11L, 11L, true, "plain ascii")))
    // idempotence: normalizing the normalized text is a no-op
    val again = TextAnalysis.nfcProfile(
      Seq((1L, out(0)._5)).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Boolean, String)].collect()
    assert(again(0)._4 && again(0)._5 == out(0)._5)
  }

  test("crossSplitLeakage: exact shared-gram and leaked-doc counts") {
    // 3-grams: doc 1 (train) {a b c, b c d}; doc 2 (train) {x y z};
    // doc 3 (eval) {a b c}; doc 4 (eval) {p q r}; doc 5 (eval)
    // {b c d, c d e}. shared(train,eval) = {a b c, b c d} = 2;
    // leaked eval docs = {3, 5}; leaked train docs = {1} (both its
    // grams are in eval, counted once).
    val docs = Seq(
      (1L, "a b c d", "train"),
      (2L, "x y z", "train"),
      (3L, "a b c", "eval"),
      (4L, "p q r", "eval"),
      (5L, "b c d e", "eval")
    ).toDF("doc_id", "text", "split")
    val out = TextAnalysis.crossSplitLeakage(docs, "doc_id", "text", "split")
      .select("split_a", "split_b", "shared_shingles", "leaked_docs")
      .as[(String, String, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    assert(out == Map(
      ("train", "eval") -> ((2L, 2L)),
      ("eval", "train") -> ((2L, 1L))))
  }
}