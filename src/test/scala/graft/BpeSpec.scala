package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainDict learns the classic merge sequence deterministically") {
    // Sennrich et al. running example: {low:5, lower:2, newest:6,
    // widest:3}. Pair counts round 1: (e,s)=9, (s,t)=9, (t,</w>)=9
    // tie → lexicographically smallest pair wins.
    val dict = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val model = Bpe.trainDict(dict, numMerges = 5)
    val merges = model.merges.map(m => (m.left, m.right, m.count))
    assert(merges == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
    // segmentation byproduct reflects all applied merges
    assert(model.segments("newest") == Seq("n", "e", "w", "est</w>"))
    assert(model.segments("low") == Seq("low", "</w>"))
  }

  test("training stops when no pair repeats; ranks are contiguous") {
    val model = Bpe.trainDict(Seq("ab" -> 1L, "cd" -> 1L), 10)
    assert(model.merges.isEmpty) // every pair count is 1
    val m2 = Bpe.trainDict(Seq("aaab" -> 3L), 100)
    assert(m2.merges.map(_.rank) == m2.merges.indices.toSeq)
  }

  test("distributed train equals trainDict on the corpus word counts") {
    val docs = Seq(
      (1L, "low low low low low lower lower"),
      (2L, "newest newest newest widest widest"),
      (3L, "newest newest newest widest"))
      .toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", numMerges = 5)
    val want = Bpe.trainDict(Seq("low" -> 5L, "lower" -> 2L,
      "newest" -> 6L, "widest" -> 3L), 5)
    assert(got.merges == want.merges)
    assert(got.segments == want.segments)
  }

  test("tokenize round-trips text and counts OOV words") {
    val train = Seq((1L, "hello hello hello world world hello world"))
      .toDF("doc_id", "text")
    val model = Bpe.train(train, "text", numMerges = 20)
    val docs = Seq((10L, "hello world"), (11L, "hello unseen"))
      .toDF("doc_id", "text")
    val out = Bpe.tokenize(docs, "doc_id", "text", model)
      .as[(Long, Seq[String], Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // round-trip: concatenated tokens == words with </w> separators
    assert(out(10L)._1.mkString == "hello</w>world</w>")
    assert(out(11L)._1.mkString == "hello</w>unseen</w>")
    // fully-merged training words collapse to one token each
    assert(out(10L)._1 == Seq("hello</w>", "world</w>"))
    assert(out(10L)._3 == 0L)
    // OOV word falls back to characters + the marker
    assert(out(11L)._1.drop(1) ==
      Seq("u", "n", "s", "e", "e", "n", "</w>"))
    assert(out(11L)._3 == 1L)
    assert(out(11L)._2 == out(11L)._1.length.toLong)
  }

  test("fertility: pieces/word, bytes/piece, OOV share per language") {
    val train = Seq((1L, "hello hello hello world world hello world"))
      .toDF("doc_id", "text")
    val model = Bpe.train(train, "text", numMerges = 20)
    // en: both words fully merged -> 1 piece/word; xx: "ab" is OOV ->
    // 3 char pieces + marker
    val docs = Seq((10L, "hello world", "en"), (11L, "ab", "xx"))
      .toDF("doc_id", "text", "lang")
    val out = Bpe.fertility(docs, "doc_id", "text", "lang", model)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // en: 2 words, 2 tokens ("hello</w>", "world</w>"), 11 bytes
    assert(out("en")._3 === 2L && out("en")._4 === 2L)
    assert(out("en")._7 === 10000L)            // fertility_bp
    assert(out("en")._8 === (10000L * 11) / 2) // bytes_per_token_bp
    assert(out("en")._9 === 0L)
    // xx: 1 word -> tokens a, b, </w>; 1 OOV word of 2 bytes
    assert(out("xx")._3 === 1L && out("xx")._4 === 3L)
    assert(out("xx")._7 === 30000L)
    assert(out("xx")._8 === (10000L * 2) / 3)
    assert(out("xx")._9 === 10000L)
  }

  test("vocab prune keeps the most frequent words only") {
    val docs = Seq((1L, "aa aa aa bb bb cc")).toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 10,
      maxVocabWords = 2)
    assert(model.segments.keySet == Set("aa", "bb"))
  }

  test("vocab: a fused symbol colliding with the alphabet keeps one id") {
    // markup-heavy corpora can LEARN the literal end-of-word string:
    // merges <+/ , </+w , </w+> fuse to "</w>", which the alphabet
    // already contains as Eow — the id map must stay duplicate-free
    val model = Bpe.BpeModel(
      merges = Seq(Bpe.Merge(0, "<", "/", 9L),
        Bpe.Merge(1, "</", "w", 8L), Bpe.Merge(2, "</w", ">", 7L)),
      segments = Map("</w>" -> Seq("</w>", Bpe.Eow)))
    val v = Bpe.vocab(model)
    assert(v.map(_._1).distinct.size == v.size, "duplicate vocab symbol")
    assert(v.map(_._2) == v.indices, "ids not dense")
    // the map literal must build (no DUPLICATE_MAP_KEY) and encode
    val enc = Bpe.encodeIds(Seq((1L, "</w>")).toDF("doc_id", "text"),
      "doc_id", "text", model)
      .as[(Long, Seq[Int], Long, Long, Long)].head()
    assert(enc._5 == 0L, "in-vocab symbols must not map to UNK")
  }

  test("encodeIds: ids decode back to tokens; unseen chars become UNK") {
    val train = Seq((1L, "low lower lowest low low"),
      (2L, "new newer newest new")).toDF("doc_id", "text")
    val model = Bpe.train(train, "text", numMerges = 8)
    val v = Bpe.vocab(model)
    // ids are dense, unique, and alphabet-first
    assert(v.map(_._2) == v.indices)
    assert(v.map(_._1).distinct.size == v.size)
    val byId = v.map(_.swap).toMap
    val enc = Bpe.encodeIds(
      Seq((10L, "low newer"), (11L, "qqq")).toDF("doc_id", "text"),
      "doc_id", "text", model)
      .as[(Long, Seq[Int], Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    // known words: every id decodes to the tokenize() token stream
    val toks = Bpe.tokenize(
      Seq((10L, "low newer")).toDF("doc_id", "text"),
      "doc_id", "text", model)
      .select("tokens").as[Seq[String]].head()
    assert(enc(10L)._2.map(byId) == toks)
    assert(enc(10L)._5 == 0L)
    // "qqq" is OOV and its chars are outside the training alphabet:
    // chars map to UNK but the end-of-word symbol is in-vocab
    val (_, ids11, n11, oov11, unk11) = enc(11L)
    assert(oov11 == 1L && n11 == 4L)
    assert(unk11 == 3L && ids11.count(_ == Bpe.UnkId) == 3)
    assert(byId(ids11.last) == Bpe.Eow)
  }
}
