package graft

import org.apache.spark.sql.functions._
import graft.operators.Chunking

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunking windows with overlap, partial tail, short docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b")                                     // shorter than window
    ).toDF("doc_id", "text")
    val out = Chunking.chunk(docs, "doc_id", "text", window = 4, stride = 3)
      .select("doc_id", "chunk_idx", "chunk_text", "n_tokens")
      .as[(Long, Int, String, Int)].collect().toSet
    assert(out == Set(
      (1L, 0, "t1 t2 t3 t4", 4),
      (1L, 1, "t4 t5 t6 t7", 4),
      (1L, 2, "t7 t8 t9 t10", 4),
      (2L, 0, "a b", 2)))
  }

  test("scrub redacts urls, emails, digit runs") {
    val out = Seq("see https://x.io/a?b=1 mail bob@x.com id 123456 ok 12")
      .toDF("text").select(Chunking.scrub(col("text"))).as[String].head()
    assert(out == "see <URL> mail <EMAIL> id <NUM> ok 12")
  }

  test("top vocab ranks by count then term") {
    val out = Chunking.topVocab(
      Seq("b a a c b a").toDF("text"), "text", k = 2)
      .as[(Int, String, Long)].collect().toSeq
    assert(out == Seq((1, "a", 3L), (2, "b", 2L)))
  }
}
