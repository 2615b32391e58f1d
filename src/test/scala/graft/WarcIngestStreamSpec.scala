package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Warc
import graft.streaming.WarcIngestStream

/** Streaming WARC ingest battery: stream == batch parity over the
  * same blobs, replay idempotence, quarantine accounting for corrupt
  * archive tails, and multi-batch accumulation. */
class WarcIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def page(i: Int): Array[Byte] =
    Warc.buildRecord("response", s"<urn:uuid:p$i>",
      s"http://site.example/p/$i", "2024-01-01T00:00:00Z",
      "application/http; msgtype=response",
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        s"<html><body><nav><a href='/'>Home</a></nav>" +
        s"<p>page $i carries enough words to clear the " +
        s"block keep rule easily.</p></body></html>").getBytes("UTF-8"))

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("stream == batch over the same archive blobs; replay is a " +
    "no-op; corrupt tails quarantine; batches accumulate") {
    implicit val sqlCtx = spark.sqlContext
    val pagesPath = tmp("warc-pages")       + "/t"
    val quarPath = tmp("warc-quarantine")   + "/t"
    val ms = MemoryStream[(String, Array[Byte])]
    val q = WarcIngestStream.run(
      ms.toDF().toDF("src", "content"), pagesPath, quarPath,
      tmp("warc-ckpt"))
    try {
      // batch 1: two clean multi-record blobs
      ms.addData(("a.warc", page(1) ++ page(2)),
        ("b.warc", page(3)))
      q.processAllAvailable()
      val p1 = WarcIngestStream.pages(spark, pagesPath)
      assert(p1.count() == 3)
      assert(WarcIngestStream.quarantine(spark, quarPath).count() == 0)
      // the extraction matches the batch chain exactly
      val batchSide = graft.operators.Markup.extractText(
        Warc.httpResponses(Warc.recordsFromBlobs(
            Seq(("a", page(1) ++ page(2)), ("b", page(3)))
              .toDF("src", "content"), "content"))
          .select(col("record_id"),
            col("body").cast("string").as("h")),
        "record_id", "h")
        .select(col("doc_id").as("record_id"), col("clean_text"))
        .as[(String, String)].collect().toMap
      val streamSide = p1.select("record_id", "clean_text")
        .as[(String, String)].collect().toMap
      assert(streamSide == batchSide)
      assert(streamSide.values.forall(_.contains("carries enough words")))
      assert(streamSide.values.forall(!_.contains("Home")),
        "nav boilerplate leaked into extracted text")

      // batch 2: one clean + one corrupt-tail blob
      ms.addData(("c.warc", page(4)),
        ("d.warc", page(5) ++ "garbage tail".getBytes("ISO-8859-1")))
      q.processAllAvailable()
      assert(WarcIngestStream.pages(spark, pagesPath).count() == 5)
      val quar = WarcIngestStream.quarantine(spark, quarPath).collect()
      assert(quar.length == 1 && quar.head.getString(0) == "d.warc")

      // replay: re-deliver batch-1 blobs — appends nothing
      ms.addData(("a.warc", page(1) ++ page(2)))
      q.processAllAvailable()
      assert(WarcIngestStream.pages(spark, pagesPath).count() == 5)
      assert(WarcIngestStream.quarantine(spark, quarPath).count() == 1)

      // batch 3: a PARSEABLE response with no WARC-Record-ID — no
      // pages key exists, so it must land in quarantine keyed
      // (src, rec_idx), never silently vanish in the pages join
      ms.addData(("e.warc", keylessPage ++ page(6)))
      q.processAllAvailable()
      assert(WarcIngestStream.pages(spark, pagesPath).count() == 6)
      val quar3 = WarcIngestStream.quarantine(spark, quarPath)
        .filter(col("src") === "e.warc").collect()
      assert(quar3.length == 1 && quar3.head.getLong(1) == 0L &&
        quar3.head.getString(2).contains("WARC-Record-ID"))
      // replay of the keyless blob is still a no-op
      ms.addData(("e.warc", keylessPage ++ page(6)))
      q.processAllAvailable()
      assert(WarcIngestStream.pages(spark, pagesPath).count() == 6)
      assert(WarcIngestStream.quarantine(spark, quarPath).count() == 2)
    } finally q.stop()
  }

  /** A grammatically valid response record MISSING WARC-Record-ID. */
  private def keylessPage: Array[Byte] = {
    val body = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html><body><p>keyless page with plenty of words to keep " +
      "the block rule satisfied here.</p></body></html>")
      .getBytes("UTF-8")
    ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      "WARC-Target-URI: http://site.example/keyless\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${body.length}\r\n" +
      "\r\n").getBytes("ISO-8859-1") ++ body ++
      "\r\n\r\n".getBytes("ISO-8859-1")
  }
}
