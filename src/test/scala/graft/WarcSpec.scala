package graft

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.sources.Warc

/** WARC ingest battery: record roundtrip, multi-record streams,
  * per-record gzip members (.warc.gz), header folding, HTTP split,
  * and the quarantine posture for truncated / corrupt / non-WARC
  * bytes — including the file-level [[Warc.records]] path. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(i: Int, body: String = null): Array[Byte] =
    Warc.buildRecord("response", s"<urn:uuid:$i>",
      s"http://example.com/p/$i", "2024-01-01T00:00:00Z",
      "application/http; msgtype=response",
      Option(body).getOrElse(
        s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
          s"<html><body><p>page $i body text</p></body></html>")
        .getBytes("UTF-8"))

  private def gzMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  test("single-record roundtrip preserves headers and payload bytes") {
    val payload = Array.tabulate[Byte](257)(i => (i % 251).toByte)
    val r = Warc.parseStream(new java.io.ByteArrayInputStream(
      Warc.buildRecord("resource", "<urn:uuid:x>", "http://u/1",
        "2024-02-03T04:05:06Z", "application/octet-stream", payload)))
      .toSeq
    assert(r.length == 1)
    assert(r.head.error == null)
    assert(r.head.warcType == "resource")
    assert(r.head.recordId == "<urn:uuid:x>")
    assert(r.head.targetUri == "http://u/1")
    assert(r.head.warcDate == "2024-02-03T04:05:06Z")
    assert(r.head.contentLength == 257L)
    assert(r.head.payload.toSeq == payload.toSeq)
  }

  test("multi-record stream parses all records in order") {
    val blob = (0 until 5).map(rec(_)).reduce(_ ++ _)
    val rs = Warc.parseStream(
      new java.io.ByteArrayInputStream(blob)).toSeq
    assert(rs.length == 5)
    assert(rs.forall(_.error == null))
    assert(rs.map(_.recIdx) == (0L until 5L))
    assert(rs.map(_.targetUri) ==
      (0 until 5).map(i => s"http://example.com/p/$i"))
  }

  test("multi-member gzip (.warc.gz convention: one member per " +
    "record) parses as one stream") {
    val gz = (0 until 4).map(i => gzMember(rec(i))).reduce(_ ++ _)
    val dir = java.nio.file.Files.createTempDirectory("warc").toFile
    java.nio.file.Files.write(
      new java.io.File(dir, "part-0.warc.gz").toPath, gz)
    // a plain (uncompressed) sibling in the same directory
    java.nio.file.Files.write(
      new java.io.File(dir, "part-1.warc").toPath,
      (4 until 6).map(rec(_)).reduce(_ ++ _))
    val df = Warc.records(spark, dir.getAbsolutePath)
    val rows = df.select(col("target_uri"), col("error")).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.isNullAt(1)))
    assert(rows.map(_.getString(0)).toSet ==
      (0 until 6).map(i => s"http://example.com/p/$i").toSet)
  }

  test("truncated payload quarantines the tail: clean records kept, " +
    "one error row, no task failure") {
    val good = rec(0) ++ rec(1)
    val truncated = good ++ rec(2).dropRight(40)
    val rs = Warc.parseStream(
      new java.io.ByteArrayInputStream(truncated)).toSeq
    assert(rs.length == 3)
    assert(rs.take(2).forall(_.error == null))
    assert(rs(2).error != null &&
      rs(2).error.toLowerCase.contains("truncat"))
  }

  test("bad version line and non-WARC bytes quarantine immediately") {
    val bad = "HTTP/1.1 200 OK\r\n\r\n".getBytes("ISO-8859-1")
    val rs = Warc.parseStream(new java.io.ByteArrayInputStream(bad)).toSeq
    assert(rs.length == 1 && rs.head.error != null)
    assert(rs.head.error.contains("bad version line"))
    // a record with a corrupt (non-numeric) Content-Length
    val corrupt = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: banana\r\n\r\n").getBytes("ISO-8859-1")
    val rs2 = Warc.parseStream(
      new java.io.ByteArrayInputStream(corrupt)).toSeq
    assert(rs2.length == 1 && rs2.head.error != null)
    // missing Content-Length entirely
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n")
      .getBytes("ISO-8859-1")
    val rs3 = Warc.parseStream(
      new java.io.ByteArrayInputStream(noLen)).toSeq
    assert(rs3.length == 1 &&
      rs3.head.error.contains("no Content-Length"))
  }

  test("header folding (RFC 5322 continuations) joins with one space") {
    val payload = "x".getBytes("UTF-8")
    val raw = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: http://example.com/very/\r\n" +
      "  long/path\r\n" +
      s"Content-Length: ${payload.length}\r\n" +
      "\r\n").getBytes("ISO-8859-1") ++ payload ++
      "\r\n\r\n".getBytes("ISO-8859-1")
    val rs = Warc.parseStream(new java.io.ByteArrayInputStream(raw)).toSeq
    assert(rs.length == 1 && rs.head.error == null)
    assert(rs.head.targetUri == "http://example.com/very/ long/path")
  }

  test("recordsFromBlobs + httpResponses: in-plan parse, status and " +
    "content-type split, non-HTTP payload degrades to raw body") {
    val blob1 = rec(0) ++ rec(1)
    val blob2 = Warc.buildRecord("metadata", "<urn:uuid:m>", "",
      "2024-01-01T00:00:00Z", "text/plain",
      "not an http response".getBytes("UTF-8"))
    val df = Seq(("a", blob1), ("b", blob2)).toDF("tag", "blob")
    val out = Warc.httpResponses(Warc.recordsFromBlobs(df, "blob"))
    val rows = out.select(col("tag"), col("warc_type"),
        col("http_status"), col("http_content_type"),
        col("body").cast("string")).collect()
    assert(rows.length == 3)
    val byType = rows.groupBy(_.getString(1))
    assert(byType("response").forall(r =>
      r.getInt(2) == 200 && r.getString(3) == "text/html" &&
        r.getString(4).startsWith("<html>")))
    assert(byType("metadata").head.isNullAt(2))
    assert(byType("metadata").head.getString(4) ==
      "not an http response")
  }

  test("wetText: conversion records surface decoded text; responses " +
    "filter out; error rows pass through for accounting") {
    val wet = Warc.buildRecord("conversion", "<urn:uuid:w>",
      "http://u/x", "2024-01-01T00:00:00Z", "text/plain",
      "extracted text here".getBytes("UTF-8"))
    val blob = wet ++ rec(1) ++ "corrupt".getBytes("ISO-8859-1")
    val df = Seq(("f", blob)).toDF("f", "blob")
    val out = Warc.wetText(Warc.recordsFromBlobs(df, "blob"))
      .select(col("warc_type"), col("text"), col("error")).collect()
    assert(out.length == 2) // conversion + error row; response dropped
    val conv = out.find(_.getString(0) == "conversion").get
    assert(conv.getString(1) == "extracted text here")
    assert(out.exists(r => !r.isNullAt(2)))
  }

  test("quarantine accounting composes with the Sources posture: " +
    "error rows are countable and carry no payload") {
    val mixed = rec(0) ++ "garbage tail".getBytes("ISO-8859-1")
    val df = Seq(("f1", mixed)).toDF("f", "blob")
    val out = Warc.recordsFromBlobs(df, "blob")
    assert(out.filter(col("error").isNull).count() == 1)
    assert(out.filter(col("error").isNotNull).count() == 1)
    assert(out.filter(col("error").isNotNull)
      .select(col("payload")).head().isNullAt(0))
  }

  private def watRec(id: String, json: String,
                     ctype: String = "application/json"): Array[Byte] =
    Warc.buildRecord("metadata", id, s"http://h.example/$id",
      "2024-01-01T00:00:00Z", ctype, json.getBytes("UTF-8"))

  test("watView: typed extraction of links/headers/title; " +
    "non-metadata records ignored; malformed JSON reported with " +
    "error set, never dropped") {
    val good = watRec("<urn:uuid:w1>",
      """{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":{
        |"Headers":{"Server":"nginx","Content-Type":"text/html"},
        |"HTML-Metadata":{"Head":{"Title":"A Page"},
        |"Links":[{"path":"A@/href","url":"http://a.example/1"},
        |{"path":"IMG@/src","url":"http://b.example/i.png"}]}}}}}"""
        .stripMargin.replace("\n", ""))
    val extraFields = watRec("<urn:uuid:w2>",
      // unknown envelope fields must be ignored by the typed parse
      """{"Container":{"Offset":12},"Envelope":{"Payload-Metadata":{
        |"HTTP-Response-Metadata":{"Headers":{"Server":"apache"}}}}}"""
        .stripMargin.replace("\n", ""))
    val malformed = watRec("<urn:uuid:w3>", """{"Envelope":""")
    val nonMeta = rec(7) // a response record — must be filtered
    val blob = good ++ extraFields ++ malformed ++ nonMeta
    val wat = Warc.watView(
      Warc.recordsFromBlobs(Seq(("f", blob)).toDF("f", "blob"), "blob"))
    val rows = wat.select(col("record_id"), col("title"),
      col("headers"), col("links"), col("error")).collect()
    assert(rows.length == 3) // w1, w2, w3 — the response is gone
    val byId = rows.map(r => r.getString(0) -> r).toMap
    val w1 = byId("<urn:uuid:w1>")
    assert(w1.isNullAt(4) && w1.getString(1) == "A Page")
    assert(w1.getMap[String, String](2)("Server") == "nginx")
    assert(w1.getSeq[org.apache.spark.sql.Row](3).map(
      _.getString(1)) == Seq("http://a.example/1",
      "http://b.example/i.png"))
    val w2 = byId("<urn:uuid:w2>")
    assert(w2.isNullAt(4) &&
      w2.getMap[String, String](2)("Server") == "apache" &&
      w2.isNullAt(3)) // no HTML-Metadata → null links
    val w3 = byId("<urn:uuid:w3>")
    assert(!w3.isNullAt(4) && w3.getString(4).contains("WAT JSON"))
  }

  test("watLinks + hostEdges: host extraction handles ports, " +
    "userinfo, uppercase; hostless links drop from the graph only") {
    val json =
      """{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":{
        |"HTML-Metadata":{"Links":[
        |{"path":"A@/href","url":"https://User@WWW.Ex.ORG:8443/p"},
        |{"path":"A@/href","url":"http://plain.example/x"},
        |{"path":"A@/href","url":"mailto:someone"},
        |{"path":"A@/href","url":"http://plain.example/y"}]}}}}}"""
        .stripMargin.replace("\n", "")
    val blob = watRec("<urn:uuid:l1>", json)
    val wat = Warc.watView(
      Warc.recordsFromBlobs(Seq(("f", blob)).toDF("f", "blob"), "blob"))
    val links = Warc.watLinks(wat)
    assert(links.count() == 4) // hostless link still visible here
    val edges = Warc.hostEdges(links).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(edges == Set(
      ("h.example", "www.ex.org", 1L),   // userinfo/port stripped, lc
      ("h.example", "plain.example", 2L))) // counted, mailto dropped
  }
}
