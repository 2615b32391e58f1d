package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException,
  InputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** From-scratch WARC (ISO 28500) ingest — the web-corpus front door
  * that feeds the Markup→C4→encoding→canonical-URL chain (q277 ff.):
  * a record-level parser for the format Common Crawl and every web
  * archive publish, built on JDK primitives only (header parse +
  * `GZIPInputStream`, which reads the per-record gzip members of a
  * `.warc.gz` as one multi-member stream).
  *
  * Reference analogue: the `source_conn_*` ingest seams
  * (R/source_conn_helpers.R:1) — the reference pulls already-tabular
  * CSVs; a web-scale training pipeline starts one step earlier, at the
  * crawl archive itself.
  *
  * Record grammar (ISO 28500 §4): a version line `WARC/1.x`, CRLF
  * header lines `Name: value` up to an empty line, exactly
  * `Content-Length` payload bytes, then CRLF CRLF. Header names are
  * case-insensitive; long header values may fold onto continuation
  * lines starting with SP/HT (folded per RFC 5322 semantics — joined
  * with one space here).
  *
  * Failure posture (the [[Sources.jsonLines]] quarantine discipline):
  * a malformed record degrades to ONE in-band row with `error` set and
  * `payload` holding the unconsumed head of the stream (WARC has no
  * record-level sync marker, so parsing cannot safely resync past a
  * corrupt length field — the remainder of that FILE is quarantined,
  * never silently skipped, and never a task failure). Clean records
  * before the corruption point are all emitted.
  *
  * Scale: WARC files are published in ~1 GB chunks precisely so that
  * file-level parallelism is the unit of work — [[records]] opens one
  * Hadoop input stream per file (`binaryFiles` +
  * `PortableDataStream.open`, never materializing file bytes), so a
  * task holds O(one record payload) memory regardless of archive size
  * and files beyond 2 GiB stream fine. ([[recordsFromBlobs]], the
  * in-plan twin, necessarily holds its ROW's blob — bounded by
  * whatever produced the blob column, not by archive size.) No
  * shuffle anywhere; the downstream extract chain is embarrassingly
  * parallel scan work. */
object Warc {

  /** Output schema of every record-level API. `payload` is the raw
    * content block (for `warc_type = response` usually an HTTP
    * response — split it with [[httpResponses]]). */
  val recordSchema: StructType = StructType(Seq(
    StructField("rec_idx", LongType, nullable = false),
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("payload", BinaryType),
    StructField("error", StringType)))

  final case class Rec(recIdx: Long, warcType: String, recordId: String,
                       targetUri: String, warcDate: String,
                       contentType: String, contentLength: Long,
                       payload: Array[Byte], error: String)

  /** Serialize one WARC record — the fixture/export half of the
    * parser (the [[graft.operators.Multimodal.encodeWav]] posture:
    * encode→decode roundtrips certify the codec byte-level). */
  def buildRecord(warcType: String, recordId: String, targetUri: String,
                  warcDate: String, contentType: String,
                  payload: Array[Byte]): Array[Byte] = {
    val uri = Option(targetUri).filter(_.nonEmpty)
      .map(u => s"WARC-Target-URI: $u\r\n").getOrElse("")
    val head = (s"WARC/1.0\r\n" +
      s"WARC-Type: $warcType\r\n" +
      s"WARC-Record-ID: $recordId\r\n" +
      s"WARC-Date: $warcDate\r\n" +
      uri +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${payload.length}\r\n" +
      "\r\n").getBytes("ISO-8859-1")
    head ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  /** One CRLF-terminated header line as ISO-8859-1 (the HTTP/WARC
    * header charset); None at EOF before any byte. Tolerates a bare
    * LF terminator (seen in hand-rolled WARCs). Guards against
    * unterminated garbage with a 64 KiB line cap. */
  private def readLine(in: InputStream): Option[String] = {
    val buf = new java.io.ByteArrayOutputStream(96)
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') {
      buf.write(c)
      if (buf.size > 65536)
        throw new java.io.IOException("header line exceeds 64 KiB")
      c = in.read()
    }
    if (c < 0 && buf.size == 0) return None
    val s = new String(buf.toByteArray, "ISO-8859-1")
    Some(if (s.endsWith("\r")) s.substring(0, s.length - 1) else s)
  }

  private def readFully(in: InputStream, n: Long): Array[Byte] = {
    require(n <= Int.MaxValue, s"payload of $n bytes exceeds 2 GiB")
    val out = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val r = in.read(out, off, n.toInt - off)
      if (r < 0) throw new EOFException(
        s"record truncated: expected $n payload bytes, got $off")
      off += r
    }
    out
  }

  /** Parse a WARC stream into records. Emits clean records until EOF
    * or the first malformation, which becomes a final error record
    * (see the object doc for why there is no resync). The iterator is
    * lazy — O(one record) memory regardless of file size. */
  def parseStream(raw: InputStream): Iterator[Rec] = {
    val in = new BufferedInputStream(raw, 1 << 16)
    var idx = -1L
    var finished = false
    // release the underlying handle (an open Hadoop stream when fed
    // by [[records]]) as soon as the walk ends — the lazy iterator
    // has no other close hook
    def finish(): Unit = {
      finished = true
      try in.close() catch { case scala.util.control.NonFatal(_) => () }
    }
    new Iterator[Rec] {
      private var nextRec: Rec = null
      private def fetch(): Unit = {
        if (finished || nextRec != null) return
        idx += 1
        try {
          // skip blank inter-record lines (tolerant: some writers pad
          // with extra CRLFs beyond the two the grammar requires)
          var line = readLine(in)
          while (line.exists(_.isEmpty)) line = readLine(in)
          line match {
            case None => finish()
            case Some(v) if !v.startsWith("WARC/") =>
              nextRec = Rec(idx, null, null, null, null, null, -1L, null,
                s"bad version line: ${v.take(80)}")
              finish()
            case Some(_) =>
              // headers with RFC-5322 folding (continuation = SP/HT)
              val hdrs = scala.collection.mutable.LinkedHashMap
                .empty[String, String]
              var last: String = null
              var h = readLine(in).getOrElse(
                throw new EOFException("EOF inside header block"))
              while (h.nonEmpty) {
                if ((h.head == ' ' || h.head == '\t') && last != null)
                  hdrs(last) = hdrs(last) + " " + h.trim
                else {
                  val i = h.indexOf(':')
                  if (i < 0) throw new java.io.IOException(
                    s"malformed header line: ${h.take(80)}")
                  last = h.substring(0, i).trim.toLowerCase
                  hdrs(last) = h.substring(i + 1).trim
                }
                h = readLine(in).getOrElse(
                  throw new EOFException("EOF inside header block"))
              }
              val len = hdrs.get("content-length") match {
                case Some(v) => v.toLong
                case None => throw new java.io.IOException(
                  "record has no Content-Length")
              }
              if (len < 0) throw new java.io.IOException(
                s"negative Content-Length $len")
              val payload = readFully(in, len)
              // the two record-terminating CRLFs
              val t1 = readLine(in); val t2 = readLine(in)
              if (!t1.exists(_.isEmpty) || !t2.exists(_.isEmpty))
                throw new java.io.IOException(
                  "record not followed by CRLF CRLF")
              nextRec = Rec(idx, hdrs.getOrElse("warc-type", null),
                hdrs.getOrElse("warc-record-id", null),
                hdrs.getOrElse("warc-target-uri", null),
                hdrs.getOrElse("warc-date", null),
                hdrs.getOrElse("content-type", null),
                len, payload, null)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            nextRec = Rec(idx, null, null, null, null, null, -1L, null,
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
            finish()
        }
      }
      def hasNext: Boolean = { fetch(); nextRec != null }
      def next(): Rec = {
        fetch()
        if (nextRec == null) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** gzip sniff + multi-member decompression: `.warc.gz` files gzip
    * each record as its OWN member (ISO 28500 annex D) so readers can
    * seek; `GZIPInputStream` reads concatenated members as one
    * stream, which is exactly the full-file scan this source does. */
  private def maybeGunzip(bytes: Array[Byte]): InputStream = {
    val in = new ByteArrayInputStream(bytes)
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F &&
        (bytes(1) & 0xFF) == 0x8B)
      new java.util.zip.GZIPInputStream(in, 1 << 16)
    else in
  }

  /** Streaming twin of [[maybeGunzip]]: sniff the two magic bytes via
    * mark/reset, never buffering the file. */
  private def maybeGunzipStream(raw: InputStream): InputStream = {
    val in =
      if (raw.markSupported()) raw
      else new BufferedInputStream(raw, 1 << 16)
    in.mark(2)
    val b0 = in.read(); val b1 = in.read()
    in.reset()
    if (b0 == 0x1F && b1 == 0x8B)
      new java.util.zip.GZIPInputStream(in, 1 << 16)
    else in
  }

  private def recRow(prefix: Seq[Any], r: Rec): Row =
    Row.fromSeq(prefix ++ Seq(r.recIdx, r.warcType, r.recordId,
      r.targetUri, r.warcDate, r.contentType, r.contentLength,
      r.payload, r.error))

  /** Read WARC files under `path` (plain or `.gz`): one task per file
    * (the format's parallelism unit — see the object doc), records
    * exploded to rows of [[recordSchema]] plus a leading `file`
    * column. Each task OPENS a Hadoop stream (`PortableDataStream
    * .open`) rather than loading file bytes, so memory stays O(one
    * record payload) and >2 GiB archives work; [[parseStream]] closes
    * the handle when the walk ends. Malformed tails arrive as in-band
    * `error` rows — count them for the quarantine report, the way
    * [[Sources.quarantine]] splits a PERMISSIVE read. */
  def records(spark: SparkSession, path: String): DataFrame = {
    val outSchema = StructType(
      StructField("file", StringType) +: recordSchema.fields.toSeq)
    val rdd = spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        parseStream(maybeGunzipStream(pds.open()))
          .map(rec => recRow(Seq(file), rec))
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Parse a BINARY COLUMN of WARC bytes (one multi-record stream per
    * row) — the in-plan twin of [[records]] used by the oracle query
    * and anywhere archives arrive as blobs (message queues, pages
    * tables). Keeps every non-content column. */
  def recordsFromBlobs(df: DataFrame, contentCol: String): DataFrame = {
    val session = df.sparkSession
    val keepFields = df.schema.fields.filterNot(_.name == contentCol)
    val outSchema =
      StructType(keepFields.toSeq ++ recordSchema.fields.toSeq)
    val contentIdx = df.schema.fieldIndex(contentCol)
    val keepIdx = df.schema.fields.indices.filterNot(_ == contentIdx)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val kept = keepIdx.map(r.get)
        parseStream(maybeGunzip(r.getAs[Array[Byte]](contentIdx)))
          .map(rec => recRow(kept, rec))
      }
    }
    session.createDataFrame(rdd, outSchema)
  }

  /** Split HTTP response payloads (the `application/http` content of
    * `response` records) into status line + headers + body: appends
    * (http_status, http_content_type, body) and drops `payload`.
    * Non-HTTP / truncated payloads report NULL status with the raw
    * payload as `body` — reported, never dropped. Pure per-row byte
    * work, no shuffle. */
  def httpResponses(records: DataFrame,
                    payloadCol: String = "payload"): DataFrame = {
    val session = records.sparkSession
    val keepFields = records.schema.fields.filterNot(_.name == payloadCol)
    val outSchema = StructType(keepFields.toSeq ++ Seq(
      StructField("http_status", IntegerType),
      StructField("http_content_type", StringType),
      StructField("body", BinaryType)))
    val contentIdx = records.schema.fieldIndex(payloadCol)
    val keepIdx = records.schema.fields.indices.filterNot(_ == contentIdx)
    val rdd = records.rdd.mapPartitions { rows =>
      rows.map { r =>
        val kept = keepIdx.map(r.get)
        val payload = r.getAs[Array[Byte]](contentIdx)
        val parsed = Option(payload).flatMap(splitHttp)
        parsed match {
          case Some((status, ctype, body)) =>
            Row.fromSeq(kept ++ Seq(status, ctype, body))
          case None =>
            Row.fromSeq(kept ++ Seq(null, null, payload))
        }
      }
    }
    session.createDataFrame(rdd, outSchema)
  }

  /** WET view of a record stream: `conversion` records (the
    * extracted-text sibling format Common Crawl publishes next to raw
    * WARC — same ISO 28500 record grammar, payload = plain text)
    * surfaced with the payload decoded as UTF-8 `text`. Compose with
    * [[records]]/[[recordsFromBlobs]]; non-conversion records are
    * filtered, error rows pass through for quarantine accounting. */
  def wetText(records: DataFrame): DataFrame =
    records
      .filter(col("error").isNotNull ||
        col("warc_type") === "conversion")
      .withColumn("text", col("payload").cast("string"))
      .drop("payload")

  /** Typed schema of the WAT payload subset a curation pipeline
    * consumes (Common Crawl's metadata sibling of WARC/WET: JSON
    * describing each crawled page — response headers, outlinks, head
    * metadata). The full WAT envelope carries more; `from_json`
    * ignores fields outside the schema, so this parses real WAT
    * records as published. */
  val watSchema: StructType = StructType(Seq(
    StructField("Envelope", StructType(Seq(
      StructField("Payload-Metadata", StructType(Seq(
        StructField("HTTP-Response-Metadata", StructType(Seq(
          StructField("Headers", MapType(StringType, StringType)),
          StructField("HTML-Metadata", StructType(Seq(
            StructField("Head", StructType(Seq(
              StructField("Title", StringType)))),
            StructField("Links", ArrayType(StructType(Seq(
              StructField("path", StringType),
              StructField("url", StringType)))))))))))))))))))

  /** WAT view of a record stream (the [[wetText]] posture for the
    * metadata sibling): `metadata` records with JSON payloads parsed
    * through [[watSchema]] to typed columns `title`, `headers`
    * (map), `links` (array of (path, url)). Non-metadata records are
    * filtered; parse-error rows pass through for quarantine
    * accounting, and a metadata record whose payload is NOT valid
    * JSON (`from_json` yields null) is reported with `error` set —
    * never dropped. Pure per-row parse work, no shuffle. */
  def watView(records: DataFrame): DataFrame = {
    // PERMISSIVE from_json yields a struct of nulls (not null) on
    // malformed JSON — route the corrupt text to a capture field so
    // the error flag is exact (a sparse-but-valid envelope is NOT an
    // error; WAT metadata for non-HTML responses has no HTML-Metadata)
    val parseSchema = StructType(
      watSchema.fields.toSeq :+ StructField("__corrupt", StringType))
    val parsed = records
      .filter(col("error").isNotNull ||
        (col("warc_type") === "metadata" &&
          col("content_type").contains("application/json")))
      .withColumn("__w",
        from_json(col("payload").cast("string"), parseSchema,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "__corrupt")))
      .withColumn("__h", col("__w").getField("Envelope")
        .getField("Payload-Metadata")
        .getField("HTTP-Response-Metadata"))
    parsed
      .withColumn("title",
        col("__h").getField("HTML-Metadata").getField("Head")
          .getField("Title"))
      .withColumn("headers", col("__h").getField("Headers"))
      .withColumn("links",
        col("__h").getField("HTML-Metadata").getField("Links"))
      .withColumn("error",
        when(col("error").isNotNull, col("error"))
          .when(col("__w").isNull ||
            col("__w").getField("__corrupt").isNotNull,
            lit("unparseable WAT JSON payload")))
      .drop("payload", "__w", "__h")
  }

  /** Outlink edges of a WAT view: one row per (page, link) —
    * `src_url` (the record's target URI), `link_path` (where in the
    * page the link sat, e.g. `A@/href`), `dst_url`. The error rows
    * are excluded (count them from [[watView]] directly). */
  def watLinks(wat: DataFrame): DataFrame =
    wat.filter(col("error").isNull && col("links").isNotNull)
      .select(col("target_uri").as("src_url"),
        explode(col("links")).as("__l"))
      .select(col("src_url"),
        col("__l").getField("path").as("link_path"),
        col("__l").getField("url").as("dst_url"))

  /** Registered-host extraction pattern, shared verbatim with DuckDB
    * oracles (RE2-safe: no backreferences, ASCII classes only):
    * scheme, optional userinfo, then the host up to port/path/query.
    */
  val HostPattern: String =
    "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"

  /** (src_host, dst_host, n_links) edge projection of [[watLinks]]
    * output — the link graph that feeds
    * [[graft.operators.PageRank]] / TrustRank domain-quality priors
    * (the Common Crawl curation practice). One keyed aggregate;
    * links whose URL has no extractable host are dropped from the
    * GRAPH (they remain visible in [[watLinks]]). */
  def hostEdges(links: DataFrame): DataFrame = {
    def host(c: org.apache.spark.sql.Column) =
      lower(regexp_extract(c, HostPattern, 1))
    links
      .select(host(col("src_url")).as("src_host"),
        host(col("dst_url")).as("dst_host"))
      .filter(col("src_host") =!= "" && col("dst_host") =!= "")
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))
  }

  /** (status, content-type, body) of an HTTP/1.x response, or None
    * when the bytes are not one. */
  private[sources] def splitHttp(payload: Array[Byte])
      : Option[(Int, String, Array[Byte])] =
    try {
      val in = new ByteArrayInputStream(payload)
      val status = readLine(in) match {
        case Some(l) if l.startsWith("HTTP/") =>
          val parts = l.split(" ", 3)
          if (parts.length < 2) return None
          parts(1).toInt
        case _ => return None
      }
      var ctype: String = null
      var h = readLine(in).getOrElse(return None)
      while (h.nonEmpty) {
        val i = h.indexOf(':')
        if (i > 0 && h.substring(0, i).trim.equalsIgnoreCase(
            "content-type"))
          ctype = h.substring(i + 1).trim
        h = readLine(in).getOrElse(return None)
      }
      val body = new Array[Byte](in.available())
      in.read(body)
      Some((status, ctype, body))
    } catch { case scala.util.control.NonFatal(_) => None }
}
