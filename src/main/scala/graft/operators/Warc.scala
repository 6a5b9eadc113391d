package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 / WARC/1.0-1.1) record parsing — the entry format
  * of a web-scale corpus: Common-Crawl-style archives are
  * concatenated WARC records (version line, CRLF header block,
  * Content-Length-framed payload, CRLF CRLF trailer), usually with
  * each record its own gzip MEMBER in `.warc.gz`. The engine reads
  * archives as binary blobs (`spark.read.format("binaryFile")` or a
  * journal column) and explodes them into records executor-side:
  *
  *  - [[records]]: all records of one archive blob — WARC-Type,
  *    WARC-Target-URI, Content-Type, Content-Length, payload bytes,
  *    and the record's exact byte offset/length in the archive (the
  *    provenance a takedown/audit pipeline needs to point back into
  *    the source object).
  *  - [[explodeRecords]]: DataFrame form — one row per record.
  *  - Gzip archives: [[records]] detects the 1F 8B magic and inflates
  *    CONCATENATED members in one pass (JDK `GZIPInputStream` reads
  *    multi-member streams); offsets then refer to the DEFLATED
  *    archive layout a range-read cannot use, so they are reported
  *    against the inflated stream — flagged by `compressed = true`.
  *
  * Malformed records end the walk (everything parsed so far is kept)
  * — truncated tails are routine in crawl archives and must not
  * poison the archive's good prefix. Scale shape: narrow per-row
  * flatMap. [[parse]] returns offset-only [[Record]]s (no payload
  * copies); [[explodeRecords]] necessarily MATERIALIZES each record's
  * payload bytes into its output row (the DataFrame route serializes
  * rows, so a reference into the archive array cannot survive) —
  * provenance-only consumers that do not need payload bytes should
  * project from [[parse]]/[[archiveStats]] instead.
  */
object Warc {

  /** One record's facts. `payloadFrom/payloadLen` frame the payload
    * INSIDE the (inflated) archive bytes; `headers` carries the raw
    * named fields a caller projects from.
    */
  final case class Record(offset: Long, length: Long, warcType: String,
      targetUri: String, contentType: String, contentLength: Long,
      payloadFrom: Long, headers: Map[String, String])

  private val Crlf = "\r\n"

  /** Parse headers of the record starting at `i`; returns (headers,
    * payloadStart) or null when the bytes at `i` are not a WARC
    * version line / complete header block.
    */
  private def headerBlock(b: Array[Byte], i: Int)
      : (Map[String, String], Int) = {
    // Version line: "WARC/1.0" or "WARC/1.1".
    if (i + 10 > b.length) return null
    if (!(b(i) == 'W' && b(i + 1) == 'A' && b(i + 2) == 'R' &&
      b(i + 3) == 'C' && b(i + 4) == '/')) return null
    var p = i
    val out = Map.newBuilder[String, String]
    var first = true
    while (true) {
      // Find CRLF.
      var e = p
      while (e + 1 < b.length && !(b(e) == '\r' && b(e + 1) == '\n')) e += 1
      if (e + 1 >= b.length) return null // truncated header block
      val line = new String(b, p, e - p, "UTF-8")
      p = e + 2
      if (line.isEmpty) {
        // End of header block.
        return (out.result(), p)
      }
      if (first) {
        if (!line.startsWith("WARC/")) return null
        first = false
      } else {
        val colon = line.indexOf(':')
        if (colon > 0)
          out += (line.substring(0, colon).trim.toLowerCase ->
            line.substring(colon + 1).trim)
      }
    }
    null // unreachable
  }

  /** All parseable records of one (possibly .gz) archive blob. */
  def parse(blob: Array[Byte]): Array[Record] = {
    if (blob == null || blob.length < 4) return Array.empty
    val b =
      if ((blob(0) & 0xff) == 0x1f && (blob(1) & 0xff) == 0x8b) gunzip(blob)
      else blob
    if (b == null) return Array.empty
    val out = Array.newBuilder[Record]
    var i = 0
    var ok = true
    while (ok && i + 4 < b.length) {
      headerBlock(b, i) match {
        case null => ok = false
        case (hs, payloadStart) =>
          val len = hs.get("content-length").flatMap(s =>
            scala.util.Try(s.toLong).toOption).getOrElse(-1L)
          if (len < 0 || payloadStart + len > b.length) ok = false
          else {
            // Trailer FIRST (ISO 28500 §4: CRLF CRLF after the
            // payload): `length` must be the record's exact byte
            // extent — a range read of [offset, offset+length) is the
            // provenance contract, so a truncated trailer must not be
            // billed as 4 phantom bytes past the archive end.
            var next = payloadStart + len.toInt
            var trail = 0
            while (trail < 4 && next + 1 < b.length &&
              b(next) == '\r' && b(next + 1) == '\n') {
              next += 2; trail += 2
            }
            if (trail == 0 && next + 4 <= b.length) ok = false
            else {
              out += Record(
                offset = i.toLong,
                length = next - i.toLong,
                warcType = hs.getOrElse("warc-type", ""),
                targetUri = hs.getOrElse("warc-target-uri", ""),
                contentType = hs.getOrElse("content-type", ""),
                contentLength = len,
                payloadFrom = payloadStart.toLong,
                headers = hs)
              i = next
            }
          }
      }
    }
    out.result()
  }

  private def gunzip(b: Array[Byte]): Array[Byte] = Gunzip.prefix(b)

  /** One row per record: (offset, length, warc_type, target_uri,
    * content_type, content_length, payload binary, compressed).
    */
  def explodeRecords(df: DataFrame, blobCol: String = "content",
      keep: Seq[String] = Seq.empty): DataFrame = {
    val f = udf { blob: Array[Byte] =>
      val compressed = blob != null && blob.length >= 2 &&
        (blob(0) & 0xff) == 0x1f && (blob(1) & 0xff) == 0x8b
      val body =
        if (compressed) gunzip(blob) else blob
      (if (body == null) Array.empty[Record] else parse(body)).map { r =>
        val payload = if (body == null) Array.empty[Byte]
          else java.util.Arrays.copyOfRange(body, r.payloadFrom.toInt,
            (r.payloadFrom + r.contentLength).toInt)
        (r.offset, r.length, r.warcType, r.targetUri, r.contentType,
          r.contentLength, payload, compressed)
      }
    }
    val keepCols = keep.map(col)
    df.select(keepCols :+ explode(f(col(blobCol))).as("r"): _*)
      .select(keepCols :+ col("r._1").as("offset") :+
        col("r._2").as("length") :+ col("r._3").as("warc_type") :+
        col("r._4").as("target_uri") :+ col("r._5").as("content_type") :+
        col("r._6").as("content_length") :+ col("r._7").as("payload") :+
        col("r._8").as("compressed"): _*)
  }

  /** struct stats per archive: n_records, n_responses, payload_bytes —
    * the cheap triage before a full explode.
    */
  def archiveStats(blob: Column): Column = {
    val f = udf { b: Array[Byte] =>
      val rs = parse(b)
      (rs.length, rs.count(_.warcType == "response"),
        rs.map(_.contentLength).sum)
    }
    f(blob).cast(
      "struct<n_records:int,n_responses:int,payload_bytes:bigint>")
  }

  // ---- fixture ----------------------------------------------------------

  /** A spec-conformant WARC archive from the deterministic schedule:
    * record i (0-based) is a `response` for
    * `http://example.com/doc/<i>` whose payload is `payloadOf(i)`;
    * `gz = true` wraps the whole archive as one gzip member (the
    * inflate path; per-member gz differs only in offsets, which the
    * flag already scopes out of the oracle).
    */
  def payloadOf(i: Int): String = "body-" * (1 + i % 3) + i.toString

  /** A web-CRAWL archive on a deterministic schedule — the q189
    * streaming-pipeline corpus. Record i (0-based) of `n` cycles three
    * classes (i % 3): 0 = an HTML response whose content paragraph is
    * `web-<i>` behind the standard link-dense nav (the q185
    * boilerplate shape); 1 = a nav-only boilerplate page (extraction
    * leaves zero blocks); 2 = a binary non-HTML payload (quarantine).
    * Every record's Target-URI is deliberately messy — uppercase
    * scheme/host, default port, dot-segments, %7E escape, tracking
    * param, fragment — and canonicalizes to
    * `http://www.site<docId%5>.com/a/p/~doc<docId>?x=<i>`.
    */
  def webFixture(docId: Long, n: Int, gz: Boolean = false): Array[Byte] = {
    val sb = new java.io.ByteArrayOutputStream()
    (0 until n).foreach { i =>
      val uri = s"HTTP://WWW.Site${docId % 5}.COM:80/a/b/../p/" +
        s"%7Edoc$docId?utm_source=feed&x=$i#top"
      val nav = "<nav><a href=\"/\">Home</a> <a href=\"/b\">B</a></nav>"
      val (ctype, payload) = (i % 3) match {
        case 0 => ("text/html",
          ("<html><head><title>t</title></head><body>" + nav +
            s"<p>web-$i</p></body></html>").getBytes("UTF-8"))
        case 1 => ("text/html",
          ("<html><body>" + nav + "</body></html>").getBytes("UTF-8"))
        case _ => ("application/octet-stream",
          Array.tabulate[Byte](7 + i)(j => j.toByte))
      }
      val hdr = "WARC/1.0" + Crlf +
        "WARC-Type: response" + Crlf +
        s"WARC-Target-URI: $uri" + Crlf +
        s"WARC-Record-ID: <urn:uuid:$docId-$i>" + Crlf +
        s"Content-Type: $ctype" + Crlf +
        s"Content-Length: ${payload.length}" + Crlf + Crlf
      sb.write(hdr.getBytes("UTF-8"))
      sb.write(payload)
      sb.write((Crlf + Crlf).getBytes("UTF-8"))
    }
    val raw = sb.toByteArray
    if (!gz) raw
    else {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(raw); g.close()
      out.toByteArray
    }
  }

  def fixture(nRecords: Int, gz: Boolean = false): Array[Byte] = {
    val sb = new java.io.ByteArrayOutputStream()
    (0 until nRecords).foreach { i =>
      val payload = payloadOf(i).getBytes("UTF-8")
      val hdr = "WARC/1.0" + Crlf +
        "WARC-Type: response" + Crlf +
        s"WARC-Target-URI: http://example.com/doc/$i" + Crlf +
        "WARC-Record-ID: <urn:uuid:" + i + ">" + Crlf +
        "Content-Type: application/http; msgtype=response" + Crlf +
        s"Content-Length: ${payload.length}" + Crlf + Crlf
      sb.write(hdr.getBytes("UTF-8"))
      sb.write(payload)
      sb.write((Crlf + Crlf).getBytes("UTF-8"))
    }
    val raw = sb.toByteArray
    if (!gz) raw
    else {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(raw); g.close()
      out.toByteArray
    }
  }
}
