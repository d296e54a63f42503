package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC (Web ARChive, ISO 28500) container ingestion — the stage
  * UPSTREAM of the HTML family: a 100 TB web corpus arrives as WARC
  * files (concatenated length-prefixed records), not as per-page rows.
  * Completes the web front matter: WARC → records → HTML → text
  * (x92 = BuildWarc → WarcRecords → HtmlExtract).
  *
  * Same encode→decode→verify contract as the codec family
  * (x29/x49/x53/x89/x90):
  *
  *   - [[BuildWarc]] writes a genuine multi-record WARC/1.0 file — one
  *     warcinfo record, then 1 + id%3 `resource` records whose payload
  *     is the [[HtmlFunctions.page]] planted page — every header field
  *     and Content-Length derived from (doc_id, text) in closed form;
  *   - [[WarcRecords]] runs a REAL record walk: per record it requires
  *     the `WARC/1.0\r\n` magic, parses named header fields
  *     case-insensitively to the blank line, reads exactly
  *     Content-Length payload bytes, and requires the spec's two-CRLF
  *     record separator before the next record may begin.
  *
  * The DuckDB oracle rebuilds the ENTIRE byte layout from (doc_id, text)
  * — every header string, the page byte length, and therefore every
  * record's byte offset within the file — so a hash match proves the
  * walk consumed real lengths at real positions (the x89 movi-walk
  * standard: offsets cannot be faked by echoing metadata).
  *
  * Malformedness contract (the x89 rule): NULL input → NULL; an empty
  * container → empty array (valid-but-empty ≠ null); bad magic, a
  * missing/unparseable Content-Length, an unterminated header block, a
  * truncated payload, or a wrong record separator → NULL, never a throw
  * (a 100 TB crawl WILL contain damaged files, and one of them must not
  * kill the stage).
  *
  * Scale posture: map-only expressions, no shuffle, no state. At scale
  * the splitter runs inside the scan projection over a binary-file
  * column, one task per WARC file — the standard 1 GB crawl rotation
  * bounds per-row memory the same way the AVI/MP4 walks are bounded by
  * their fixtures. Parallelism is across files (millions of them at
  * 100 TB), not within a file, which is exactly how Common-Crawl-style
  * jobs shard. (Reference: an options ETL, no WARC analog — this
  * extends the engine's ingestion family upstream of x90.)
  */
object WarcFunctions {
  private[functions] val recordSchema: StructType = StructType(Seq(
    StructField("rec_offset", LongType, nullable = false),
    StructField("rec_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("rec_date", StringType, nullable = true),
    StructField("content_length", IntegerType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** The per-record byte strings of a document's WARC file, shared by
    * [[BuildWarc]] (plain concatenation) and [[BuildWarcGz]] (one gzip
    * MEMBER per record, the Common-Crawl layout). Each string is a
    * complete record: headers, blank line, payload, two-CRLF separator.
    */
  private[functions] def recordStrings(id: Long, text: String): Seq[String] = {
    val crlf = "\r\n"
    def rec(
        typ: String, rid: String, uri: Option[String], date: String,
        ctype: String, payload: String): String = {
      val clen = payload.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
      val sb = new StringBuilder(payload.length + 256)
      sb.append("WARC/1.0").append(crlf)
      sb.append("WARC-Type: ").append(typ).append(crlf)
      sb.append("WARC-Record-ID: ").append(rid).append(crlf)
      uri.foreach(u => sb.append("WARC-Target-URI: ").append(u).append(crlf))
      sb.append("WARC-Date: ").append(date).append(crlf)
      sb.append("Content-Type: ").append(ctype).append(crlf)
      sb.append("Content-Length: ").append(clen).append(crlf)
      sb.append(crlf).append(payload).append(crlf).append(crlf)
      sb.toString
    }
    val info = rec(
      "warcinfo", s"<urn:graft:$id:info>", None, "2020-01-01T00:00:00Z",
      "application/warc-fields", "software: graft\r\n")
    val html = HtmlFunctions.page(id, text)
    val n = (1L + java.lang.Math.floorMod(id, 3L)).toInt
    info +: (0 until n).map { i =>
      rec(
        "resource", s"<urn:graft:$id:$i>",
        Some(s"http://example.com/doc/$id/$i"),
        s"2020-01-01T00:00:0${i}Z", "text/html", html)
    }
  }
}

/** Deterministic multi-record WARC/1.0 file around a document — see
  * [[WarcFunctions]]. Layout (everything id-derived; `\r\n` line ends):
  *
  * {{{
  * record 0:      WARC-Type: warcinfo, Content-Type: application/warc-fields,
  *                payload "software: graft\r\n" (17 bytes)
  * records 1..n:  WARC-Type: resource (n = 1 + id%3), i = 0-based index:
  *                WARC-Record-ID: <urn:graft:{id}:{i}>
  *                WARC-Target-URI: http://example.com/doc/{id}/{i}
  *                WARC-Date: 2020-01-01T00:00:0{i}Z
  *                Content-Type: text/html
  *                payload = HtmlFunctions.page(id, text)
  * }}}
  *
  * Each record is `headers \r\n payload \r\n\r\n` — the ISO 28500 record
  * separator. All resource payloads of one file are the same page, so
  * Content-Length is constant per doc while record ids/URIs/dates vary —
  * the oracle must parse PER-RECORD headers, not replicate one.
  */
case class BuildWarc(idExpr: Expression, textExpr: Expression)
    extends BinaryExpression
    with CodegenFallback {

  override def left: Expression = idExpr
  override def right: Expression = textExpr
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(idAny: Any, textAny: Any): Any =
    WarcFunctions
      .recordStrings(
        idAny.asInstanceOf[Long],
        textAny.asInstanceOf[UTF8String].toString)
      .mkString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(idExpr = l, textExpr = r)
}

/** The compressed twin of [[BuildWarc]]: the same records, each written
  * as its OWN gzip member and concatenated — the exact Common Crawl
  * `.warc.gz` layout (per-record members so a reader can seek to a
  * record and inflate only it). JDK GZIPOutputStream headers are fully
  * deterministic (MTIME = 0, XFL = 0, OS = 0), so the fixture is
  * byte-stable; the ORACLE never depends on compressed bytes — it
  * verifies the decompressed contract (x92's closed form).
  */
case class BuildWarcGz(idExpr: Expression, textExpr: Expression)
    extends BinaryExpression
    with CodegenFallback {

  override def left: Expression = idExpr
  override def right: Expression = textExpr
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(idAny: Any, textAny: Any): Any = {
    val recs = WarcFunctions.recordStrings(
      idAny.asInstanceOf[Long],
      textAny.asInstanceOf[UTF8String].toString)
    val out = new java.io.ByteArrayOutputStream(4096)
    recs.foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(r.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      gz.finish() // flush THIS member's trailer without closing `out`
    }
    out.toByteArray
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(idExpr = l, textExpr = r)
}

/** Multi-member gzip splitter + REAL inflate (RFC 1952 container walk +
  * JDK zlib decompression, the same entropy-decode stance as the PNG
  * path): returns `array<binary>`, one element per member's decompressed
  * bytes, in member order. Per member the walk parses the full header —
  * magic 1f 8b, CM = 8 (deflate), FLG with reserved bits rejected,
  * MTIME/XFL/OS skipped, FEXTRA (XLEN-prefixed), FNAME/FCOMMENT
  * (NUL-terminated) and FHCRC consumed — inflates the deflate stream to
  * its end, then VERIFIES the trailer: CRC32 of the plaintext and
  * ISIZE = length mod 2^32. The next member begins immediately after.
  *
  * NULL contract (the x89 rule): bad magic, unsupported CM, reserved
  * FLG bits, truncated header/stream/trailer, a deflate error, or a
  * CRC/ISIZE mismatch → NULL, never a throw; empty input → empty array.
  *
  * Scale posture: map-only; at 100 TB this is the first expression over
  * a binary-file scan of `.warc.gz` shards — parallelism across files,
  * per-file memory bounded by the crawl's 1 GB rotation, exactly like
  * [[WarcRecords]]. Chained as gzip_members → warc_records → html
  * verbs, each stage NULL-isolating its own damage.
  */
case class GzipMembers(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType =
    ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(bytesAny: Any): Any = {
    val b = bytesAny.asInstanceOf[Array[Byte]]
    val n = b.length
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var p = 0
    def u8(i: Int): Int = b(i) & 0xff
    while (p < n) {
      // --- RFC 1952 member header ---
      if (p + 10 > n || u8(p) != 0x1f || u8(p + 1) != 0x8b) return null
      if (u8(p + 2) != 8) return null // CM: deflate only
      val flg = u8(p + 3)
      if ((flg & 0xe0) != 0) return null // reserved bits
      p += 10 // magic, CM, FLG, MTIME(4), XFL, OS
      if ((flg & 4) != 0) { // FEXTRA
        if (p + 2 > n) return null
        val xlen = u8(p) | (u8(p + 1) << 8)
        p += 2 + xlen
        if (p > n) return null
      }
      if ((flg & 8) != 0) { // FNAME
        while (p < n && b(p) != 0) p += 1
        if (p >= n) return null
        p += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (p < n && b(p) != 0) p += 1
        if (p >= n) return null
        p += 1
      }
      if ((flg & 2) != 0) { // FHCRC
        p += 2
        if (p > n) return null
      }
      // --- deflate stream ---
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(b, p, n - p)
        val buf = new java.io.ByteArrayOutputStream(8192)
        val tmp = new Array[Byte](8192)
        try {
          while (!inf.finished()) {
            val got = inf.inflate(tmp)
            if (got > 0) buf.write(tmp, 0, got)
            else if (inf.needsInput()) return null // truncated stream
          }
        } catch { case _: java.util.zip.DataFormatException => return null }
        val data = buf.toByteArray
        p += inf.getBytesRead.toInt
        // --- trailer: CRC32 + ISIZE, little-endian ---
        if (p + 8 > n) return null
        val crc = (u8(p).toLong) | (u8(p + 1).toLong << 8) |
          (u8(p + 2).toLong << 16) | (u8(p + 3).toLong << 24)
        val isize = (u8(p + 4).toLong) | (u8(p + 5).toLong << 8) |
          (u8(p + 6).toLong << 16) | (u8(p + 7).toLong << 24)
        p += 8
        val c = new java.util.zip.CRC32
        c.update(data)
        if (c.getValue != crc) return null
        if ((data.length.toLong & 0xffffffffL) != isize) return null
        out += data
      } finally inf.end()
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** WARC record splitter — see [[WarcFunctions]] for contract and
  * provenance. Returns `array<struct<rec_offset, rec_type, target_uri,
  * rec_date, content_length, payload>>`, one element per record in file
  * order; `rec_offset` is the byte position of the record's magic within
  * the file. NULL on any structural damage (bad magic, unterminated
  * headers, missing/invalid Content-Length, truncated payload, wrong
  * record separator); empty array for an empty file; header NAMES are
  * case-insensitive per ISO 28500 §5 (values are kept verbatim, trimmed
  * of the optional single leading space).
  */
case class WarcRecords(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType =
    ArrayType(WarcFunctions.recordSchema, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(bytesAny: Any): Any = {
    val b = bytesAny.asInstanceOf[Array[Byte]]
    val n = b.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val magic = "WARC/1.0\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    def startsWith(at: Int, pat: Array[Byte]): Boolean = {
      if (at + pat.length > n) return false
      var k = 0
      while (k < pat.length) { if (b(at + k) != pat(k)) return false; k += 1 }
      true
    }
    // index of the next CRLF at/after `from`, -1 if none
    def findCrlf(from: Int): Int = {
      var p = from
      while (p + 1 < n) {
        if (b(p) == '\r' && b(p + 1) == '\n') return p
        p += 1
      }
      -1
    }
    while (pos < n) {
      val recStart = pos
      if (!startsWith(pos, magic)) return null
      pos += magic.length
      // named header fields to the blank line
      var recType: String = null
      var uri: String = null
      var date: String = null
      var clen: Long = -1L
      var headersDone = false
      while (!headersDone) {
        val e = findCrlf(pos)
        if (e < 0) return null // unterminated header block
        if (e == pos) { headersDone = true; pos = e + 2 }
        else {
          val line = new String(b, pos, e - pos, java.nio.charset.StandardCharsets.UTF_8)
          pos = e + 2
          val c = line.indexOf(':')
          if (c <= 0) return null // a header line must be name: value
          val name = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(c + 1).trim
          name match {
            case "warc-type" => recType = value
            case "warc-target-uri" => uri = value
            case "warc-date" => date = value
            case "content-length" =>
              clen =
                try java.lang.Long.parseLong(value)
                catch { case _: NumberFormatException => return null }
              if (clen < 0) return null
            case _ => // unknown headers are legal and ignored
          }
        }
      }
      if (recType == null || clen < 0 || clen > Int.MaxValue) return null
      if (pos + clen + 4 > n) return null // truncated payload or separator
      val payload =
        new String(b, pos, clen.toInt, java.nio.charset.StandardCharsets.UTF_8)
      pos += clen.toInt
      // the ISO 28500 record separator: exactly two CRLFs
      if (!(b(pos) == '\r' && b(pos + 1) == '\n' && b(pos + 2) == '\r' && b(pos + 3) == '\n'))
        return null
      pos += 4
      out += InternalRow(
        recStart.toLong,
        UTF8String.fromString(recType),
        if (uri == null) null else UTF8String.fromString(uri),
        if (date == null) null else UTF8String.fromString(date),
        clen.toInt,
        UTF8String.fromString(payload))
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
