package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MIXED-MODALITY WARC container — the multimodal twin of
  * [[WarcFunctions]]: a real crawl's WARC files interleave HTML pages
  * with the images those pages embed, and a multimodal training-data
  * pipeline must walk ONE container and route records by media type.
  * Two expressions complete the surface:
  *
  *   - [[BuildMediaWarc]] writes a genuine WARC/1.0 file whose resource
  *     records carry BOTH payload kinds: the same text/html records as
  *     [[BuildWarc]] (same strings, so the text half of the multimodal
  *     arc shares the text arc's oracle chain verbatim), followed by
  *     `1 + id%2` image records — REAL BMP and GIF files from the shared
  *     [[BmpBytes]]/[[GifBytes]] cores, format alternating by (id+j)
  *     parity (pixel (x,y) of image `pid` is
  *     the closed form floorMod(pid·131 + x·7 + y·13, 256), so a SQL
  *     oracle can recompute every downstream aHash from the formula
  *     while Spark decodes actual bytes — the x29/x30 contract). Image
  *     `j` of document `id` draws its pixels from pid = (id div 2)·2+j:
  *     document pairs (2k, 2k+1) share their first image — the planted
  *     cross-document duplicate the near-dup stage must catch. Every
  *     7th document's image payloads have their magic corrupted in
  *     place ('BM' → 'XX', byte count unchanged so the container walk
  *     stays intact) — the planted damage the decode gate must drop (a
  *     100 TB crawl WILL contain truncated/corrupt media). After the
  *     images come `1 + id%2` AUDIO records — REAL 16-bit PCM mono WAV
  *     clips from the shared [[WavBytes]] core with their own plant
  *     matrix (corruption / silence / too-short — see [[audioBytes]]),
  *     so the one container exercises a third modality route.
  *   - [[MediaWarcRecords]] is the binary record walk: identical ISO
  *     28500 discipline to [[WarcRecords]] (magic, case-insensitive
  *     headers, exact Content-Length payload consumption, two-CRLF
  *     separator, NULL on any structural damage) but it ADDITIONALLY
  *     parses Content-Type and returns the payload as RAW BYTES — a
  *     UTF-8 string round-trip would corrupt binary media payloads,
  *     which is precisely why the text-only walker cannot carry images.
  *
  * Scale posture: both are map-only expressions — at 100 TB the build
  * side is the test-fixture synthesizer, and the walk runs inside the
  * scan projection over binary WARC shards, parallel across files,
  * per-file memory bounded by the crawl's 1 GB rotation (the
  * [[WarcFunctions]] argument, unchanged by payload modality).
  *
  * Reference scope: the reference pipeline (main.py) has no media
  * ingestion; this extends the engine's LLM-data family — the round-14
  * verdict's top item (image payloads through the composed arc).
  */
object MediaWarcFunctions {

  val recordSchema: StructType = StructType(Seq(
    StructField("rec_offset", LongType, nullable = false),
    StructField("rec_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("rec_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", IntegerType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  private val ascii = java.nio.charset.StandardCharsets.US_ASCII
  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** Images per document: 1 + id%2 (so near-dup has both singleton and
    * pair shapes to exercise), pixel seed pid = (id div 2)·2 + j (the
    * planted cross-document duplicate), dims 16+pid%16 × 16+pid%12
    * (always ≥ the 8×8 aHash grid). FORMAT alternates by (id+j) parity
    * — BMP even, GIF odd — which makes the planted duplicate pair
    * CROSS-FORMAT: document 2k's image is a BMP and document 2k+1's
    * first image is a GIF of the SAME pixels, so the arc's near-dup
    * stage only catches it if the raw-pixel decoder and the full LZW
    * decoder land bit-identical hashes inside the composition (the
    * MultimodalSpec equality, now load-bearing in the pipeline).
    */
  def imageCount(id: Long): Int = (1L + java.lang.Math.floorMod(id, 2L)).toInt

  def imagePid(id: Long, j: Int): Long =
    java.lang.Math.floorDiv(id, 2L) * 2L + j

  def imageIsGif(id: Long, j: Int): Boolean =
    java.lang.Math.floorMod(id + j, 2L) == 1L

  def imageBytes(id: Long, j: Int): Array[Byte] = {
    val pid = imagePid(id, j)
    val w = (16L + java.lang.Math.floorMod(pid, 16L)).toInt
    val h = (16L + java.lang.Math.floorMod(pid, 12L)).toInt
    val b = if (imageIsGif(id, j)) GifBytes(pid, w, h) else BmpBytes(pid, w, h)
    if (java.lang.Math.floorMod(id, 7L) == 0L) {
      // the damage plant: corrupt the magic IN PLACE (length unchanged,
      // so Content-Length and the record walk stay valid) — the decode
      // gate, not the container walk, must drop these
      b(0) = 'X'.toByte; b(1) = 'X'.toByte
    }
    b
  }

  /** Audio clips per document: the image discipline (1 + id%2 — both
    * singleton and pair shapes), seed pid = (id div 2)·2 + j so document
    * pairs (2k, 2k+1) share their first clip's SAMPLES — the planted
    * cross-document duplicate the audio dedup stage must catch. Three
    * further plants, each testing a different stage:
    *   - every 7th DOCUMENT's clips get the in-place magic corruption
    *     (the image rule — the decode gate must drop them);
    *   - pid % 5 == 4 clips are the SILENCE plant ([[WavBytes]] quiet
    *     branch, rms ≈ 72 vs ≈ 1155 loud — the energy screen must drop
    *     them while every header field stays identical);
    *   - pid % 7 == 0 clips are SHORT (n = 300 samples → 37 ms at
    *     8 kHz — the duration screen must drop them).
    * All closed forms: n = 300 + (pid%7)·100 samples, rate 8000 Hz
    * constant, payload exactly 44 + 2n bytes — so a SQL oracle
    * re-derives every byte length, offset, and sample statistic.
    */
  def audioCount(id: Long): Int = (1L + java.lang.Math.floorMod(id, 2L)).toInt

  def audioPid(id: Long, j: Int): Long =
    java.lang.Math.floorDiv(id, 2L) * 2L + j

  val audioRate: Int = 8000

  def audioSamples(pid: Long): Int =
    (300L + java.lang.Math.floorMod(pid, 7L) * 100L).toInt

  def audioQuiet(pid: Long): Boolean = java.lang.Math.floorMod(pid, 5L) == 4L

  def audioBytes(id: Long, j: Int): Array[Byte] = {
    val pid = audioPid(id, j)
    val b = WavBytes(pid, audioRate, audioSamples(pid), quiet = audioQuiet(pid))
    if (java.lang.Math.floorMod(id, 7L) == 0L) {
      b(0) = 'X'.toByte; b(1) = 'X'.toByte // same in-place damage plant
    }
    b
  }

  /** Videos per document: the image/audio discipline (1 + id%2, seed
    * pid = (id div 2)·2 + j — document pairs share their first clip's
    * FRAMES, the planted cross-document duplicate) over genuine
    * multi-frame AVIs from the shared [[AviFramesBytes]] core. Dims
    * w = 8 + pid%23, h = 8 + pid%19 (the x89 ranges), frames =
    * 2 + pid%9, per-video content via seed = pid. Plants: the every-7th
    * -doc magic corruption (decode gate), and frames = 2 clips
    * (pid%9==0 — with the route's stride-2 sampling they yield a single
    * sampled frame, the too-few-frames screen's prey). File size is the
    * closed form 224 + 32·frames bytes.
    */
  def videoCount(id: Long): Int = (1L + java.lang.Math.floorMod(id, 2L)).toInt

  def videoPid(id: Long, j: Int): Long =
    java.lang.Math.floorDiv(id, 2L) * 2L + j

  def videoDims(pid: Long): (Int, Int, Int) = (
    (8L + java.lang.Math.floorMod(pid, 23L)).toInt,
    (8L + java.lang.Math.floorMod(pid, 19L)).toInt,
    (2L + java.lang.Math.floorMod(pid, 9L)).toInt)

  def videoBytes(id: Long, j: Int): Array[Byte] = {
    val pid = videoPid(id, j)
    val (w, h, frames) = videoDims(pid)
    val b = AviFramesBytes(w, h, frames, seed = pid)
    if (java.lang.Math.floorMod(id, 7L) == 0L) {
      b(0) = 'X'.toByte; b(1) = 'X'.toByte // same in-place damage plant
    }
    b
  }

  /** The file's bytes: the [[WarcFunctions.recordStrings]] records
    * verbatim (warcinfo + text/html resources), then the image records,
    * then the audio records — modalities appended in fixed order so
    * every earlier record's byte offset is invariant under adding a new
    * modality (the CDX surfaces stay stable as the container grows).
    */
  def fileBytes(id: Long, text: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4096)
    WarcFunctions.recordStrings(id, text).foreach(s => out.write(s.getBytes(utf8)))
    val crlf = "\r\n".getBytes(ascii)
    var j = 0
    val n = imageCount(id)
    while (j < n) {
      val payload = imageBytes(id, j)
      val ext = if (imageIsGif(id, j)) "gif" else "bmp"
      val hdr = new StringBuilder(256)
      hdr.append("WARC/1.0\r\n")
      hdr.append("WARC-Type: resource\r\n")
      hdr.append(s"WARC-Record-ID: <urn:graft:$id:img:$j>\r\n")
      hdr.append(s"WARC-Target-URI: http://example.com/img/$id/$j.$ext\r\n")
      hdr.append(s"WARC-Date: 2020-01-01T00:00:1${j}Z\r\n")
      hdr.append(s"Content-Type: image/$ext\r\n")
      hdr.append(s"Content-Length: ${payload.length}\r\n")
      hdr.append("\r\n")
      out.write(hdr.toString.getBytes(ascii))
      out.write(payload)
      out.write(crlf); out.write(crlf)
      j += 1
    }
    var k = 0
    val na = audioCount(id)
    while (k < na) {
      val payload = audioBytes(id, k)
      val hdr = new StringBuilder(256)
      hdr.append("WARC/1.0\r\n")
      hdr.append("WARC-Type: resource\r\n")
      hdr.append(s"WARC-Record-ID: <urn:graft:$id:aud:$k>\r\n")
      hdr.append(s"WARC-Target-URI: http://example.com/aud/$id/$k.wav\r\n")
      hdr.append(s"WARC-Date: 2020-01-01T00:00:2${k}Z\r\n")
      hdr.append("Content-Type: audio/wav\r\n")
      hdr.append(s"Content-Length: ${payload.length}\r\n")
      hdr.append("\r\n")
      out.write(hdr.toString.getBytes(ascii))
      out.write(payload)
      out.write(crlf); out.write(crlf)
      k += 1
    }
    var v = 0
    val nv = videoCount(id)
    while (v < nv) {
      val payload = videoBytes(id, v)
      val hdr = new StringBuilder(256)
      hdr.append("WARC/1.0\r\n")
      hdr.append("WARC-Type: resource\r\n")
      hdr.append(s"WARC-Record-ID: <urn:graft:$id:vid:$v>\r\n")
      hdr.append(s"WARC-Target-URI: http://example.com/vid/$id/$v.avi\r\n")
      hdr.append(s"WARC-Date: 2020-01-01T00:00:3${v}Z\r\n")
      hdr.append("Content-Type: video/avi\r\n")
      hdr.append(s"Content-Length: ${payload.length}\r\n")
      hdr.append("\r\n")
      out.write(hdr.toString.getBytes(ascii))
      out.write(payload)
      out.write(crlf); out.write(crlf)
      v += 1
    }
    out.toByteArray
  }
}

/** Deterministic mixed text+image WARC file — see [[MediaWarcFunctions]]
  * for the layout and plants. Inputs (id: long, text: string) → binary.
  */
case class BuildMediaWarc(idExpr: Expression, textExpr: Expression)
    extends BinaryExpression
    with CodegenFallback {

  override def left: Expression = idExpr
  override def right: Expression = textExpr
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(idAny: Any, textAny: Any): Any =
    MediaWarcFunctions.fileBytes(
      idAny.asInstanceOf[Long],
      textAny.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(idExpr = l, textExpr = r)
}

/** Binary-payload WARC record walk — see [[MediaWarcFunctions]]. Returns
  * `array<struct<rec_offset, rec_type, target_uri, rec_date,
  * content_type, content_length, payload: binary>>`; NULL on structural
  * damage, empty array for an empty file (the [[WarcRecords]]
  * malformedness contract, verbatim).
  */
case class MediaWarcRecords(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType =
    ArrayType(MediaWarcFunctions.recordSchema, containsNull = false)
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
      var recType: String = null
      var uri: String = null
      var date: String = null
      var ctype: String = null
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
            case "content-type" => ctype = value
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
      val payload = java.util.Arrays.copyOfRange(b, pos, pos + clen.toInt)
      pos += clen.toInt
      if (!(b(pos) == '\r' && b(pos + 1) == '\n' && b(pos + 2) == '\r' && b(pos + 3) == '\n'))
        return null
      pos += 4
      out += InternalRow(
        recStart.toLong,
        UTF8String.fromString(recType),
        if (uri == null) null else UTF8String.fromString(uri),
        if (date == null) null else UTF8String.fromString(date),
        if (ctype == null) null else UTF8String.fromString(ctype),
        clen.toInt,
        payload)
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
