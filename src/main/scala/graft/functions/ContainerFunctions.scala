package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Real metadata walks for the two non-image container formats that
  * previously sat behind the disclosed `Multimodal.fakeDecodeMeta` stub:
  *
  *   - **MP4 / ISO BMFF** (ISO 14496-12): pure box parsing — `ftyp`
  *     recognition, top-level box walk to `moov`, `mvhd` for
  *     timescale+duration, first `trak`→`tkhd` with nonzero dims for
  *     width/height (16.16 fixed point). No entropy decode is attempted
  *     (the sample data in `mdat` needs a real codec); everything a
  *     training-data pipeline filters on — dims, duration — comes from the
  *     box tree, which is fully parseable from public spec.
  *   - **MP3** (ISO 11172-3 frame header): optional ID3v2 tag skip
  *     (syncsafe size), frame-sync validation, version/layer/bitrate/
  *     samplerate table lookup, mono/stereo from the channel mode, and a
  *     CBR duration estimate `payload_bytes·8 / kbps` — the standard
  *     header-only estimate (a VBR-exact duration needs a full frame walk
  *     or a Xing header; documented scope).
  *
  * Both walks are bounded, allocation-free scans over the input bytes:
  * NULL on anything corrupt, truncated, or out of scope — never a throw
  * (reference behavior surface: 113rajababu113-wq/eth-options-data-pipeline
  * treats malformed upstream payloads as skippable rows, main.py:189-214).
  */
private[functions] object Mp4Codec {

  private def be32(b: Array[Byte], o: Int): Long =
    (((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) |
      (b(o + 3) & 0xff)).toLong & 0xffffffffL
  private def ascii(b: Array[Byte], o: Int, s: String): Boolean =
    b.length >= o + s.length && s.indices.forall(i => b(o + i) == s.charAt(i).toByte)

  def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && ascii(b, 4, "ftyp")

  /** (width, height, durationMs) — each element -1 when absent; null when
    * the box tree is corrupt.
    */
  def meta(b: Array[Byte]): Array[Long] = {
    if (!isMp4(b)) return null
    var w = -1L; var h = -1L; var durMs = -1L
    var sawMvhd = false

    /** Walk boxes in [from, to); `visit` returns false to abort (corrupt). */
    def walk(from: Long, to: Long, depth: Int)(
        visit: (String, Long, Long) => Boolean): Boolean = {
      if (depth > 8) return false // box trees are ≤4 deep in practice
      var off = from
      while (off + 8 <= to) {
        var size = be32(b, off.toInt)
        val tpe = new String(b, off.toInt + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        var payload = off + 8
        if (size == 0) size = to - off // box extends to end of enclosing scope
        else if (size == 1) { // 64-bit largesize
          if (off + 16 > to) return false
          val hi = be32(b, off.toInt + 8); val lo = be32(b, off.toInt + 12)
          if (hi != 0) return false // >4 GiB boxes: out of scope for a meta scan
          size = lo
          payload = off + 16
        }
        if (size < payload - off || off + size > to) return false
        if (!visit(tpe, payload, off + size)) return false
        off += size
      }
      off == to
    }

    def parseMvhd(p: Long, end: Long): Boolean = {
      if (p + 4 > end) return false
      val version = b(p.toInt) & 0xff
      val (tsOff, durOff, dur64) = version match {
        case 0 => (p + 12, p + 16, false)
        case 1 => (p + 20, p + 24, true)
        case _ => return false
      }
      if (durOff + (if (dur64) 8 else 4) > end) return false
      val timescale = be32(b, tsOff.toInt)
      val duration =
        if (dur64) {
          val hi = be32(b, durOff.toInt)
          if (hi != 0) return false
          be32(b, durOff.toInt + 4)
        } else be32(b, durOff.toInt)
      if (timescale <= 0) return false
      durMs = duration * 1000L / timescale
      sawMvhd = true
      true
    }

    def parseTkhd(p: Long, end: Long): Boolean = {
      if (p + 4 > end) return false
      val version = b(p.toInt) & 0xff
      // width/height are the last 8 payload bytes (16.16 fixed), after the
      // version-dependent times + track id + reserved + layer/volume + matrix
      val wOff = version match {
        case 0 => p + 4 + 72
        case 1 => p + 4 + 84
        case _ => return false
      }
      if (wOff + 8 > end) return false
      val tw = be32(b, wOff.toInt) >> 16
      val th = be32(b, wOff.toInt + 4) >> 16
      if (w < 0 && tw > 0 && th > 0) { w = tw; h = th }
      true
    }

    val ok = walk(0, b.length.toLong, 0) { (tpe, p, end) =>
      if (tpe == "moov")
        walk(p, end, 1) {
          case ("mvhd", mp, mend) => parseMvhd(mp, mend)
          case ("trak", tp, tend) =>
            walk(tp, tend, 2) {
              case ("tkhd", kp, kend) => parseTkhd(kp, kend)
              case _ => true
            }
          case _ => true
        }
      else true
    }
    if (!ok || !sawMvhd) null else Array(w, h, durMs)
  }
}

/** Real AVI (RIFF) container metadata walk — the third container format
  * decoded from public spec (msdn AVI RIFF form): top-level RIFF chunk
  * walk to `LIST hdrl`, whose `avih` MainAVIHeader carries everything a
  * corpus scan filters on — dwMicroSecPerFrame, dwTotalFrames, dwWidth,
  * dwHeight — with duration = frames · µs/frame. Little-endian throughout
  * (RIFF), unlike BMFF's big-endian. Bounded allocation-free scan,
  * NULL-on-corrupt like [[Mp4Codec]]; frame PAYLOADS (the `movi` list)
  * need a video codec and stay out of metadata scope.
  */
private[functions] object AviCodec {

  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)).toLong & 0xffffffffL
  private def ascii(b: Array[Byte], o: Int, s: String): Boolean =
    b.length >= o + s.length && s.indices.forall(i => b(o + i) == s.charAt(i).toByte)

  def isAvi(b: Array[Byte]): Boolean =
    b.length >= 12 && ascii(b, 0, "RIFF") && ascii(b, 8, "AVI ")

  /** (width, height, durationMs) or null on corrupt/truncated/no-avih. */
  def meta(b: Array[Byte]): Array[Long] = {
    if (!isAvi(b)) return null
    val riffEnd = {
      val sz = le32(b, 4)
      val end = 8L + sz
      if (end > b.length) return null
      end
    }
    var off = 12L
    while (off + 8 <= riffEnd) {
      val size = le32(b, off.toInt + 4)
      val payload = off + 8
      if (payload + size > riffEnd) return null
      if (ascii(b, off.toInt, "LIST") && size >= 4 && ascii(b, payload.toInt, "hdrl")) {
        // sub-chunk walk inside hdrl for avih
        var sub = payload + 4
        val subEnd = payload + size
        while (sub + 8 <= subEnd) {
          val ssize = le32(b, sub.toInt + 4)
          val sp = sub + 8
          if (sp + ssize > subEnd) return null
          if (ascii(b, sub.toInt, "avih")) {
            if (ssize < 40) return null
            val usPerFrame = le32(b, sp.toInt)
            val totalFrames = le32(b, sp.toInt + 16)
            val w = le32(b, sp.toInt + 32)
            val h = le32(b, sp.toInt + 36)
            if (usPerFrame <= 0 || w <= 0 || h <= 0) return null
            return Array(w, h, totalFrames * usPerFrame / 1000L)
          }
          sub = sp + ssize + (ssize & 1L) // word alignment
        }
        return null // hdrl without avih
      }
      off = payload + size + (size & 1L)
    }
    null // no hdrl list
  }
}

private[functions] object Mp3Codec {

  // bitrate tables (kbps) indexed [1..14]; index 0 = "free" and 15 = bad,
  // both out of scope. Rows: (MPEG1 L1, L2, L3), (MPEG2/2.5 L1, L2&L3).
  private val v1l1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val v1l2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val v1l3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val v2l1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val v2l23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private val ratesV1 = Array(44100, 48000, 32000)
  private val ratesV2 = Array(22050, 24000, 16000)
  private val ratesV25 = Array(11025, 12000, 8000)

  /** Offset of the first audio frame: 0, or past the ID3v2 tag when one
    * leads the payload (syncsafe 28-bit size); -1 when the tag is corrupt.
    */
  def frameStart(b: Array[Byte]): Int = {
    if (b.length >= 10 && b(0) == 'I'.toByte && b(1) == 'D'.toByte && b(2) == '3'.toByte) {
      if ((b(6) | b(7) | b(8) | b(9)) < 0) return -1 // syncsafe bytes have bit 7 clear
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) | ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      val start = 10 + size
      if (start + 4 > b.length) -1 else start
    } else 0
  }

  /** (sampleRate, channels, durationMs) or null. */
  def meta(b: Array[Byte]): Array[Long] = {
    val start = frameStart(b)
    if (start < 0 || start + 4 > b.length) return null
    if ((b(start) & 0xff) != 0xff || (b(start + 1) & 0xe0) != 0xe0) return null
    val b1 = b(start + 1) & 0xff
    val b2 = b(start + 2) & 0xff
    val b3 = b(start + 3) & 0xff
    val versionBits = (b1 >> 3) & 3 // 3=MPEG1 2=MPEG2 0=MPEG2.5 1=reserved
    val layerBits = (b1 >> 1) & 3 // 3=L1 2=L2 1=L3 0=reserved
    if (versionBits == 1 || layerBits == 0) return null
    val brIdx = (b2 >> 4) & 0xf
    val srIdx = (b2 >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return null
    val kbps = (versionBits, layerBits) match {
      case (3, 3) => v1l1(brIdx)
      case (3, 2) => v1l2(brIdx)
      case (3, 1) => v1l3(brIdx)
      case (_, 3) => v2l1(brIdx)
      case _ => v2l23(brIdx)
    }
    val rate = versionBits match {
      case 3 => ratesV1(srIdx)
      case 2 => ratesV2(srIdx)
      case _ => ratesV25(srIdx)
    }
    val channels = if (((b3 >> 6) & 3) == 3) 1L else 2L
    // Xing/Info VBR tag probe (the LAME/Fraunhofer convention): the tag
    // sits in the first frame right after the side info — MPEG1: 17 B
    // mono / 32 B stereo; MPEG2/2.5: 9 / 17 — as 'Xing' (VBR) or 'Info'
    // (CBR written by VBR-capable encoders), 4 BE flag bytes, then the
    // flagged fields in order, frames first. With the frames field
    // present the duration is EXACT: frames · samples-per-frame / rate
    // (L1: 384; L2: 1152; L3: 1152 MPEG1, 576 MPEG2/2.5) — the fix for
    // VBR files where the CBR byte-length estimate below can be
    // arbitrarily wrong.
    val sideInfo = (versionBits, channels) match {
      case (3, 1L) => 17
      case (3, _) => 32
      case (_, 1L) => 9
      case _ => 17
    }
    val x = start + 4 + sideInfo
    // the Xing/Info convention exists only for Layer III (layerBits 1):
    // the side-info offsets above are Layer-III structures, so probing a
    // Layer I/II stream would read arbitrary audio payload where a chance
    // 'Xing' match yields a bogus frame count — gate the probe on layer.
    if (layerBits == 1 && x + 8 <= b.length &&
      ((b(x) == 'X' && b(x + 1) == 'i' && b(x + 2) == 'n' && b(x + 3) == 'g') ||
        (b(x) == 'I' && b(x + 1) == 'n' && b(x + 2) == 'f' && b(x + 3) == 'o'))) {
      val flags = ((b(x + 4) & 0xff) << 24) | ((b(x + 5) & 0xff) << 16) |
        ((b(x + 6) & 0xff) << 8) | (b(x + 7) & 0xff)
      if ((flags & 1) != 0 && x + 12 <= b.length) {
        val frames = ((b(x + 8) & 0xffL) << 24) | ((b(x + 9) & 0xffL) << 16) |
          ((b(x + 10) & 0xffL) << 8) | (b(x + 11) & 0xffL)
        val spf = layerBits match {
          case 3 => 384L
          case 2 => 1152L
          case _ => if (versionBits == 3) 1152L else 576L
        }
        return Array(rate.toLong, channels, frames * spf * 1000L / rate)
      }
      // tag present but frames field absent/truncated: fall through to
      // the CBR estimate rather than failing the whole decode
    }
    // CBR estimate from the audio payload size; header-only by design (a
    // VBR-exact duration needs the Xing frames field above or a full
    // frame walk).
    val durMs = (b.length - start).toLong * 8L / kbps
    Array(rate.toLong, channels, durMs)
  }
}

/** Deterministic minimal ISO-BMFF file: `ftyp` + `moov(mvhd + trak(tkhd))`
  * + a tiny `mdat`. Timescale is fixed at 1000, so the mvhd duration field
  * IS the requested milliseconds; width/height land in tkhd as 16.16 fixed
  * point. Any conformant BMFF parser recovers exactly (w, h, durMs), and
  * an oracle engine recomputes them from the id closed form alone — the
  * x29/x33 encode→decode→verify contract applied to the video container.
  */
case class BuildMp4(wExpr: Expression, hExpr: Expression, durExpr: Expression)
    extends TernaryExpression
    with CodegenFallback {

  override def first: Expression = wExpr
  override def second: Expression = hExpr
  override def third: Expression = durExpr
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(wAny: Any, hAny: Any, durAny: Any): Any = {
    val w = wAny.asInstanceOf[Int]
    val h = hAny.asInstanceOf[Int]
    val durMs = durAny.asInstanceOf[Int]
    require(w > 0 && w <= 65535 && h > 0 && h <= 65535, s"bad mp4 dims ${w}x$h")
    require(durMs >= 0, s"bad mp4 duration $durMs")
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def ascii(s: String): Unit = s.foreach(c => out.write(c.toInt))
    def zeros(n: Int): Unit = (0 until n).foreach(_ => out.write(0))

    // ftyp (20)
    be32(20); ascii("ftyp"); ascii("isom"); be32(0x200); ascii("isom")
    // moov = 8 + mvhd(108) + trak(8 + tkhd(92)) = 216
    be32(216); ascii("moov")
    // mvhd v0 (108): vf, creation, modification, timescale, duration,
    // rate 1.0, volume 1.0, 10 reserved, unity matrix, 24 predefined,
    // next_track_ID
    be32(108); ascii("mvhd")
    be32(0) // version 0 + flags
    be32(0); be32(0) // creation/modification
    be32(1000) // timescale: 1 unit = 1 ms
    be32(durMs.toLong)
    be32(0x00010000); out.write(1); out.write(0) // rate 1.0, volume 1.0
    zeros(10)
    be32(0x00010000); be32(0); be32(0) // unity matrix
    be32(0); be32(0x00010000); be32(0)
    be32(0); be32(0); be32(0x40000000)
    zeros(24)
    be32(2) // next track id
    // trak (100)
    be32(100); ascii("trak")
    // tkhd v0 (92): vf(track enabled), creation, modification, track id,
    // reserved, duration, 8 reserved, layer+group, volume+reserved, matrix,
    // width/height 16.16
    be32(92); ascii("tkhd")
    be32(7) // version 0, flags: enabled|in-movie|in-preview
    be32(0); be32(0) // creation/modification
    be32(1) // track id
    be32(0) // reserved
    be32(durMs.toLong)
    zeros(8)
    be32(0) // layer + alternate group
    be32(0) // volume + reserved (video track: 0)
    be32(0x00010000); be32(0); be32(0) // unity matrix
    be32(0); be32(0x00010000); be32(0)
    be32(0); be32(0); be32(0x40000000)
    be32(w.toLong << 16)
    be32(h.toLong << 16)
    // mdat: 8 deterministic payload bytes (no real samples — metadata scope)
    be32(16); ascii("mdat")
    var i = 0
    while (i < 8) { out.write((w * 31 + h * 17 + durMs + i) & 0xff); i += 1 }
    out.toByteArray
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(wExpr = f, hExpr = s, durExpr = t)
}

/** Deterministic minimal AVI: `RIFF('AVI ' LIST hdrl(avih, LIST
  * strl(strh 'vids', strf BITMAPINFOHEADER)), LIST movi('00db' payload))`
  * at a fixed 25 fps (dwMicroSecPerFrame = 40000), so durationMs is
  * exactly `frames · 40` — a closed form an oracle engine recomputes from
  * the inputs alone. The stream headers are genuine (a conformant AVI
  * parser accepts the file); frame payloads are 8 deterministic bytes
  * (metadata scope — no codec).
  */
/** [[BuildAvi]]'s multi-frame twin: the same genuine RIFF/hdrl/strl
  * structure, but the movi list carries one '00dc' chunk PER FRAME with a
  * 24-byte deterministic payload — frame f's byte i is
  * `(w·31 + h·17 + f·7 + i·13) mod 256` — so a frame-sampling decoder's
  * per-frame checksums are a closed form of (w, h, f) alone and an
  * oracle can recompute every sampled frame without touching bytes
  * (the BuildAnimGif contract on the AVI container). BuildAvi itself is
  * left untouched as the x69 metadata fixture.
  */
case class BuildAviFrames(wExpr: Expression, hExpr: Expression, framesExpr: Expression)
    extends TernaryExpression
    with CodegenFallback {

  override def first: Expression = wExpr
  override def second: Expression = hExpr
  override def third: Expression = framesExpr
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(wAny: Any, hAny: Any, fAny: Any): Any =
    AviFramesBytes(
      wAny.asInstanceOf[Int], hAny.asInstanceOf[Int],
      fAny.asInstanceOf[Int], seed = 0L)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(wExpr = f, hExpr = s, framesExpr = t)
}

/** The shared multi-frame AVI synthesis core — one place owns the RIFF
  * byte layout so [[BuildAviFrames]] (the standalone x89 surface) and
  * the multimodal container ([[MediaWarcFunctions]]) cannot drift.
  * Frame f's payload byte i is `(seed·41 + w·31 + h·17 + f·7 + i·13)
  * mod 256`; `seed = 0` yields BuildAviFrames' historical bytes
  * verbatim, a non-zero seed gives each container video its own
  * content while keeping every checksum a closed form of
  * (seed, w, h, f) alone. File size is exactly 224 + 32·frames bytes
  * (12 RIFF head + 200 hdrl list + 12 movi head + 32 per frame) —
  * the byte-mass closed form the CDX/funnel oracles re-derive.
  */
object AviFramesBytes {

  def apply(w: Int, h: Int, frames: Int, seed: Long): Array[Byte] = {
    require(w > 0 && w <= 65535 && h > 0 && h <= 65535, s"bad avi dims ${w}x$h")
    require(frames > 0 && frames <= 4096, s"bad avi frame count $frames")
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def ascii(s: String): Unit = s.foreach(c => out.write(c.toInt))

    val moviSize = 4 + frames * (8 + 24) // 'movi' + per-frame (hdr + payload)
    val riffSize = 4 + (8 + 192) + (8 + moviSize)
    ascii("RIFF"); le32(riffSize.toLong); ascii("AVI ")
    ascii("LIST"); le32(192); ascii("hdrl")
    ascii("avih"); le32(56)
    le32(40000) // 25 fps
    le32(0); le32(0); le32(0)
    le32(frames.toLong)
    le32(0); le32(1); le32(0)
    le32(w.toLong); le32(h.toLong)
    le32(0); le32(0); le32(0); le32(0)
    ascii("LIST"); le32(116); ascii("strl")
    ascii("strh"); le32(56)
    ascii("vids"); ascii("DIB ")
    le32(0); le16(0); le16(0); le32(0)
    le32(1); le32(25); le32(0)
    le32(frames.toLong)
    le32(0); le32(0); le32(0)
    le16(0); le16(0); le16(w); le16(h)
    ascii("strf"); le32(40)
    le32(40); le32(w.toLong); le32(h.toLong)
    le16(1); le16(24)
    le32(0); le32(w.toLong * h * 3)
    le32(0); le32(0); le32(0); le32(0)
    ascii("LIST"); le32(moviSize.toLong); ascii("movi")
    var f = 0
    while (f < frames) {
      ascii("00dc"); le32(24)
      var i = 0
      while (i < 24) {
        out.write(((seed * 41 + w * 31 + h * 17 + f * 7 + i * 13) % 256).toInt)
        i += 1
      }
      f += 1
    }
    out.toByteArray
  }
}

/** AVI frame SAMPLING — the x34 video-frame-sampling verb on the RIFF
  * container ([[GifFrameHashes]]' sibling): walk the movi list's
  * '00dc'/'00db' chunks and, for every `stride`-th frame, emit the
  * payload checksum Σ byte_i·(i+1) (position-weighted so byte
  * transpositions change it; exact BIGINT, oracle-replayable). Returns
  * the sampled checksums in frame order — frame index of element p is
  * p·stride by construction. NULL on anything corrupt (bad magic, no
  * movi, truncated chunk), never a throw; a well-formed movi with zero
  * sampled frames yields an EMPTY array (valid-but-nothing ≠ corrupt);
  * bounded by a 4096-chunk cap.
  */
case class AviFrameChecksums(child: Expression, strideExpr: Expression)
    extends BinaryExpression
    with CodegenFallback {

  override def left: Expression = child
  override def right: Expression = strideExpr
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any, sAny: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val stride = sAny.asInstanceOf[Int]
    if (stride < 1) return null
    def le32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) | ((b(o + 2) & 0xffL) << 16) |
        ((b(o + 3) & 0xffL) << 24)
    def fourcc(o: Int): String =
      new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "US-ASCII")
    try {
      if (b.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return null
      val end = math.min(b.length.toLong, 8L + le32(4))
      // top-level walk to LIST 'movi'
      var off = 12L
      var moviOff = -1L
      var moviEnd = -1L
      while (moviOff < 0 && off + 8 <= end) {
        val id = fourcc(off.toInt)
        val size = le32(off.toInt + 4)
        if (id == "LIST" && off + 12 <= end && fourcc(off.toInt + 8) == "movi") {
          moviOff = off + 12
          moviEnd = math.min(end, off + 8 + size)
        }
        off += 8 + size + (size & 1) // RIFF chunks pad to even
      }
      if (moviOff < 0) return null
      val sums = scala.collection.mutable.ArrayBuffer.empty[Long]
      var p = moviOff
      var frame = 0
      while (p + 8 <= moviEnd && frame < 4096) {
        val id = fourcc(p.toInt)
        val size = le32(p.toInt + 4)
        if (p + 8 + size > moviEnd) return null // truncated chunk
        if (id == "00dc" || id == "00db") {
          if (frame % stride == 0) {
            var s = 0L
            var i = 0
            while (i < size) { s += (b((p + 8 + i).toInt) & 0xffL) * (i + 1); i += 1 }
            sums += s
          }
          frame += 1
        }
        p += 8 + size + (size & 1)
      }
      // a well-formed movi with zero sampled dc/db chunks is NOT corrupt:
      // an empty array distinguishes "valid but nothing to sample" from
      // the NULL that structural damage returns
      new GenericArrayData(sums.toArray)
    } catch {
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(child = l, strideExpr = r)
}

case class BuildAvi(wExpr: Expression, hExpr: Expression, framesExpr: Expression)
    extends TernaryExpression
    with CodegenFallback {

  override def first: Expression = wExpr
  override def second: Expression = hExpr
  override def third: Expression = framesExpr
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(wAny: Any, hAny: Any, fAny: Any): Any = {
    val w = wAny.asInstanceOf[Int]
    val h = hAny.asInstanceOf[Int]
    val frames = fAny.asInstanceOf[Int]
    require(w > 0 && w <= 65535 && h > 0 && h <= 65535, s"bad avi dims ${w}x$h")
    require(frames > 0 && frames <= (1 << 20), s"bad avi frame count $frames")
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def ascii(s: String): Unit = s.foreach(c => out.write(c.toInt))

    // strl = 'strl' + strh(8+56) + strf(8+40) = 116; hdrl = 'hdrl' +
    // avih(8+56) + LIST strl(8+116) = 192; movi = 'movi' + 00db(8+8) = 20;
    // riff payload = 'AVI ' + LIST hdrl(8+192) + LIST movi(8+20) = 232
    ascii("RIFF"); le32(232); ascii("AVI ")
    ascii("LIST"); le32(192); ascii("hdrl")
    ascii("avih"); le32(56)
    le32(40000) // dwMicroSecPerFrame: 25 fps
    le32(0); le32(0); le32(0) // maxBytesPerSec, padding, flags
    le32(frames.toLong) // dwTotalFrames
    le32(0) // initialFrames
    le32(1) // dwStreams
    le32(0) // suggestedBufferSize
    le32(w.toLong); le32(h.toLong)
    le32(0); le32(0); le32(0); le32(0) // reserved
    ascii("LIST"); le32(116); ascii("strl")
    ascii("strh"); le32(56)
    ascii("vids"); ascii("DIB ")
    le32(0) // flags
    le16(0); le16(0) // priority, language
    le32(0) // initialFrames
    le32(1); le32(25) // scale, rate: 25 fps
    le32(0) // start
    le32(frames.toLong) // length in frames
    le32(0); le32(0) // bufferSize, quality
    le32(0) // sampleSize
    le16(0); le16(0); le16(w); le16(h) // rcFrame
    ascii("strf"); le32(40)
    le32(40); le32(w.toLong); le32(h.toLong)
    le16(1); le16(24) // planes, bitcount
    le32(0); le32(w.toLong * h * 3) // compression BI_RGB, sizeImage
    le32(0); le32(0); le32(0); le32(0) // resolutions, colors
    ascii("LIST"); le32(20); ascii("movi")
    ascii("00db"); le32(8)
    var i = 0
    while (i < 8) { out.write((w * 31 + h * 17 + frames + i) & 0xff); i += 1 }
    out.toByteArray
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(wExpr = f, hExpr = s, framesExpr = t)
}

/** Deterministic minimal MP3: an ID3v2 tag of `tagBytes` filler (exercising
  * the real-world tag skip) followed by `nFrames` MPEG1 Layer III CBR
  * frames at 128 kbps / 44.1 kHz mono (frame length 144·128000/44100 = 417
  * bytes, padding 0). Frame body bytes are a closed form of (id, position),
  * so the file is fully deterministic; the header-only duration estimate is
  * exactly `nFrames·417·8/128` ms, integer math an oracle engine replays.
  */
case class BuildMp3(idExpr: Expression, framesExpr: Expression, tagExpr: Expression)
    extends TernaryExpression
    with CodegenFallback {

  override def first: Expression = idExpr
  override def second: Expression = framesExpr
  override def third: Expression = tagExpr
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(idAny: Any, nAny: Any, tagAny: Any): Any = {
    val id = idAny.asInstanceOf[Long]
    val nFrames = nAny.asInstanceOf[Int]
    val tagBytes = tagAny.asInstanceOf[Int]
    require(nFrames > 0 && nFrames <= 65536, s"bad frame count $nFrames")
    require(tagBytes >= 0 && tagBytes < (1 << 21), s"bad tag size $tagBytes")
    val frameLen = 417 // 144 * 128000 / 44100, padding bit 0
    val b = new Array[Byte](10 + tagBytes + nFrames * frameLen)
    // ID3v2.3 header with syncsafe size
    b(0) = 'I'; b(1) = 'D'; b(2) = '3'; b(3) = 3; b(4) = 0; b(5) = 0
    b(6) = ((tagBytes >> 21) & 0x7f).toByte
    b(7) = ((tagBytes >> 14) & 0x7f).toByte
    b(8) = ((tagBytes >> 7) & 0x7f).toByte
    b(9) = (tagBytes & 0x7f).toByte
    var i = 0
    while (i < tagBytes) { b(10 + i) = ((id * 37 + i * 11) & 0x7f).toByte; i += 1 }
    var f = 0
    while (f < nFrames) {
      val o = 10 + tagBytes + f * frameLen
      b(o) = 0xff.toByte // sync
      b(o + 1) = 0xfb.toByte // sync|MPEG1|Layer III|no CRC
      b(o + 2) = 0x90.toByte // bitrate idx 9 (128k), 44.1 kHz, no padding
      b(o + 3) = 0xc0.toByte // mono
      var j = 4
      while (j < frameLen) {
        b(o + j) = ((id * 131 + f * 37 + j * 7) & 0xff).toByte
        j += 1
      }
      f += 1
    }
    b
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(idExpr = f, framesExpr = s, tagExpr = t)
}

/** Deterministic GENUINELY-VBR MP3 synthesizer — the [[BuildMp3]] twin
  * whose audio frames ALTERNATE bitrates (even: 128 kbps / 417 B, odd:
  * 64 kbps / 208 B, each with its own correct frame header), led by a
  * Xing frame (417 B, zeroed side info, 'Xing' at the MPEG1-mono offset
  * 4 + 17, flags = 0x1, frame count big-endian = the `frames` audio
  * frames that follow, excluding the Xing frame itself — the LAME
  * convention). The CBR byte-length estimate is provably wrong on this
  * payload (mixed frame sizes); the Xing path recovers duration exactly:
  * frames · 1152 · 1000 / 44100 ms, a closed form an oracle recomputes
  * from (id) alone. Same optional leading ID3v2 tag as BuildMp3.
  */
case class BuildMp3Vbr(idExpr: Expression, framesExpr: Expression, tagExpr: Expression)
    extends TernaryExpression
    with CodegenFallback {

  override def first: Expression = idExpr
  override def second: Expression = framesExpr
  override def third: Expression = tagExpr
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(idAny: Any, nAny: Any, tagAny: Any): Any = {
    val id = idAny.asInstanceOf[Long]
    val nFrames = nAny.asInstanceOf[Int]
    val tagBytes = tagAny.asInstanceOf[Int]
    require(nFrames > 0 && nFrames <= 65536, s"bad frame count $nFrames")
    require(tagBytes >= 0 && tagBytes < (1 << 21), s"bad tag size $tagBytes")
    val big = 417 // 144 * 128000 / 44100
    val small = 208 // 144 * 64000 / 44100
    val audio = (nFrames + 1) / 2 * big + nFrames / 2 * small
    val b = new Array[Byte](10 + tagBytes + big + audio)
    b(0) = 'I'; b(1) = 'D'; b(2) = '3'; b(3) = 3; b(4) = 0; b(5) = 0
    b(6) = ((tagBytes >> 21) & 0x7f).toByte
    b(7) = ((tagBytes >> 14) & 0x7f).toByte
    b(8) = ((tagBytes >> 7) & 0x7f).toByte
    b(9) = (tagBytes & 0x7f).toByte
    var i = 0
    while (i < tagBytes) { b(10 + i) = ((id * 37 + i * 11) & 0x7f).toByte; i += 1 }
    // Xing frame: 128k header, zeroed side info, tag at 4 + 17
    var o = 10 + tagBytes
    b(o) = 0xff.toByte; b(o + 1) = 0xfb.toByte; b(o + 2) = 0x90.toByte; b(o + 3) = 0xc0.toByte
    val x = o + 21
    b(x) = 'X'; b(x + 1) = 'i'; b(x + 2) = 'n'; b(x + 3) = 'g'
    b(x + 7) = 1 // flags: frames field only
    b(x + 8) = ((nFrames >> 24) & 0xff).toByte
    b(x + 9) = ((nFrames >> 16) & 0xff).toByte
    b(x + 10) = ((nFrames >> 8) & 0xff).toByte
    b(x + 11) = (nFrames & 0xff).toByte
    o += big
    var f = 0
    while (f < nFrames) {
      val len = if (f % 2 == 0) big else small
      b(o) = 0xff.toByte
      b(o + 1) = 0xfb.toByte
      b(o + 2) = (if (f % 2 == 0) 0x90 else 0x50).toByte // brIdx 9 / 5, 44.1 kHz
      b(o + 3) = 0xc0.toByte // mono
      var j = 4
      while (j < len) {
        b(o + j) = ((id * 131 + f * 37 + j * 7) & 0xff).toByte
        j += 1
      }
      o += len
      f += 1
    }
    b
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(idExpr = f, framesExpr = s, tagExpr = t)
}
