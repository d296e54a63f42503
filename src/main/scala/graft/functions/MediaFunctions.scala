package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** L1-normalized 256-bin byte histogram of a binary payload — the cheap
  * content signature used by the multimodal operators (corrupt-file
  * detection, format clustering, near-dup blocking on media). One pass over
  * the bytes per row, map-side only.
  */
case class ByteHistogram(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val counts = new Array[Int](256)
    var i = 0
    while (i < bytes.length) {
      counts(bytes(i) & 0xff) += 1
      i += 1
    }
    val n = math.max(bytes.length, 1).toFloat
    val out = new Array[Float](256)
    var j = 0
    while (j < 256) {
      out(j) = counts(j) / n
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Shared 8×8 average-hash accumulator: pixel (x,y) → cell
  * (y·8/h, x·8/w); bit 63−(i·8+j) set iff cell (i,j)'s mean luma ≥ the
  * global mean, compared as cellSum·nTotal ≥ totalSum·nCell in exact
  * integer arithmetic so any engine recomputing from the same pixels
  * agrees bit-for-bit.
  */
private[functions] final class AHashAcc(w: Int, h: Int) {
  private val cellSum = new Array[Long](64)
  private val cellCnt = new Array[Long](64)
  private var total = 0L

  def add(x: Int, y: Int, luma: Int): Unit = {
    val cell = (y * 8 / h) * 8 + x * 8 / w
    cellSum(cell) += luma
    cellCnt(cell) += 1
    total += luma
  }

  def hash(): Long = {
    val nTotal = w.toLong * h
    var out = 0L
    var p = 0
    while (p < 64) {
      if (cellSum(p) * nTotal >= total * cellCnt(p)) out |= 1L << (63 - p)
      p += 1
    }
    out
  }
}

/** 8×8 average-hash (aHash) with REAL pixel-level decode, no codec
  * library, for the formats whose pixels are reachable with public byte
  * arithmetic:
  *   - uncompressed BMP (BI_RGB): 24/32-bit and 8-bit-palette, bottom-up
  *     and top-down row orders;
  *   - GIF87a/89a: a full LZW decoder (variable code width 3→12 bits,
  *     clear/EOI handling, the KwKwK case, interlace passes) over the
  *     global or local color table — GIF's entropy coding is exactly the
  *     published LZW algorithm, so "needs a codec library" never applied
  *     to it.
  *   - PNG (8-bit gray/RGB/gray-alpha/RGBA, non-interlaced): DEFLATE is
  *     `java.util.zip.Inflater` (in the JDK, not a codec library) plus
  *     the spec §9 scanline filter reconstruction — see [[PngCodec]].
  * Luma is integer (299R+587G+114B)/1000; see [[AHashAcc]] for the
  * exact-integer thresholding that makes the x29/x30/x32/x49 DuckDB
  * oracles possible.
  *
  * NULL for anything else (JPEG pixels need the full DCT+Huffman stack —
  * the one remaining disclosed codec stub), for sub-8×8 images, and for
  * corrupt payloads. Never throws: a corpus scan at scale WILL contain
  * corrupt files.
  *
  * Hamming distance between aHashes is the standard image near-dup
  * signal; the 64-bit output plugs directly into the 4×16-bit banded
  * Hamming join ([[graft.operators.Dedup.hammingPairs]]).
  */
case class ImageAHash(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try {
      if (b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte) bmpHash(b)
      else if (b.length >= 13 && b(0) == 'G'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte)
        gifHash(b)
      else if (PngCodec.isPng(b)) PngCodec.ahash(b)
      else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
        JpegCodec.ahash(b)
      else null
    } catch {
      case _: ArrayIndexOutOfBoundsException | _: ArithmeticException |
          _: NegativeArraySizeException => null
    }
  }

  private def bmpHash(b: Array[Byte]): Any = {
    val pixOff = le32(b, 10)
    val hdrSize = le32(b, 14)
    if (hdrSize < 40) return null
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    val bpp = le16(b, 28)
    val comp = le32(b, 30)
    if (comp != 0) return null // only BI_RGB rows are codec-free
    if (w < 8 || h < 8) return null // an aHash of fewer cells than bits is meaningless
    val bytesPerPx = bpp match {
      case 24 => 3
      case 32 => 4
      case 8  => 1
      case _  => return null
    }
    val stride = ((bpp.toLong * w + 31) / 32 * 4).toInt
    if (pixOff < 0 || pixOff.toLong + stride.toLong * h > b.length) return null
    val paletteOff = 14 + hdrSize
    if (bpp == 8 && paletteOff + 256 * 4 > pixOff) return null

    val acc = new AHashAcc(w, h)
    var y = 0
    while (y < h) {
      val fileRow = if (topDown) y else h - 1 - y
      val rowOff = pixOff + fileRow * stride
      var x = 0
      while (x < w) {
        val off = rowOff + x * bytesPerPx
        var blue, green, red = 0
        if (bpp == 8) {
          val p = paletteOff + (b(off) & 0xff) * 4
          blue = b(p) & 0xff; green = b(p + 1) & 0xff; red = b(p + 2) & 0xff
        } else {
          blue = b(off) & 0xff; green = b(off + 1) & 0xff; red = b(off + 2) & 0xff
        }
        acc.add(x, y, (299 * red + 587 * green + 114 * blue) / 1000)
        x += 1
      }
      y += 1
    }
    java.lang.Long.valueOf(acc.hash())
  }

  /** GIF: logical screen descriptor → color tables → first image
    * descriptor → LZW-decoded color indices (row-major; interlace passes
    * remapped). Returns NULL on any structural violation. Shared decode
    * machinery lives in [[GifCodec]] so the multi-frame sampler
    * ([[GifFrameHashes]]) runs the IDENTICAL decoder per frame.
    */
  private def gifHash(b: Array[Byte]): Any = {
    val hdr = GifCodec.parseHeader(b)
    if (hdr == null) return null
    val off = GifCodec.skipExtensions(b, hdr.off)
    if (off >= b.length || (b(off) & 0xff) != 0x2c) return null
    val fr = GifCodec.decodeFrame(b, off, hdr.gctOff, hdr.gctSize)
    if (fr == null) null else java.lang.Long.valueOf(fr.hash)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The GIF89a/87a decode core shared by [[ImageAHash]] (first frame) and
  * [[GifFrameHashes]] (every frame): header/color-table parse, extension
  * skipping, and a full LZW decoder (variable code width 3→12 bits,
  * clear/EOI, the KwKwK case, 4-pass interlace remapping) that folds the
  * decoded pixels straight into an [[AHashAcc]] — pixels are never
  * materialized, so a frame costs O(w·h) time and O(1) extra space beyond
  * the 4096-entry code table. All methods return null (not throw) on
  * structural corruption.
  */
private[functions] object GifCodec {

  final case class Header(gctOff: Int, gctSize: Int, off: Int)
  final case class Frame(hash: Long, nextOff: Int)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Signature + logical screen descriptor + global color table; `off`
    * points at the first block introducer after the GCT.
    */
  def parseHeader(b: Array[Byte]): Header = {
    if (b.length < 14) return null
    if (!(b(3) == '8'.toByte && (b(4) == '7'.toByte || b(4) == '9'.toByte) && b(5) == 'a'.toByte))
      return null
    val packed = b(10) & 0xff
    var off = 13
    var gctOff = -1
    var gctSize = 0
    if ((packed & 0x80) != 0) {
      gctSize = 2 << (packed & 0x07)
      gctOff = off
      off += gctSize * 3
    }
    Header(gctOff, gctSize, off)
  }

  /** Skip 0x21-introduced extension blocks (graphic control, comment,
    * application, …) to the next non-extension introducer.
    */
  def skipExtensions(b: Array[Byte], off0: Int): Int = {
    var off = off0
    while (off < b.length && (b(off) & 0xff) == 0x21) {
      off += 2 // extension introducer + label
      if (off >= b.length) return off
      var bs = b(off) & 0xff
      while (bs != 0) {
        off += 1 + bs
        if (off >= b.length) return off
        bs = b(off) & 0xff
      }
      off += 1 // block terminator
    }
    off
  }

  /** Decode one image (descriptor at `off0`, which must hold 0x2c) into
    * its 8×8 aHash; `nextOff` lands just past the frame's sub-block
    * terminator so callers can iterate frames.
    */
  def decodeFrame(b: Array[Byte], off0: Int, gctOff: Int, gctSize: Int): Frame = {
    var off = off0
    if (off + 10 > b.length) return null
    val w = le16(b, off + 5)
    val h = le16(b, off + 7)
    if (w < 8 || h < 8 || w > 4096 || h > 4096) return null
    val iPacked = b(off + 9) & 0xff
    val interlaced = (iPacked & 0x40) != 0
    off += 10
    var ctOff = gctOff
    var ctSize = gctSize
    if ((iPacked & 0x80) != 0) { // local color table wins
      ctSize = 2 << (iPacked & 0x07)
      ctOff = off
      off += ctSize * 3
    }
    if (ctOff < 0) return null

    // interlace row order: passes start 0/4/2/1 with strides 8/8/4/2
    val rowOf = new Array[Int](h)
    if (interlaced) {
      var out = 0
      for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2)); y <- start until h by step) {
        rowOf(out) = y; out += 1
      }
    } else {
      var y = 0
      while (y < h) { rowOf(y) = y; y += 1 }
    }

    if (off >= b.length) return null
    val minCodeSize = b(off) & 0xff
    off += 1
    if (minCodeSize < 2 || minCodeSize > 8) return null
    val clear = 1 << minCodeSize
    val eoi = clear + 1

    // LZW dictionary as prefix links; seq materialized per output code
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var next = eoi + 1
    var width = minCodeSize + 1
    var prev = -1
    val acc = new AHashAcc(w, h)
    val nPixels = w.toLong * h
    var emitted = 0L
    val scratch = new Array[Int](4096)

    def firstCharOf(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }
    def emitSeq(code: Int): Unit = {
      var n = 0
      var c = code
      while (c >= clear) { scratch(n) = suffix(c); n += 1; c = prefix(c) }
      scratch(n) = c; n += 1
      // scratch holds the sequence reversed
      var i = n - 1
      while (i >= 0 && emitted < nPixels) {
        val idx = scratch(i)
        val pIdx = emitted.toInt
        val x = pIdx % w
        val y = rowOf(pIdx / w)
        val co = ctOff + (if (idx < ctSize) idx else 0) * 3
        val r = b(co) & 0xff; val g = b(co + 1) & 0xff; val bl = b(co + 2) & 0xff
        acc.add(x, y, (299 * r + 587 * g + 114 * bl) / 1000)
        emitted += 1
        i -= 1
      }
    }

    // bit reader over the concatenated sub-blocks, LSB-first
    var bitBuf = 0L
    var bitCnt = 0
    var blockRemaining = 0
    var done = false
    var termSeen = false
    while (!done && emitted < nPixels) {
      while (bitCnt < width && !done) {
        if (blockRemaining == 0) {
          if (off >= b.length) return null
          blockRemaining = b(off) & 0xff
          off += 1
          if (blockRemaining == 0) { done = true; termSeen = true }
        }
        if (!done) {
          bitBuf |= (b(off) & 0xffL) << bitCnt
          bitCnt += 8
          off += 1
          blockRemaining -= 1
        }
      }
      if (!done) {
        val code = (bitBuf & ((1 << width) - 1)).toInt
        bitBuf >>>= width
        bitCnt -= width
        if (code == clear) {
          next = eoi + 1
          width = minCodeSize + 1
          prev = -1
        } else if (code == eoi) {
          done = true
        } else if (code < next) {
          emitSeq(code)
          if (prev >= 0 && next < 4096) {
            prefix(next) = prev; suffix(next) = firstCharOf(code); next += 1
            if (next == (1 << width) && width < 12) width += 1
          }
          prev = code
        } else if (code == next && prev >= 0 && next < 4096) {
          // KwKwK: sequence = seq(prev) + firstChar(prev)
          prefix(next) = prev; suffix(next) = firstCharOf(prev); next += 1
          emitSeq(next - 1)
          if (next == (1 << width) && width < 12) width += 1
          prev = next - 1
        } else return null // out-of-range code → corrupt stream
      }
    }
    if (emitted < nPixels) return null // truncated image
    // drain the sub-block chain to its terminator so nextOff is the
    // following introducer (image descriptor / extension / trailer)
    if (!termSeen) {
      off += blockRemaining
      var bs = if (off < b.length) b(off) & 0xff else return null
      while (bs != 0) {
        off += 1 + bs
        if (off >= b.length) return null
        bs = b(off) & 0xff
      }
      off += 1
    }
    Frame(acc.hash(), off)
  }
}

/** Per-frame 8×8 aHashes of an animated (or single-frame) GIF — the
  * "video frame sampling" surface for the one moving-picture format whose
  * entropy coding is public byte arithmetic: every image descriptor is
  * decoded through the SAME LZW core as [[ImageAHash]] ([[GifCodec]]) and
  * folded to one long per frame. Returns array<long> in presentation
  * order; NULL for non-GIF payloads, corrupt frames, or zero frames —
  * never throws. Frame SAMPLING (every k-th, first-n, …) then composes
  * declaratively with posexplode + a filter on the frame index, keeping
  * the decode map-only and the sampling inside codegen.
  *
  * Frames after the 1024th are not decoded (guard against adversarial
  * block chains); real corpora cap far below that.
  */
case class GifFrameHashes(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try {
      if (!(b.length >= 14 && b(0) == 'G'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte))
        return null
      val hdr = GifCodec.parseHeader(b)
      if (hdr == null) return null
      val hashes = scala.collection.mutable.ArrayBuffer.empty[Long]
      var off = hdr.off
      var done = false
      while (!done && hashes.length < 1024) {
        off = GifCodec.skipExtensions(b, off)
        if (off >= b.length || (b(off) & 0xff) == 0x3b) done = true // trailer / end
        else if ((b(off) & 0xff) == 0x2c) {
          val fr = GifCodec.decodeFrame(b, off, hdr.gctOff, hdr.gctSize)
          if (fr == null) return null
          hashes += fr.hash
          off = fr.nextOff
        } else return null // unknown introducer → corrupt
      }
      if (hashes.isEmpty) null else new GenericArrayData(hashes.toArray)
    } catch {
      case _: ArrayIndexOutOfBoundsException | _: ArithmeticException |
          _: NegativeArraySizeException => null
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Deterministic GIF89a synthesizer — the GIF twin of [[BuildBmp]]: the
  * SAME closed-form gray pixels (floorMod(id·131 + x·7 + y·13, 256))
  * through a 256-entry grayscale color table and a genuinely valid LZW
  * stream in the classic "uncompressed GIF" encoding: after each clear
  * code only literal root codes are emitted, with a fresh clear before
  * the decoder's table could force a code-width change — any conformant
  * LZW decoder (including [[ImageAHash]]'s) reproduces the pixels
  * byte-for-byte, and ImageAHash(BuildGif(id,w,h)) must equal
  * ImageAHash(BuildBmp(id,w,h)) by construction (MultimodalSpec pins it).
  */
case class BuildGif(idExpr: Expression, wExpr: Expression, hExpr: Expression)
    extends TernaryExpression
    with CodegenFallback {

  override def first: Expression = idExpr
  override def second: Expression = wExpr
  override def third: Expression = hExpr
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(idAny: Any, wAny: Any, hAny: Any): Any =
    GifBytes(
      idAny.asInstanceOf[Long],
      wAny.asInstanceOf[Int],
      hAny.asInstanceOf[Int])

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(idExpr = f, wExpr = s, hExpr = t)
}

/** The GIF89a byte layout with ONE owner — shared by [[BuildGif]] and
  * [[graft.functions.BuildMediaWarc]] (the [[BmpBytes]] arrangement,
  * applied to the LZW twin).
  */
object GifBytes {

  def apply(id: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 4096 && h <= 4096, s"bad gif dims ${w}x$h")
    val out = new java.io.ByteArrayOutputStream(w * h + 1024)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write('G'); out.write('I'); out.write('F'); out.write('8'); out.write('9'); out.write('a')
    le16(w); le16(h)
    out.write(0xf7) // GCT present, 256 entries
    out.write(0) // background index
    out.write(0) // aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 } // grayscale table
    out.write(0x2c); le16(0); le16(0); le16(w); le16(h); out.write(0) // image descriptor
    out.write(8) // LZW min code size

    // code stream: 9-bit codes LSB-first; clear every 253 literals keeps
    // the decoder's table below 512 so the width never grows
    val codes = new java.io.ByteArrayOutputStream(w * h * 9 / 8 + 16)
    var bitBuf = 0L
    var bitCnt = 0
    def putCode(c: Int): Unit = {
      bitBuf |= (c.toLong & 0x1ff) << bitCnt
      bitCnt += 9
      while (bitCnt >= 8) { codes.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8 }
    }
    putCode(256) // initial clear
    var sinceClear = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (sinceClear == 253) { putCode(256); sinceClear = 0 }
        putCode(java.lang.Math.floorMod(id * 131 + x * 7L + y * 13L, 256L).toInt)
        sinceClear += 1
        x += 1
      }
      y += 1
    }
    putCode(257) // EOI
    if (bitCnt > 0) codes.write((bitBuf & 0xff).toInt)
    val cs = codes.toByteArray
    var p = 0
    while (p < cs.length) { // sub-blocks of <=255 bytes
      val n = math.min(255, cs.length - p)
      out.write(n)
      out.write(cs, p, n)
      p += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }
}

/** Deterministic 24-bit uncompressed BMP synthesizer for the multimodal
  * test surfaces: pixel (x,y) of image `id` is the gray value
  * floorMod(id·131 + x·7 + y·13, 256) (R=G=B, so integer luma ≡ the gray
  * value), written bottom-up with BI_RGB row padding — a REAL file any BMP
  * reader decodes. Because the pixels are a closed form of (id, x, y), an
  * oracle engine can recompute the downstream aHash from the FORMULA while
  * Spark decodes the actual bytes — two independent derivations of the
  * same answer (the x29/x30 contract). Inputs: (id: long, w: int, h: int),
  * w/h clamped nowhere — callers keep them ≥8 for hashing.
  */
case class BuildBmp(idExpr: Expression, wExpr: Expression, hExpr: Expression)
    extends TernaryExpression
    with CodegenFallback {

  override def first: Expression = idExpr
  override def second: Expression = wExpr
  override def third: Expression = hExpr
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(idAny: Any, wAny: Any, hAny: Any): Any =
    BmpBytes(
      idAny.asInstanceOf[Long],
      wAny.asInstanceOf[Int],
      hAny.asInstanceOf[Int])

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(idExpr = f, wExpr = s, hExpr = t)
}

/** The BMP byte layout with ONE owner — shared by [[BuildBmp]] (the
  * standalone synthesizer expression) and
  * [[graft.functions.BuildMediaWarc]] (which embeds the same images as
  * WARC record payloads), so the closed-form pixel contract the oracles
  * replay cannot fork.
  */
object BmpBytes {

  private def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte
    b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte
    b(o + 3) = ((v >> 24) & 0xff).toByte
  }

  def apply(id: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 4096 && h <= 4096, s"bad bmp dims ${w}x$h")
    val stride = (3 * w + 3) / 4 * 4
    val size = 54 + stride * h
    val b = new Array[Byte](size)
    b(0) = 'B'.toByte; b(1) = 'M'.toByte
    putLe32(b, 2, size)
    putLe32(b, 10, 54) // pixel data offset
    putLe32(b, 14, 40) // BITMAPINFOHEADER
    putLe32(b, 18, w)
    putLe32(b, 22, h) // positive → bottom-up
    b(26) = 1 // planes
    b(28) = 24 // bpp
    putLe32(b, 30, 0) // BI_RGB
    putLe32(b, 34, stride * h)
    var fileRow = 0
    while (fileRow < h) {
      val y = h - 1 - fileRow // image row (0 = top)
      val rowOff = 54 + fileRow * stride
      var x = 0
      while (x < w) {
        val v = java.lang.Math.floorMod(id * 131 + x * 7L + y * 13L, 256L).toByte
        val off = rowOff + 3 * x
        b(off) = v; b(off + 1) = v; b(off + 2) = v
        x += 1
      }
      fileRow += 1
    }
    b
  }
}

/** REAL container-header decode for the formats that need no codec
  * library — pure byte parsing, so the "decode" step of the multimodal
  * pipeline is genuine for WAV (RIFF) and BMP (BITMAPINFOHEADER) payloads
  * and NULL for anything else (JPEG/MP4 etc. stay behind the disclosed
  * codec stub, `Multimodal.fakeDecodeMeta`).
  *
  * Returns struct(format, width, height, sample_rate, channels, bit_depth,
  * duration_ms); fields that don't apply to the format are NULL, the whole
  * struct is NULL when the payload matches no known magic. Malformed or
  * truncated headers → NULL, never an exception (a 100 TB media scan WILL
  * contain corrupt files; dropping a task over one is not acceptable).
  * One bounded header scan per row, map-side only.
  */
case class DecodeMediaMeta(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  // the decode returns NULL for unknown magic / corrupt headers even
  // when the input column is non-nullable — without this override the
  // inherited child-nullability lets codegen elide the null guard and
  // NPE on the first corrupt payload (found by the multimodal arc,
  // whose walker emits a non-nullable binary payload column)
  override def nullable: Boolean = true

  override def dataType: DataType = StructType(
    Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bit_depth", IntegerType),
      StructField("duration_ms", IntegerType)
    )
  )

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def ascii(b: Array[Byte], o: Int, s: String): Boolean =
    b.length >= o + s.length && s.indices.forall(i => b(o + i) == s.charAt(i).toByte)

  private val u = org.apache.spark.unsafe.types.UTF8String.fromString _

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (ascii(b, 0, "BM") && b.length >= 26) {
      // BITMAPINFOHEADER: header size at 14, width/height at 18/22 (LE,
      // height may be negative for top-down rows)
      val hdrSize = le32(b, 14)
      if (hdrSize >= 40 && b.length >= 26) {
        val w = le32(b, 18)
        val h = math.abs(le32(b, 22))
        if (w <= 0 || h <= 0) return null
        return InternalRow(u("bmp"), w, h, null, null, null, null)
      }
      null
    } else if (AviCodec.isAvi(b)) {
      // AVI RIFF form: LIST hdrl → avih MainAVIHeader (AviCodec)
      val m = AviCodec.meta(b)
      if (m == null) null
      else
        InternalRow(
          u("avi"),
          m(0).toInt, m(1).toInt,
          null, null, null,
          m(2).min(Int.MaxValue).toInt)
    } else if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) {
      // walk RIFF chunks for fmt (metadata) and data (duration)
      var off = 12
      var sampleRate, channels, bits, byteRate = -1
      var dataSize = -1L
      while (off + 8 <= b.length) {
        val size = le32(b, off + 4).toLong & 0xffffffffL
        if (size > Int.MaxValue - 16) return null // corrupt size field
        if (ascii(b, off, "fmt ") && off + 24 <= b.length) {
          channels = le16(b, off + 10)
          sampleRate = le32(b, off + 12)
          byteRate = le32(b, off + 16)
          bits = le16(b, off + 22)
        } else if (ascii(b, off, "data")) {
          dataSize = size
        }
        // chunks are word-aligned (odd sizes padded by one byte)
        off += 8 + size.toInt + (size.toInt & 1)
      }
      if (sampleRate <= 0 || channels <= 0 || byteRate <= 0) return null
      val durMs =
        if (dataSize >= 0) (dataSize * 1000L / byteRate).min(Int.MaxValue).toInt else null
      InternalRow(u("wav"), null, null, sampleRate, channels, bits, durMs)
    } else if (b.length >= 26 &&
      (b(0) & 0xff) == 0x89 && ascii(b, 1, "PNG") &&
      (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
      (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a) {
      // PNG: the first chunk after the signature MUST be IHDR (length 13):
      // width/height big-endian at 16/20, bit depth (per channel) at 24
      if (be32(b, 8) != 13 || !ascii(b, 12, "IHDR")) return null
      val w = be32(b, 16)
      val h = be32(b, 20)
      if (w <= 0 || h <= 0) return null
      InternalRow(u("png"), w, h, null, null, b(24) & 0xff, null)
    } else if ((ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a")) && b.length >= 10) {
      // GIF logical screen descriptor: width/height little-endian at 6/8
      val w = le16(b, 6)
      val h = le16(b, 8)
      if (w <= 0 || h <= 0) return null
      InternalRow(u("gif"), w, h, null, null, null, null)
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // JPEG: walk marker segments to the first SOFn (C0-CF minus C4/C8/CC,
      // which are huffman/arithmetic tables, not frames); height/width are
      // big-endian at payload offset 1/3, sample precision at offset 0
      var off = 2
      while (off + 9 <= b.length) {
        if ((b(off) & 0xff) != 0xff) return null // lost marker sync → corrupt
        val marker = b(off + 1) & 0xff
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
          off += 2 // standalone markers have no length field
        } else if (marker == 0xd9 || marker == 0xda) {
          return null // EOI / start-of-scan before any SOF → no frame header
        } else {
          val segLen = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
          if (segLen < 2) return null
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (off + 9 > b.length) return null
            val bits = b(off + 4) & 0xff
            val h = ((b(off + 5) & 0xff) << 8) | (b(off + 6) & 0xff)
            val w = ((b(off + 7) & 0xff) << 8) | (b(off + 8) & 0xff)
            if (w <= 0 || h <= 0) return null
            return InternalRow(u("jpeg"), w, h, null, null, bits, null)
          }
          off += 2 + segLen
        }
      }
      null // truncated before any SOF
    } else if (Mp4Codec.isMp4(b)) {
      // ISO BMFF box walk: mvhd duration, first video tkhd dims (Mp4Codec)
      val m = Mp4Codec.meta(b)
      if (m == null) null
      else
        InternalRow(
          u("mp4"),
          if (m(0) > 0) m(0).toInt else null,
          if (m(1) > 0) m(1).toInt else null,
          null, null, null,
          if (m(2) >= 0) m(2).min(Int.MaxValue).toInt else null)
    } else {
      // last: the MP3 frame-sync probe is the weakest magic (11 set bits),
      // so every stronger container signature gets first refusal above
      val m = Mp3Codec.meta(b)
      if (m == null) null
      else
        InternalRow(u("mp3"), null, null, m(0).toInt, m(1).toInt, null,
          m(2).min(Int.MaxValue).toInt)
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Deterministic MULTI-FRAME GIF89a synthesizer — the animation twin of
  * [[BuildGif]]: `frames` full-size image descriptors, each preceded by a
  * genuine graphic control extension, sharing the 256-entry grayscale
  * global color table and the same uncompressed-LZW code stream shape.
  * Frame f's pixel (x,y) is the closed form
  * floorMod(id·131 + f·37 + x·7 + y·13, 256) — at f=0 this IS the
  * [[BuildBmp]]/[[BuildGif]] formula, so frame 0's aHash must equal
  * ImageAHash(BuildBmp(id,w,h)) by construction (MultimodalSpec pins it),
  * and an oracle engine can recompute every sampled frame's hash from
  * (id, f, x, y) alone.
  */
case class BuildAnimGif(
    idExpr: Expression, wExpr: Expression, hExpr: Expression, framesExpr: Expression)
    extends QuaternaryExpression
    with CodegenFallback {

  override def first: Expression = idExpr
  override def second: Expression = wExpr
  override def third: Expression = hExpr
  override def fourth: Expression = framesExpr
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(idAny: Any, wAny: Any, hAny: Any, fAny: Any): Any = {
    val id = idAny.asInstanceOf[Long]
    val w = wAny.asInstanceOf[Int]
    val h = hAny.asInstanceOf[Int]
    val frames = fAny.asInstanceOf[Int]
    require(w > 0 && h > 0 && w <= 4096 && h <= 4096, s"bad gif dims ${w}x$h")
    require(frames > 0 && frames <= 1024, s"bad frame count $frames")
    val out = new java.io.ByteArrayOutputStream(frames * (w * h * 9 / 8) + 1024)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write('G'); out.write('I'); out.write('F'); out.write('8'); out.write('9'); out.write('a')
    le16(w); le16(h)
    out.write(0xf7) // GCT present, 256 entries
    out.write(0) // background index
    out.write(0) // aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 } // grayscale table

    var f = 0
    while (f < frames) {
      // graphic control extension: 10cs delay, no transparency, no disposal
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); le16(10); out.write(0); out.write(0)
      out.write(0x2c); le16(0); le16(0); le16(w); le16(h); out.write(0) // image descriptor
      out.write(8) // LZW min code size

      // 9-bit codes LSB-first; clear every 253 literals holds the width
      val codes = new java.io.ByteArrayOutputStream(w * h * 9 / 8 + 16)
      var bitBuf = 0L
      var bitCnt = 0
      def putCode(c: Int): Unit = {
        bitBuf |= (c.toLong & 0x1ff) << bitCnt
        bitCnt += 9
        while (bitCnt >= 8) { codes.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8 }
      }
      putCode(256) // initial clear
      var sinceClear = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          if (sinceClear == 253) { putCode(256); sinceClear = 0 }
          putCode(java.lang.Math.floorMod(id * 131 + f * 37L + x * 7L + y * 13L, 256L).toInt)
          sinceClear += 1
          x += 1
        }
        y += 1
      }
      putCode(257) // EOI
      if (bitCnt > 0) codes.write((bitBuf & 0xff).toInt)
      val cs = codes.toByteArray
      var p = 0
      while (p < cs.length) { // sub-blocks of <=255 bytes
        val n = math.min(255, cs.length - p)
        out.write(n)
        out.write(cs, p, n)
        p += n
      }
      out.write(0) // block terminator
      f += 1
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(idExpr = f, wExpr = s, hExpr = t, framesExpr = q)
}

/** Nearest-neighbor resize of a REAL uncompressed BMP payload to
  * (w2, h2), re-encoded as a 24-bit bottom-up BI_RGB BMP — the "resize"
  * verb of the multimodal pipeline, with genuine pixels on both sides:
  * output pixel (x,y) is input pixel (x·w/w2, y·h/h2) (floor division,
  * the standard NN mapping), so an oracle engine can compose the mapping
  * with a known source-pixel formula and recompute any downstream hash.
  * Supports the same decode surface as [[ImageAHash]]'s BMP path
  * (24/32-bit and 8-bit-palette, bottom-up and top-down); NULL for
  * non-BMP/compressed/corrupt payloads or unreasonable target dims —
  * never throws. Map-only, O(w2·h2) per row.
  */
case class ResizeBmp(binExpr: Expression, wExpr: Expression, hExpr: Expression)
    extends TernaryExpression
    with CodegenFallback {

  override def first: Expression = binExpr
  override def second: Expression = wExpr
  override def third: Expression = hExpr
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte
    b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte
    b(o + 3) = ((v >> 24) & 0xff).toByte
  }

  override protected def nullSafeEval(binAny: Any, wAny: Any, hAny: Any): Any = {
    val b = binAny.asInstanceOf[Array[Byte]]
    val w2 = wAny.asInstanceOf[Int]
    val h2 = hAny.asInstanceOf[Int]
    if (w2 <= 0 || h2 <= 0 || w2 > 4096 || h2 > 4096) return null
    try {
      if (!(b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte)) return null
      val pixOff = le32(b, 10)
      val hdrSize = le32(b, 14)
      if (hdrSize < 40) return null
      val w = le32(b, 18)
      val hRaw = le32(b, 22)
      val h = math.abs(hRaw)
      val topDown = hRaw < 0
      val bpp = le16(b, 28)
      val comp = le32(b, 30)
      if (comp != 0 || w <= 0 || h <= 0 || w > 4096 || h > 4096) return null
      val bytesPerPx = bpp match {
        case 24 => 3
        case 32 => 4
        case 8  => 1
        case _  => return null
      }
      val stride = ((bpp.toLong * w + 31) / 32 * 4).toInt
      if (pixOff < 0 || pixOff.toLong + stride.toLong * h > b.length) return null
      val paletteOff = 14 + hdrSize
      if (bpp == 8 && paletteOff + 256 * 4 > pixOff) return null

      val stride2 = (3 * w2 + 3) / 4 * 4
      val size2 = 54 + stride2 * h2
      val o = new Array[Byte](size2)
      o(0) = 'B'.toByte; o(1) = 'M'.toByte
      putLe32(o, 2, size2)
      putLe32(o, 10, 54)
      putLe32(o, 14, 40)
      putLe32(o, 18, w2)
      putLe32(o, 22, h2) // positive → bottom-up
      o(26) = 1 // planes
      o(28) = 24 // bpp
      putLe32(o, 30, 0) // BI_RGB
      putLe32(o, 34, stride2 * h2)
      var y2 = 0
      while (y2 < h2) {
        val ySrc = (y2.toLong * h / h2).toInt
        val srcFileRow = if (topDown) ySrc else h - 1 - ySrc
        val srcRowOff = pixOff + srcFileRow * stride
        val dstRowOff = 54 + (h2 - 1 - y2) * stride2
        var x2 = 0
        while (x2 < w2) {
          val xSrc = (x2.toLong * w / w2).toInt
          val srcOff = srcRowOff + xSrc * bytesPerPx
          var blue, green, red = 0
          if (bpp == 8) {
            val p = paletteOff + (b(srcOff) & 0xff) * 4
            blue = b(p) & 0xff; green = b(p + 1) & 0xff; red = b(p + 2) & 0xff
          } else {
            blue = b(srcOff) & 0xff; green = b(srcOff + 1) & 0xff; red = b(srcOff + 2) & 0xff
          }
          val dOff = dstRowOff + 3 * x2
          o(dOff) = blue.toByte; o(dOff + 1) = green.toByte; o(dOff + 2) = red.toByte
          x2 += 1
        }
        y2 += 1
      }
      o
    } catch {
      case _: ArrayIndexOutOfBoundsException | _: ArithmeticException |
          _: NegativeArraySizeException => null
    }
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(binExpr = f, wExpr = s, hExpr = t)
}
