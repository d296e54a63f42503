package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}

/** PNG pixel decode with no codec library: PNG's entropy coding is zlib
  * DEFLATE (RFC 1950/1951), which ships in the JDK as
  * `java.util.zip.Inflater` — so, like GIF's published LZW, "needs a codec
  * library" never applied. What a decoder must add on top of inflate is
  * the scanline filter reconstruction (PNG spec §9: None/Sub/Up/Average/
  * Paeth per row), implemented here in full.
  *
  * Scope: 8-bit-depth, non-interlaced, color types 0 (gray), 2 (RGB),
  * 4 (gray+alpha) and 6 (RGBA) — the overwhelming share of real corpora.
  * Palette (3), 16-bit and interlaced images return NULL, as does any
  * structural corruption: a corpus scan at scale WILL contain corrupt
  * files, and the contract is NULL, never throw (the [[ImageAHash]]
  * contract).
  */
private[functions] object PngCodec {

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private def isType(b: Array[Byte], o: Int, t: String): Boolean =
    b(o) == t.charAt(0).toByte && b(o + 1) == t.charAt(1).toByte &&
      b(o + 2) == t.charAt(2).toByte && b(o + 3) == t.charAt(3).toByte

  def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P'.toByte && b(2) == 'N'.toByte &&
      b(3) == 'G'.toByte && (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
      (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a

  /** 8×8 aHash of the decoded pixels, or null. Pixels fold straight into
    * an [[AHashAcc]] after per-row filter reconstruction — only two rows
    * of reconstructed bytes are live at a time.
    */
  def ahash(b: Array[Byte]): java.lang.Long = {
    if (!isPng(b)) return null
    // IHDR must be the first chunk (spec §5.6)
    if (b.length < 33 || be32(b, 8) != 13 || !isType(b, 12, "IHDR")) return null
    val w = be32(b, 16)
    val h = be32(b, 20)
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    val interlace = b(28) & 0xff
    if (w < 8 || h < 8 || w > (1 << 20) || h > (1 << 20)) return null
    if (bitDepth != 8 || interlace != 0) return null
    val bpp = colorType match {
      case 0 => 1
      case 2 => 3
      case 4 => 2
      case 6 => 4
      case _ => return null
    }
    // concatenate IDAT payloads (a valid stream may split them anywhere)
    val idat = new java.io.ByteArrayOutputStream()
    var off = 33
    var done = false
    while (!done && off + 8 <= b.length) {
      val len = be32(b, off)
      if (len < 0 || off + 12L + len > b.length) return null
      if (isType(b, off + 4, "IDAT")) idat.write(b, off + 8, len)
      else if (isType(b, off + 4, "IEND")) done = true
      off += 12 + len
    }
    // Allocation guard for a never-throw corpus-scan expression: the raw
    // buffer size comes straight from attacker-controlled header dims, so
    // (a) compute it in Long (w,h ≤ 2^20 each — the Int product overflows),
    // (b) cap total bytes at 2^26 (64 MiB ≈ a 4096×4096 RGBA frame — far
    // above any thumbnail-hash use, far below executor-OOM territory), and
    // (c) require the declared size to be reachable from the actual IDAT
    // payload: DEFLATE expands at most ~1032:1, so a tiny file declaring
    // huge dims is rejected before any allocation happens.
    val idatBytes = idat.toByteArray
    val rawLen = (1L + w.toLong * bpp) * h
    if (rawLen > (1L << 26) || rawLen > 1032L * idatBytes.length + 64) return null
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idatBytes)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return null // truncated stream
        got += n
      }
      if (got != raw.length) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()

    val stride = w * bpp
    val prev = new Array[Byte](stride) // zero row above the first scanline
    val cur = new Array[Byte](stride)
    val acc = new AHashAcc(w, h)
    var y = 0
    while (y < h) {
      val rowOff = y * (1 + stride)
      val filter = raw(rowOff) & 0xff
      var i = 0
      while (i < stride) {
        val x = raw(rowOff + 1 + i) & 0xff
        val a = if (i >= bpp) cur(i - bpp) & 0xff else 0 // left
        val up = prev(i) & 0xff // above
        val c = if (i >= bpp) prev(i - bpp) & 0xff else 0 // upper-left
        val recon = filter match {
          case 0 => x
          case 1 => x + a
          case 2 => x + up
          case 3 => x + (a + up) / 2
          case 4 =>
            // Paeth predictor (spec §9.4)
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
          case _ => return null
        }
        cur(i) = (recon & 0xff).toByte
        i += 1
      }
      var px = 0
      while (px < w) {
        val o = px * bpp
        val luma = colorType match {
          case 0 | 4 => cur(o) & 0xff
          case _ =>
            (299 * (cur(o) & 0xff) + 587 * (cur(o + 1) & 0xff) + 114 * (cur(o + 2) & 0xff)) / 1000
        }
        acc.add(px, y, luma)
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    java.lang.Long.valueOf(acc.hash())
  }
}

/** Deterministic synthetic 8-bit grayscale PNG (color type 0, filter 0 on
  * every scanline, zlib STORED blocks — no compressor involved, so the
  * bytes are bit-reproducible everywhere) with the same pixel formula as
  * [[BuildBmp]]/[[BuildGif]]: g(x, y) = (id·131 + 7x + 13y) mod 256.
  * Spec/oracle fodder: the x29/x32 closed-form aHash oracle applies
  * unchanged, and BMP/GIF/PNG of the same (id, w, h) must hash equal.
  */
case class BuildPng(idExpr: Expression, wExpr: Expression, hExpr: Expression)
    extends TernaryExpression
    with CodegenFallback {

  override def first: Expression = idExpr
  override def second: Expression = wExpr
  override def third: Expression = hExpr
  override def dataType: DataType = BinaryType

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val t = typ.getBytes("US-ASCII")
    out.write(be32(data.length))
    out.write(t)
    out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    out.write(be32(crc.getValue.toInt))
  }

  override protected def nullSafeEval(idAny: Any, wAny: Any, hAny: Any): Any = {
    val id = idAny.asInstanceOf[Long]
    val w = wAny.asInstanceOf[Int]
    val h = hAny.asInstanceOf[Int]
    require(w > 0 && h > 0 && w <= 4096 && h <= 4096, s"bad png dims ${w}x$h")
    // raw scanlines: filter byte 0 + w gray bytes per row
    val raw = new Array[Byte]((1 + w) * h)
    var y = 0
    while (y < h) {
      val rowOff = y * (1 + w)
      var x = 0
      while (x < w) {
        raw(rowOff + 1 + x) = java.lang.Math.floorMod(id * 131 + x * 7L + y * 13L, 256L).toByte
        x += 1
      }
      y += 1
    }
    // zlib stream in STORED mode: 0x78 0x01 header, stored deflate blocks,
    // big-endian adler32 — deterministic bytes, no Deflater heuristics
    val z = new java.io.ByteArrayOutputStream()
    z.write(0x78); z.write(0x01)
    var o = 0
    while (o < raw.length) {
      val n = math.min(65535, raw.length - o)
      val fin = if (o + n >= raw.length) 1 else 0
      z.write(fin)
      z.write(n & 0xff); z.write((n >> 8) & 0xff)
      z.write(~n & 0xff); z.write((~n >> 8) & 0xff)
      z.write(raw, o, n)
      o += n
    }
    val ad = new java.util.zip.Adler32()
    ad.update(raw)
    val av = ad.getValue.toInt
    z.write((av >> 24) & 0xff); z.write((av >> 16) & 0xff); z.write((av >> 8) & 0xff); z.write(av & 0xff)

    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new Array[Byte](13)
    def putBe32(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = ((v >> 24) & 0xff).toByte; a(off + 1) = ((v >> 16) & 0xff).toByte
      a(off + 2) = ((v >> 8) & 0xff).toByte; a(off + 3) = (v & 0xff).toByte
    }
    putBe32(ihdr, 0, w); putBe32(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // color type: grayscale
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", z.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(idExpr = f, wExpr = s, hExpr = t)
}
