package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Baseline-JPEG pixel decode with no codec library: the entropy layer is
  * canonical Huffman coding over (category, extend-bits) pairs and the
  * transform is the 8×8 DCT — both fully published (ITU T.81 §F, Annex K
  * tables). This decoder implements the real baseline pipeline: marker
  * parse (DQT/DHT/SOF0/SOS, APPn/COM skip), byte-unstuffed bit reader,
  * canonical Huffman DC+AC decode with the EXTEND procedure, dequant,
  * float IDCT with level shift, MCU-grid cropping.
  *
  * Scope gates (NULL, never throw, outside them): baseline sequential
  * SOF0, 8-bit, single-component (grayscale), no restart markers, no
  * progressive. Multi-component YCbCr is a mechanical extension (three
  * interleaved MCU loops + the integer color transform) left out to keep
  * the surface reviewable.
  *
  * Exactness note for the x50 oracle: a block-CONSTANT 8×8 tile has
  * FDCT = (DC only, DC = 8·(g−128)); with quant 1 the decoder's IDCT of a
  * DC-only block is DC/8 + 128 — exact in doubles (no cosine term
  * survives) — so encode→decode round-trips bit-exactly and DuckDB can
  * recompute the pixels from the closed form. [[BuildJpeg]] emits exactly
  * such tiles through the REAL entropy pipeline (canonical Huffman codes,
  * byte stuffing, category/extend bits), so a hash match proves the
  * Huffman + IDCT walk byte-exact, the same argument as GIF's x32.
  */
private[functions] object JpegCodec {

  // ITU T.81 Annex K.3 standard luminance tables
  val dcBits: Array[Int] = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  val dcVals: Array[Int] = (0 to 11).toArray
  val acBits: Array[Int] = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  val acVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61,
    0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52,
    0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25,
    0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64,
    0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x83,
    0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99,
    0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3,
    0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8,
    0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical Huffman codes from a (bits, vals) pair: vals(i) → (code,
    * length), codes assigned in value order within increasing length —
    * the construction both T.81 sides share, so the encoder and decoder
    * cannot disagree by anything but a real bug.
    */
  def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += vals(k) -> ((code, len))
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.result()
  }

  /** (len, code) → symbol lookup for decode. */
  def decodeTable(bits: Array[Int], vals: Array[Int]): Map[(Int, Int), Int] =
    canonicalCodes(bits, vals).map { case (sym, (code, len)) => (len, code) -> sym }

  private val cosTab: Array[Double] = {
    val t = new Array[Double](64)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private val cu: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Bit reader over the entropy segment with 0xFF00 unstuffing; any
    * other marker (or EOF) ends the stream — `bit()` then returns -1.
    */
  private final class BitReader(b: Array[Byte], var off: Int) {
    private var cur = 0
    private var nbits = 0
    private var ended = false
    def bit(): Int = {
      if (nbits == 0) {
        if (ended || off >= b.length) { ended = true; return -1 }
        var v = b(off) & 0xff
        off += 1
        if (v == 0xff) {
          if (off >= b.length) { ended = true; return -1 }
          val m = b(off) & 0xff
          if (m == 0x00) off += 1 // stuffed 0xFF data byte
          else { ended = true; return -1 } // real marker: end of scan
          v = 0xff
        }
        cur = v; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { val x = bit(); if (x < 0) return -1; v = (v << 1) | x; i += 1 }
      v
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def be16(b: Array[Byte], o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  // zig-zag order: zigzag(i) = natural index of the i-th scanned coef
  val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5, 12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44,
    51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** 8×8 aHash of a baseline grayscale JPEG, or null. */
  def ahash(b: Array[Byte]): java.lang.Long = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null
    var off = 2
    var w = 0; var h = 0
    val quant = new Array[Array[Int]](4)
    // Huffman tables indexed by destination id (T.81 allows up to 4 per
    // class; wild files routinely define destination 1 for chroma even in
    // scans that never use it — clobbering a single slot decodes against
    // the wrong table).
    val dcTabs = new Array[Map[(Int, Int), Int]](4)
    val acTabs = new Array[Map[(Int, Int), Int]](4)
    var dcSel = -1
    var acSel = -1
    var qSel = -1
    var scanOff = -1
    while (scanOff < 0 && off + 4 <= b.length) {
      if ((b(off) & 0xff) != 0xff) return null
      // optional 0xFF fill bytes before a marker code (T.81 §B.1.1.2)
      while (off + 2 < b.length && (b(off + 1) & 0xff) == 0xff) off += 1
      if (off + 4 > b.length) return null
      val marker = b(off + 1) & 0xff
      val len = be16(b, off + 2)
      if (off + 2 + len > b.length) return null
      marker match {
        case 0xdb => // DQT (possibly several tables per segment)
          var o = off + 4
          while (o < off + 2 + len) {
            val pq = (b(o) & 0xff) >> 4
            val tq = b(o) & 0x0f
            if (pq != 0) return null // 16-bit tables: out of scope
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(i) = b(o + 1 + i) & 0xff; i += 1 }
            quant(tq) = t
            o += 65
          }
        case 0xc0 => // SOF0 baseline
          if ((b(off + 4) & 0xff) != 8) return null
          h = be16(b, off + 5); w = be16(b, off + 7)
          val ncomp = b(off + 9) & 0xff
          if (ncomp != 1) return null // grayscale scope
          val sampling = b(off + 11) & 0xff
          if (sampling != 0x11) return null
          qSel = b(off + 12) & 0xff
        case 0xc1 | 0xc2 | 0xc3 => return null // non-baseline SOF
        case 0xc4 => // DHT (possibly several tables per segment)
          var o = off + 4
          while (o < off + 2 + len) {
            val tc = (b(o) & 0xff) >> 4
            val th = b(o) & 0x0f
            if (tc > 1 || th > 3 || o + 17 > b.length) return null
            val bits = Array.tabulate(16)(i => b(o + 1 + i) & 0xff)
            val n = bits.sum
            if (o + 17 + n > b.length) return null
            val vals = Array.tabulate(n)(i => b(o + 17 + i) & 0xff)
            if (tc == 0) dcTabs(th) = decodeTable(bits, vals)
            else acTabs(th) = decodeTable(bits, vals)
            o += 17 + n
          }
        case 0xdd => return null // DRI/restart markers: out of scope
        case 0xda => // SOS: bind this scan's DC/AC table selectors
          if ((b(off + 4) & 0xff) != 1) return null // single-component scope
          dcSel = (b(off + 6) & 0xff) >> 4
          acSel = b(off + 6) & 0x0f
          scanOff = off + 2 + len
        case _ => () // APPn, COM, etc.: skip
      }
      off += 2 + len
    }
    if (scanOff < 0 || w < 8 || h < 8 || w > (1 << 16) || h > (1 << 16)) return null
    if (dcSel < 0 || dcSel > 3 || acSel > 3) return null
    if (dcTabs(dcSel) == null || acTabs(acSel) == null) return null
    if (qSel < 0 || qSel > 3 || quant(qSel) == null) return null
    val dcDec = dcTabs(dcSel)
    val acDec = acTabs(acSel)
    val q = quant(qSel)

    def decodeSym(r: BitReader, tab: Map[(Int, Int), Int]): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        val x = r.bit(); if (x < 0) return -1
        code = (code << 1) | x; len += 1
        tab.get((len, code)) match {
          case Some(s) => return s
          case None => ()
        }
      }
      -1
    }

    val r = new BitReader(b, scanOff)
    val acc = new AHashAcc(w, h)
    val mcuX = (w + 7) / 8
    val mcuY = (h + 7) / 8
    val coef = new Array[Int](64)
    var pred = 0
    var by = 0
    while (by < mcuY) {
      var bx = 0
      while (bx < mcuX) {
        java.util.Arrays.fill(coef, 0)
        val t = decodeSym(r, dcDec); if (t < 0 || t > 11) return null
        val dv = if (t == 0) 0 else { val v = r.bits(t); if (v < 0) return null; extend(v, t) }
        pred += dv
        coef(0) = pred * q(0)
        var k = 1
        var eob = false
        while (!eob && k < 64) {
          val rs = decodeSym(r, acDec); if (rs < 0) return null
          val run = rs >> 4; val size = rs & 0x0f
          if (size == 0) {
            if (run == 15) k += 16 // ZRL
            else eob = true
          } else {
            k += run
            if (k > 63) return null
            val v = r.bits(size); if (v < 0) return null
            coef(zigzag(k)) = extend(v, size) * q(k)
            k += 1
          }
        }
        // IDCT + level shift; DC-only blocks take the exact DC/8 path
        var onlyDc = true
        var i = 1
        while (onlyDc && i < 64) { if (coef(i) != 0) onlyDc = false; i += 1 }
        var py = 0
        while (py < 8) {
          val y = by * 8 + py
          var px = 0
          while (px < 8) {
            val x = bx * 8 + px
            if (x < w && y < h) {
              val s =
                if (onlyDc) coef(0) / 8.0
                else {
                  var acc2 = 0.0
                  var u = 0
                  while (u < 8) {
                    var v = 0
                    while (v < 8) {
                      val c = coef(v * 8 + u)
                      if (c != 0)
                        acc2 += cu(u) * cu(v) * c * cosTab(px * 8 + u) * cosTab(py * 8 + v)
                      v += 1
                    }
                    u += 1
                  }
                  acc2 / 4.0
                }
              val p = math.max(0, math.min(255, math.round(s + 128.0).toInt))
              acc.add(x, y, p)
            }
            px += 1
          }
          py += 1
        }
        bx += 1
      }
      by += 1
    }
    java.lang.Long.valueOf(acc.hash())
  }
}

/** Deterministic synthetic baseline JPEG: 8-bit grayscale, quant table all
  * ones, standard Annex K Huffman tables, and BLOCK-CONSTANT pixels
  * g(bx, by) = (id·131 + 7·bx + 13·by) mod 256 per 8×8 tile — constant
  * tiles have a DC-only FDCT (DC = 8·(g−128), exact), so the file
  * round-trips bit-exactly through the real entropy pipeline and the
  * pixel closed form is oracle-recomputable (x50). The entropy segment is
  * genuine: canonical Huffman DC codes, category/extend bits, EOB per
  * block, 0xFF byte stuffing, 1-padded flush.
  */
case class BuildJpeg(idExpr: Expression, wExpr: Expression, hExpr: Expression)
    extends TernaryExpression
    with CodegenFallback {

  override def first: Expression = idExpr
  override def second: Expression = wExpr
  override def third: Expression = hExpr
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(idAny: Any, wAny: Any, hAny: Any): Any = {
    val id = idAny.asInstanceOf[Long]
    val w = wAny.asInstanceOf[Int]
    val h = hAny.asInstanceOf[Int]
    require(w >= 8 && h >= 8 && w <= 4096 && h <= 4096, s"bad jpeg dims ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int): Unit = { out.write(0xff); out.write(marker) }
    def seg(marker: Int, data: Array[Int]): Unit = {
      m(marker)
      val len = data.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      data.foreach(v => out.write(v & 0xff))
    }
    m(0xd8) // SOI
    seg(0xdb, Array(0x00) ++ Array.fill(64)(1)) // DQT: table 0, all ones
    seg(0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff, 1, 1, 0x11, 0))
    seg(0xc4, Array(0x00) ++ JpegCodec.dcBits ++ JpegCodec.dcVals) // DHT DC
    seg(0xc4, Array(0x10) ++ JpegCodec.acBits ++ JpegCodec.acVals) // DHT AC
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS: 1 comp, tables 0/0

    val dcCodes = JpegCodec.canonicalCodes(JpegCodec.dcBits, JpegCodec.dcVals)
    val acCodes = JpegCodec.canonicalCodes(JpegCodec.acBits, JpegCodec.acVals)
    val eob = acCodes(0x00)
    var cur = 0
    var nbits = 0
    def putBits(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(cur & 0xff)
          if ((cur & 0xff) == 0xff) out.write(0x00) // byte stuffing
          cur = 0; nbits = 0
        }
        i -= 1
      }
    }
    var pred = 0
    val mcuX = (w + 7) / 8
    val mcuY = (h + 7) / 8
    var by = 0
    while (by < mcuY) {
      var bx = 0
      while (bx < mcuX) {
        val g = java.lang.Math.floorMod(id * 131 + bx * 7L + by * 13L, 256L).toInt
        val dc = 8 * (g - 128)
        val diff = dc - pred
        pred = dc
        val t = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        val (code, len) = dcCodes(t)
        putBits(code, len)
        if (t > 0) {
          val v = if (diff >= 0) diff else diff + (1 << t) - 1
          putBits(v, t)
        }
        putBits(eob._1, eob._2) // AC: straight to end-of-block
        bx += 1
      }
      by += 1
    }
    if (nbits > 0) { // flush, 1-padded
      val pad = (cur << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(pad & 0xff)
      if ((pad & 0xff) == 0xff) out.write(0x00)
    }
    m(0xd9) // EOI
    out.toByteArray
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(idExpr = f, wExpr = s, hExpr = t)
}
