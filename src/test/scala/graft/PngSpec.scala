package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class PngSpec extends SparkSpec {
  import spark.implicits._

  private def ahashOf(bytes: Array[Byte]): Option[Long] = {
    GraftFunctions.register(spark)
    val r = Seq(Tuple1(bytes)).toDF("b")
      .select(GraftFunctions.imageAHash(col("b")).as("h"))
      .collect()(0)
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  /** Minimal PNG encoder for the spec: arbitrary pixels, selectable color
    * type (0 gray / 2 rgb) and ONE filter type applied to every scanline
    * (the filtered bytes are computed as the exact inverse of the decoder's
    * reconstruction, so a decode bug cannot cancel an encode bug unless
    * both invert the same wrong predictor).
    */
  private def encodePng(px: Array[Array[Int]], colorType: Int, filter: Int): Array[Byte] = {
    val h = px.length
    val w = px(0).length
    val bpp = if (colorType == 0) 1 else 3
    val stride = w * bpp
    val raw = new java.io.ByteArrayOutputStream()
    val prev = new Array[Int](stride)
    for (y <- 0 until h) {
      val cur = new Array[Int](stride)
      for (x <- 0 until w; c <- 0 until bpp) cur(x * bpp + c) = px(y)(x) & 0xff
      raw.write(filter)
      for (i <- 0 until stride) {
        val a = if (i >= bpp) cur(i - bpp) else 0
        val up = prev(i)
        val cc = if (i >= bpp) prev(i - bpp) else 0
        val pred = filter match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) / 2
          case 4 =>
            val p = a + up - cc
            val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - cc)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) up else cc
        }
        raw.write((cur(i) - pred) & 0xff)
      }
      System.arraycopy(cur, 0, prev, 0, stride)
    }
    val rawB = raw.toByteArray
    val z = new java.io.ByteArrayOutputStream()
    z.write(0x78); z.write(0x01)
    z.write(1) // single final stored block (spec images are tiny)
    z.write(rawB.length & 0xff); z.write((rawB.length >> 8) & 0xff)
    z.write(~rawB.length & 0xff); z.write((~rawB.length >> 8) & 0xff)
    z.write(rawB)
    val ad = new java.util.zip.Adler32(); ad.update(rawB)
    val av = ad.getValue.toInt
    z.write((av >> 24) & 0xff); z.write((av >> 16) & 0xff); z.write((av >> 8) & 0xff); z.write(av & 0xff)

    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Int) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      val t = typ.getBytes("US-ASCII")
      out.write(be32(data.length)); out.write(t); out.write(data)
      val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
      out.write(be32(crc.getValue.toInt))
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >> 24) & 0xff).toByte; ihdr(1) = ((w >> 16) & 0xff).toByte
    ihdr(2) = ((w >> 8) & 0xff).toByte; ihdr(3) = (w & 0xff).toByte
    ihdr(4) = ((h >> 24) & 0xff).toByte; ihdr(5) = ((h >> 16) & 0xff).toByte
    ihdr(6) = ((h >> 8) & 0xff).toByte; ihdr(7) = (h & 0xff).toByte
    ihdr(8) = 8; ihdr(9) = colorType.toByte
    chunk("IHDR", ihdr)
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def testPixels(w: Int, h: Int): Array[Array[Int]] =
    Array.tabulate(h, w)((y, x) => (x * 5 + y * 11 + (x * y) % 7) % 256)

  test("build_png hashes identically to build_bmp for the shared pixel formula") {
    GraftFunctions.register(spark)
    val r = spark
      .range(1, 40)
      .select(
        GraftFunctions.imageAHash(GraftFunctions.buildBmp(
          col("id"), lit(16) + (col("id") % 16).cast("int"), lit(16) + (col("id") % 12).cast("int"))).as("hb"),
        GraftFunctions.imageAHash(GraftFunctions.buildPng(
          col("id"), lit(16) + (col("id") % 16).cast("int"), lit(16) + (col("id") % 12).cast("int"))).as("hp")
      )
      .where(col("hb").isNull || col("hp").isNull || col("hb") =!= col("hp"))
      .count()
    assert(r === 0L)
  }

  test("all four non-trivial scanline filters reconstruct to the filter-0 pixels") {
    val px = testPixels(19, 13)
    val base = ahashOf(encodePng(px, colorType = 0, filter = 0))
    assert(base.nonEmpty)
    for (f <- 1 to 4) {
      val got = ahashOf(encodePng(px, colorType = 0, filter = f))
      assert(got === base, s"filter $f decode diverged from filter 0")
    }
  }

  test("RGB color type lands on the same luma as grayscale for r=g=b pixels") {
    val px = testPixels(16, 16)
    val gray = ahashOf(encodePng(px, colorType = 0, filter = 0))
    val rgb = ahashOf(encodePng(px, colorType = 2, filter = 4))
    assert(gray.nonEmpty && rgb === gray)
  }

  test("ancillary chunks (gAMA/tEXt, the real-world prelude) are skipped, pixels unchanged") {
    val b = encodePng(testPixels(16, 16), 0, 0)
    val base = ahashOf(b)
    assert(base.nonEmpty)
    // splice a gAMA chunk between IHDR (ends at 8+25) and IDAT
    def be32(v: Int) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val gamaData = be32(45455)
    val crc = new java.util.zip.CRC32()
    crc.update("gAMA".getBytes("US-ASCII")); crc.update(gamaData)
    val gama = be32(4) ++ "gAMA".getBytes("US-ASCII") ++ gamaData ++ be32(crc.getValue.toInt)
    val cut = 8 + 25 // signature + IHDR chunk (len 4 + type 4 + data 13 + crc 4)
    val spliced = b.take(cut) ++ gama ++ b.drop(cut)
    assert(ahashOf(spliced) === base)
  }

  test("corruption and unsupported shapes return NULL, never throw") {
    val good = encodePng(testPixels(16, 16), 0, 0)
    assert(ahashOf(good).nonEmpty)
    // truncated mid-IDAT
    assert(ahashOf(good.take(good.length - 20)).isEmpty)
    // interlace flag set (offset 28 in IHDR data = byte 8+4+4+12? → 16+12)
    val interlaced = good.clone(); interlaced(28) = 1
    assert(ahashOf(interlaced).isEmpty)
    // 16-bit depth
    val deep = good.clone(); deep(24) = 16
    assert(ahashOf(deep).isEmpty)
    // sub-8x8
    assert(ahashOf(encodePng(testPixels(7, 7), 0, 0)).isEmpty)
  }

  test("crafted huge-dimension header is rejected before allocating (OOM guard)") {
    // dims individually pass the 2^20 gate but multiply to ~2.1 GB of raw
    // buffer — a never-throw corpus scan must reject this from the header
    // + IDAT-length sanity check, not by attempting the allocation.
    val good = encodePng(testPixels(16, 16), 0, 0)
    val huge = good.clone()
    def putBe32(o: Int, v: Int): Unit = {
      huge(o) = ((v >> 24) & 0xff).toByte; huge(o + 1) = ((v >> 16) & 0xff).toByte
      huge(o + 2) = ((v >> 8) & 0xff).toByte; huge(o + 3) = (v & 0xff).toByte
    }
    putBe32(16, 1 << 20) // width
    putBe32(20, 2047)    // height: (1+2^20)*2047 overflows far past the cap
    val t0 = System.nanoTime()
    assert(ahashOf(huge).isEmpty)
    assert((System.nanoTime() - t0) < 30e9) // and it returns promptly
  }
}
