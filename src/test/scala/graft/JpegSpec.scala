package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class JpegSpec extends SparkSpec {
  import spark.implicits._

  private def ahashOf(bytes: Array[Byte]): Option[Long] = {
    GraftFunctions.register(spark)
    val r = Seq(Tuple1(bytes)).toDF("b")
      .select(GraftFunctions.imageAHash(col("b")).as("h"))
      .collect()(0)
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  private def buildBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    GraftFunctions.register(spark)
    Seq(Tuple1(id)).toDF("id")
      .select(GraftFunctions.buildJpeg(col("id"), lit(w), lit(h)).as("b"))
      .collect()(0).getAs[Array[Byte]](0)
  }

  /** Closed-form reference: block-constant pixels through the AHashAcc
    * formula, computed directly in Scala (the same arithmetic the x50
    * DuckDB oracle runs).
    */
  private def referenceHash(id: Long, w: Int, h: Int): Long = {
    val cellSum = new Array[Long](64)
    val cellCnt = new Array[Long](64)
    var total = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val g = java.lang.Math.floorMod(id * 131 + (x / 8) * 7L + (y / 8) * 13L, 256L)
      val cell = (y * 8 / h) * 8 + x * 8 / w
      cellSum(cell) += g; cellCnt(cell) += 1; total += g
    }
    var out = 0L
    for (p <- 0 until 64)
      if (cellSum(p) * w.toLong * h >= total * cellCnt(p)) out |= 1L << (63 - p)
    out
  }

  test("encode→decode→hash equals the closed-form reference across sizes") {
    for (id <- Seq(1L, 7L, 23L, 250L); (w, h) <- Seq((16, 16), (24, 16), (19, 27), (8, 8)))
      assert(ahashOf(buildBytes(id, w, h)) === Some(referenceHash(id, w, h)),
        s"id=$id ${w}x$h")
  }

  test("APPn/COM segments (the real-world JFIF/EXIF prelude) are skipped, pixels unchanged") {
    val b = buildBytes(13L, 16, 16)
    val base = ahashOf(b)
    assert(base.nonEmpty)
    // splice APP0 "JFIF" and a COM segment right after SOI, as cameras do
    val app0 = Array(0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
      .map(_.toByte)
    val com = Array(0xff, 0xfe, 0x00, 0x07, 'h', 'e', 'l', 'l', 'o').map(_.toByte)
    val spliced = b.take(2) ++ app0 ++ com ++ b.drop(2)
    assert(ahashOf(spliced) === base)
  }

  test("DHT destination-1 tables don't clobber the scan's destination-0 tables") {
    val b = buildBytes(29L, 16, 16)
    val base = ahashOf(b)
    assert(base.nonEmpty)
    // Splice a chroma-style DHT defining DC dest 1 AND AC dest 1 right
    // before SOS (as color JPEGs carry even for never-used destinations).
    // The tables are deliberately WRONG for this scan (a single 1-bit code
    // for symbol 0) — if either clobbers the dest-0 slot, decode breaks.
    val bogusBits = Array(1) ++ Array.fill(15)(0)
    val dhtDc1 = Array(0xff, 0xc4, 0x00, 0x14, 0x01) ++ bogusBits ++ Array(0x00)
    val dhtAc1 = Array(0xff, 0xc4, 0x00, 0x14, 0x11) ++ bogusBits ++ Array(0x00)
    // find SOS (0xffda) and splice before it
    var sos = -1
    var i = 2
    while (sos < 0 && i + 1 < b.length) {
      if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xda) sos = i
      i += 1
    }
    assert(sos > 0)
    val spliced = b.take(sos) ++ (dhtDc1 ++ dhtAc1).map(_.toByte) ++ b.drop(sos)
    assert(ahashOf(spliced) === base)
  }

  test("0xFF fill bytes before a marker code are skipped (T.81 §B.1.1.2)") {
    val b = buildBytes(31L, 16, 16)
    val base = ahashOf(b)
    assert(base.nonEmpty)
    // pad two fill bytes ahead of the first post-SOI marker's 0xFF
    val padded = b.take(2) ++ Array(0xff.toByte, 0xff.toByte) ++ b.drop(2)
    assert(ahashOf(padded) === base)
  }

  test("corruption and unsupported shapes return NULL, never throw") {
    val good = buildBytes(3L, 16, 16)
    assert(ahashOf(good).nonEmpty)
    assert(ahashOf(good.take(good.length / 2)).isEmpty) // truncated scan
    val progressive = good.clone()
    // SOF0 marker byte (0xc0) → progressive SOF2: find and flip
    var i = 2
    var done = false
    while (!done && i + 1 < progressive.length) {
      if ((progressive(i) & 0xff) == 0xff && (progressive(i + 1) & 0xff) == 0xc0) {
        progressive(i + 1) = 0xc2.toByte; done = true
      }
      i += 1
    }
    assert(done && ahashOf(progressive).isEmpty)
    assert(ahashOf(Array[Byte](0xff.toByte, 0xd8.toByte, 0x00, 0x00)).isEmpty)
  }

  test("decode_media_meta agrees with the decoder on the synthetic file's dimensions") {
    GraftFunctions.register(spark)
    val r = spark
      .sql("SELECT decode_media_meta(build_jpeg(5L, 24, 16)) AS m")
      .select(col("m.format"), col("m.width"), col("m.height"), col("m.bit_depth"))
      .collect()(0)
    assert(r.getString(0) === "jpeg")
    assert(r.getInt(1) === 24 && r.getInt(2) === 16 && r.getInt(3) === 8)
  }
}
