package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  test("synthetic media is deterministic with binary payloads of expected size") {
    def render(df: org.apache.spark.sql.DataFrame) =
      df.select(col("media_id"), col("kind"), hex(col("payload")).as("p"), col("meta"))
        .collect().sortBy(_.getLong(0)).map(_.toString).toSeq
    assert(render(Multimodal.synthetic(spark, 30)) === render(Multimodal.synthetic(spark, 30)))
    val payload = Multimodal.synthetic(spark, 1).collect()(0).getAs[Array[Byte]]("payload")
    assert(payload.length === 256) // sha2-256 hex ×8 → 256 bytes
  }

  test("byte histogram is an L1-normalized 256-bin array") {
    val out = Multimodal
      .featurize(Multimodal.synthetic(spark, 10))
      .select(col("media_id"), col("feature"))
      .collect()
    out.foreach { r =>
      val f = r.getSeq[Float](1)
      assert(f.length === 256)
      assert(math.abs(f.map(_.toDouble).sum - 1.0) < 1e-4)
    }
  }

  test("frame sampling slices payload deterministically") {
    val frames = Multimodal
      .synthetic(spark, 3)
      .select(Multimodal.sampleFrames(col("payload"), frameBytes = 16, stride = 4).as("fr"))
      .collect()
      .map(_.getSeq[Array[Byte]](0))
    assert(frames.forall(_.nonEmpty))
    assert(frames.forall(_.forall(_.length === 16)))
  }

  test("featurize stays map-only (no shuffle in the plan)") {
    val plan = Multimodal
      .featurize(Multimodal.synthetic(spark, 10))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  // --- real container-header decode (no codec library needed) ---

  /** A genuine 16 kHz mono 16-bit PCM WAV file, built byte-by-byte. */
  private def wavBytes(sampleRate: Int, channels: Int, bits: Int, nSamples: Int): Array[Byte] = {
    val bo = java.nio.ByteOrder.LITTLE_ENDIAN
    val dataSize = nSamples * channels * bits / 8
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize).order(bo)
    val byteRate = sampleRate * channels * bits / 8
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1.toShort).putShort(channels.toShort).putInt(sampleRate)
    buf.putInt(byteRate).putShort((channels * bits / 8).toShort).putShort(bits.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    (0 until dataSize).foreach(i => buf.put((i % 251).toByte))
    buf.array()
  }

  /** A genuine BMP (BITMAPINFOHEADER) file, built byte-by-byte. */
  private def bmpBytes(w: Int, h: Int): Array[Byte] = {
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("BM".getBytes("US-ASCII")).putInt(54 + dataSize).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1.toShort).putShort(24.toShort)
    buf.putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    buf.array()
  }

  test("decodeMeta parses real WAV and BMP headers; garbage decodes to NULL") {
    import spark.implicits._
    val rows = Seq(
      (1L, wavBytes(16000, 1, 16, 16000)), // exactly 1 s of audio
      (2L, bmpBytes(640, 480)),
      (3L, "definitely not media".getBytes("UTF-8")),
      (4L, wavBytes(44100, 2, 16, 22050)) // 0.5 s stereo
    ).toDF("media_id", "payload")
    val out = rows
      .select(col("media_id"), Multimodal.decodeMeta(col("payload")).as("m"))
      .orderBy("media_id")
      .collect()

    val wav = out(0).getStruct(1)
    assert(wav.getString(0) === "wav")
    assert(wav.isNullAt(1) && wav.isNullAt(2)) // no width/height for audio
    assert(wav.getInt(3) === 16000 && wav.getInt(4) === 1 && wav.getInt(5) === 16)
    assert(wav.getInt(6) === 1000)

    val bmp = out(1).getStruct(1)
    assert(bmp.getString(0) === "bmp")
    assert(bmp.getInt(1) === 640 && bmp.getInt(2) === 480)
    assert(bmp.isNullAt(3) && bmp.isNullAt(4))

    assert(out(2).isNullAt(1)) // unknown magic → NULL, no exception

    val wav2 = out(3).getStruct(1)
    assert(wav2.getInt(3) === 44100 && wav2.getInt(4) === 2 && wav2.getInt(6) === 500)
  }

  /** A genuine PNG signature + IHDR chunk, built byte-by-byte (big-endian
    * network order, as the PNG spec requires).
    */
  private def pngBytes(w: Int, h: Int, bitDepth: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(33).order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    buf.putInt(13).put("IHDR".getBytes("US-ASCII"))
    buf.putInt(w).putInt(h).put(bitDepth.toByte)
    buf.put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte) // color/comp/filter/interlace
    buf.array()
  }

  /** A genuine GIF89a logical screen descriptor (little-endian). */
  private def gifBytes(w: Int, h: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("GIF89a".getBytes("US-ASCII"))
    buf.putShort(w.toShort).putShort(h.toShort)
    buf.put(0.toByte).put(0.toByte).put(0.toByte)
    buf.array()
  }

  /** A genuine JPEG prelude: SOI, an APP0 (JFIF) segment, then SOF0 with
    * the frame dimensions — exactly the byte layout a camera file has.
    */
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(2 + 18 + 19).order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.putShort(0xffd8.toShort) // SOI
    buf.putShort(0xffe0.toShort).putShort(16.toShort) // APP0, len 16
    buf.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    buf.put(1.toByte).put(1.toByte).put(0.toByte)
    buf.putShort(72.toShort).putShort(72.toShort).put(0.toByte).put(0.toByte)
    buf.putShort(0xffc0.toShort).putShort(17.toShort) // SOF0, len 17
    buf.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    buf.put(3.toByte) // 3 components
    (1 to 3).foreach(c => buf.put(c.toByte).put(0x11.toByte).put(0.toByte))
    buf.array()
  }

  test("decodeMeta walks JPEG markers to SOF0; scan-before-frame → NULL") {
    import spark.implicits._
    val rows = Seq(
      (1L, jpegBytes(4032, 3024)),
      (2L, {
        val b = jpegBytes(8, 8); b(21) = 0xda.toByte; b // SOF marker → SOS
      })
    ).toDF("media_id", "payload")
    val out = rows
      .select(col("media_id"), Multimodal.decodeMeta(col("payload")).as("m"))
      .orderBy("media_id")
      .collect()
    val jpg = out(0).getStruct(1)
    assert(jpg.getString(0) === "jpeg")
    assert(jpg.getInt(1) === 4032 && jpg.getInt(2) === 3024)
    assert(jpg.getInt(5) === 8) // sample precision
    assert(out(1).isNullAt(1))
  }

  // --- real pixel decode: 8×8 average-hash over uncompressed BMP ---

  /** A genuine 24-bit bottom-up BMP with caller-supplied grayscale pixels
    * (gray(x, y), y = 0 at the TOP — the builder flips to file order).
    */
  private def bmpGray(w: Int, h: Int, gray: (Int, Int) => Int, topDown: Boolean = false): Array[Byte] = {
    val rowSize = (w * 3 + 3) / 4 * 4
    val buf = java.nio.ByteBuffer
      .allocate(54 + rowSize * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("BM".getBytes("US-ASCII")).putInt(54 + rowSize * h).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(if (topDown) -h else h).putShort(1.toShort).putShort(24.toShort)
    buf.putInt(0).putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val b = buf.array()
    for (fileRow <- 0 until h; x <- 0 until w) {
      val y = if (topDown) fileRow else h - 1 - fileRow
      val v = gray(x, y).toByte
      val off = 54 + fileRow * rowSize + 3 * x
      b(off) = v; b(off + 1) = v; b(off + 2) = v
    }
    b
  }

  private def ahashOf(payload: Array[Byte]): java.lang.Long = {
    import spark.implicits._
    val r = Seq(Tuple1(payload)).toDF("p")
      .select(GraftFunctions.imageAHash(col("p")))
      .collect()(0)
    if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
  }

  test("aHash golden: half-black/half-white 16x16 → 0x0F0F0F0F0F0F0F0F") {
    val hash = ahashOf(bmpGray(16, 16, (x, _) => if (x < 8) 0 else 255))
    assert(hash === 0x0f0f0f0f0f0f0f0fL)
  }

  test("aHash: uniform image → every cell at the mean → all 64 bits set") {
    assert(ahashOf(bmpGray(16, 16, (_, _) => 77)) === -1L)
  }

  test("aHash: top-down and bottom-up encodings of the same pixels agree") {
    val px = (x: Int, y: Int) => (x * 7 + y * 13) % 256
    assert(ahashOf(bmpGray(24, 16, px)) === ahashOf(bmpGray(24, 16, px, topDown = true)))
  }

  test("aHash is invariant to uniform brightness shift (mean-relative by construction)") {
    val base = (x: Int, y: Int) => if ((x / 3 + y / 3) % 2 == 0) 10 else 110
    val brighter = (x: Int, y: Int) => base(x, y) + 50
    assert(ahashOf(bmpGray(24, 24, base)) === ahashOf(bmpGray(24, 24, brighter)))
  }

  test("aHash: non-BMP, compressed, or sub-8x8 payloads → NULL, never a throw") {
    assert(ahashOf("not an image".getBytes("UTF-8")) === null)
    assert(ahashOf(pngBytes(64, 64, 8)) === null)
    assert(ahashOf(bmpGray(4, 4, (_, _) => 0)) === null)
    val corrupt = bmpGray(16, 16, (_, _) => 0).take(60) // truncated pixel data
    assert(ahashOf(corrupt) === null)
  }

  test("BuildBmp round-trip: header decodes, pixels hash to the closed-form reference") {
    import spark.implicits._
    // plain-Scala reference aHash computed straight from the pixel formula
    def refHash(id: Long, w: Int, h: Int): Long = {
      val cs = new Array[Long](64); val cn = new Array[Long](64); var tot = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val g = java.lang.Math.floorMod(id * 131 + x * 7L + y * 13L, 256L)
        val cell = (y * 8 / h) * 8 + (x * 8 / w)
        cs(cell) += g; cn(cell) += 1; tot += g
      }
      (0 until 64).foldLeft(0L) { (acc, p) =>
        if (cs(p) * w * h >= tot * cn(p)) acc | (1L << (63 - p)) else acc
      }
    }
    val rows = Seq((7L, 16, 16), (12L, 31, 27), (99L, 20, 16)).toDF("id", "w", "h")
    val out = rows
      .select(
        col("id"),
        Multimodal.decodeMeta(GraftFunctions.buildBmp(col("id"), col("w"), col("h"))).as("m"),
        GraftFunctions.imageAHash(GraftFunctions.buildBmp(col("id"), col("w"), col("h"))).as("a")
      )
      .collect()
      .map(r => (r.getLong(0), r.getStruct(1), r.getLong(2)))
    assert(out.forall(_._2.getString(0) === "bmp"))
    assert(out.map(o => (o._2.getInt(1), o._2.getInt(2))).toSeq === Seq((16, 16), (31, 27), (20, 16)))
    assert(out.map(_._3).toSeq === Seq(refHash(7, 16, 16), refHash(12, 31, 27), refHash(99, 20, 16)))
  }

  test("aHash near-dup: identical images pair at Hamming 0 through the banded join") {
    import spark.implicits._
    val sig = Seq((1L, 42L), (2L, 42L), (3L, 1000L))
      .toDF("doc_id", "bmp_id")
      .select(
        col("doc_id"),
        GraftFunctions.imageAHash(GraftFunctions.buildBmp(col("bmp_id"), lit(24), lit(20))).as("sim")
      )
    val pairs = graft.operators.Dedup.hammingPairs(sig, maxHamming = 3, idCol = "doc_id").collect()
    assert(pairs.length === 1)
    assert((pairs(0).getLong(0), pairs(0).getLong(1), pairs(0).getInt(2)) === ((1L, 2L, 0)))
  }

  test("GIF LZW round-trip: ImageAHash(BuildGif) equals ImageAHash(BuildBmp) pixel-for-pixel") {
    import spark.implicits._
    // the two synthesizers share one pixel formula, so after a REAL LZW
    // encode + decode the hashes must agree exactly — any decoder drift
    // (code width, KwKwK, clear handling, sub-block reassembly) breaks this
    val rows = Seq((7L, 16, 16), (12L, 31, 27), (99L, 20, 16), (3L, 255, 19), (0L, 300, 40))
      .toDF("id", "w", "h")
    val out = rows
      .select(
        GraftFunctions.imageAHash(GraftFunctions.buildBmp(col("id"), col("w"), col("h"))).as("bmp"),
        GraftFunctions.imageAHash(GraftFunctions.buildGif(col("id"), col("w"), col("h"))).as("gif")
      )
      .collect()
    out.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1))
      assert(r.getLong(0) === r.getLong(1))
    }
  }

  test("GIF decode: header parses, corrupt/truncated streams → NULL, never a throw") {
    import spark.implicits._
    val good = Seq((1L, 24, 20)).toDF("id", "w", "h")
      .select(GraftFunctions.buildGif(col("id"), col("w"), col("h")).as("g"))
      .collect()(0).getAs[Array[Byte]](0)
    val meta = Seq(Tuple1(good)).toDF("p")
      .select(Multimodal.decodeMeta(col("p")).as("m")).collect()(0).getStruct(0)
    assert(meta.getString(0) === "gif")
    assert(meta.getInt(1) === 24 && meta.getInt(2) === 20)

    val truncated = good.take(good.length / 2)
    val noTable = good.take(13) // screen descriptor only
    assert(ahashOf(truncated) === null)
    assert(ahashOf(noTable) === null)
  }

  test("decodeMeta parses real PNG and GIF headers; corrupt IHDR → NULL") {
    import spark.implicits._
    val rows = Seq(
      (1L, pngBytes(1920, 1080, 8)),
      (2L, gifBytes(320, 200)),
      (3L, pngBytes(1920, 1080, 8).take(20)), // truncated mid-IHDR
      (4L, {
        val b = pngBytes(4, 4, 8); b(12) = 'X'.toByte; b // wrong first chunk type
      })
    ).toDF("media_id", "payload")
    val out = rows
      .select(col("media_id"), Multimodal.decodeMeta(col("payload")).as("m"))
      .orderBy("media_id")
      .collect()

    val png = out(0).getStruct(1)
    assert(png.getString(0) === "png")
    assert(png.getInt(1) === 1920 && png.getInt(2) === 1080)
    assert(png.getInt(5) === 8) // bit depth per channel
    assert(png.isNullAt(3) && png.isNullAt(4) && png.isNullAt(6))

    val gif = out(1).getStruct(1)
    assert(gif.getString(0) === "gif")
    assert(gif.getInt(1) === 320 && gif.getInt(2) === 200)

    assert(out(2).isNullAt(1)) // truncated → NULL, no exception
    assert(out(3).isNullAt(1)) // IHDR missing → NULL
  }
}
