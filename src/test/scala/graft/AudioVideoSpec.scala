package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Pins the round-4 audio/video surface: BuildWav → AudioPcmFeatures
  * (real PCM sample decode), BuildAnimGif → GifFrameHashes (per-frame LZW
  * decode), and ResizeBmp (decode → NN map → re-encode). Every golden value
  * is recomputed in plain Scala from the closed-form pixel/sample formulas,
  * so Spark's byte-level decode and the reference derivation are
  * independent paths to one answer — the same contract the DuckDB oracles
  * (x33/x34/x35) enforce at the gate.
  */
class AudioVideoSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  // ---- plain-Scala references ----

  /** The BuildWav sample formula (AudioFunctions.scala). */
  private def sample(id: Long, i: Int): Int =
    (java.lang.Math.floorMod(id * 7919 + i * 2657L, 4001L) - 2000L).toInt

  /** The shared pixel formula with the per-frame shift (MediaFunctions). */
  private def px(id: Long, f: Int, x: Int, y: Int): Int =
    java.lang.Math.floorMod(id * 131 + f * 37L + x * 7L + y * 13L, 256L).toInt

  /** Reference 8×8 aHash over an arbitrary gray-pixel function. */
  private def refHash(w: Int, h: Int, g: (Int, Int) => Int): Long = {
    val cs = Array.ofDim[Long](8, 8)
    val cn = Array.ofDim[Long](8, 8)
    var ts = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = g(x, y)
      cs(y * 8 / h)(x * 8 / w) += v
      cn(y * 8 / h)(x * 8 / w) += 1
      ts += v
    }
    val tn = w.toLong * h
    var hash = 0L
    for (ci <- 0 until 8; cj <- 0 until 8)
      if (cs(ci)(cj) * tn >= ts * cn(ci)(cj)) hash |= 1L << (63 - (ci * 8 + cj))
    hash
  }

  private def audioRow(payload: Array[Byte]): org.apache.spark.sql.Row = {
    import spark.implicits._
    Seq(Tuple1(payload)).toDF("p")
      .select(GraftFunctions.audioPcmFeatures(col("p")).as("f"))
      .select(col("f.*"))
      .collect()(0)
  }

  /** A hand-built PCM WAV with explicit samples (independent of BuildWav). */
  private def wav(samples: Seq[Int], rate: Int = 16000, channels: Int = 1,
      bits: Int = 16, fmtTag: Int = 1): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(fmtTag.toShort).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels * bits / 8)
      .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(s => buf.putShort(s.toShort))
    buf.array()
  }

  // ---- audio ----

  test("AudioPcmFeatures: hand-built WAV with known samples → exact stats") {
    val r = audioRow(wav(Seq(100, -50, 0, -3, 7), rate = 8000))
    assert(r.getInt(0) === 5) // n_samples
    assert(r.getInt(1) === 8000) // sample_rate
    assert(r.getLong(2) === 100L * 100 + 50 * 50 + 0 + 9 + 49) // sum_sq
    assert(r.getLong(3) === 100L + 50 + 0 + 3 + 7) // sum_abs
    assert(r.getInt(4) === 100) // peak
    // sign runs: + − 0(+) − + → changes at every step
    assert(r.getInt(5) === 4) // zero_cross
    assert(r.getLong(6) === 0L) // 5 samples at 8 kHz → 0 ms floor
  }

  test("BuildWav → AudioPcmFeatures round-trip equals the formula reference") {
    import spark.implicits._
    val rows = Seq((3L, 10000, 500), (17L, 8000, 401), (40L, 16000, 777))
      .toDF("id", "rate", "n")
      .select(
        col("id"), col("rate"), col("n"),
        GraftFunctions.audioPcmFeatures(
          GraftFunctions.buildWav(col("id"), col("rate"), col("n"))).as("f"))
      .select(col("id"), col("rate"), col("n"), col("f.*"))
      .collect()
    rows.foreach { r =>
      val (id, rate, n) = (r.getLong(0), r.getInt(1), r.getInt(2))
      val ss = (0 until n).map(sample(id, _))
      assert(r.getInt(3) === n)
      assert(r.getInt(4) === rate)
      assert(r.getLong(5) === ss.map(s => s.toLong * s).sum, s"sum_sq id=$id")
      assert(r.getLong(6) === ss.map(s => math.abs(s).toLong).sum, s"sum_abs id=$id")
      assert(r.getInt(7) === ss.map(math.abs).max, s"peak id=$id")
      assert(r.getInt(8) === ss.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)),
        s"zero_cross id=$id")
      assert(r.getLong(9) === n.toLong * 1000 / rate, s"duration_ms id=$id")
    }
  }

  test("AudioPcmFeatures: out-of-scope or corrupt payloads → NULL, never a throw") {
    def isNull(p: Array[Byte]): Boolean = {
      import spark.implicits._
      Seq(Tuple1(p)).toDF("p")
        .select(GraftFunctions.audioPcmFeatures(col("p"))).collect()(0).isNullAt(0)
    }
    assert(isNull("not audio".getBytes("UTF-8")))
    assert(isNull(wav(Seq(1, 2, 3), channels = 2))) // stereo out of scope
    assert(isNull(wav(Seq(1, 2, 3), fmtTag = 85))) // compressed (MP3 tag)
    assert(isNull(wav(Seq.empty))) // no data
    assert(isNull(wav(Seq(1, 2, 3)).take(48))) // truncated data chunk
  }

  // ---- animated GIF frames ----

  private def frameHashes(payload: Array[Byte]): Option[Seq[Long]] = {
    import spark.implicits._
    val r = Seq(Tuple1(payload)).toDF("p")
      .select(GraftFunctions.gifFrameHashes(col("p"))).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getSeq[Long](0))
  }

  private def buildAnim(id: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    import spark.implicits._
    Seq((id, w, h, frames)).toDF("id", "w", "h", "f")
      .select(GraftFunctions.buildAnimGif(col("id"), col("w"), col("h"), col("f")))
      .collect()(0).getAs[Array[Byte]](0)
  }

  test("GifFrameHashes: every frame hash equals the shifted-formula reference") {
    for ((id, w, h, nf) <- Seq((5L, 16, 16, 4), (29L, 21, 17, 3), (100L, 16, 24, 6))) {
      val hs = frameHashes(buildAnim(id, w, h, nf)).get
      assert(hs.length === nf)
      hs.zipWithIndex.foreach { case (hash, f) =>
        assert(hash === refHash(w, h, (x, y) => px(id, f, x, y)), s"id=$id frame=$f")
      }
    }
  }

  test("frame 0 of an animation == ImageAHash of the same id's BMP (shared formula)") {
    import spark.implicits._
    val rows = Seq((7L, 18, 16), (23L, 16, 20)).toDF("id", "w", "h")
      .select(
        GraftFunctions.gifFrameHashes(
          GraftFunctions.buildAnimGif(col("id"), col("w"), col("h"), lit(3))).as("fh"),
        GraftFunctions.imageAHash(
          GraftFunctions.buildBmp(col("id"), col("w"), col("h"))).as("bmp"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0).head === r.getLong(1)))
  }

  test("GifFrameHashes: single-frame BuildGif → one hash, equal to ImageAHash") {
    import spark.implicits._
    val r = Seq((11L, 16, 16)).toDF("id", "w", "h")
      .select(
        GraftFunctions.gifFrameHashes(
          GraftFunctions.buildGif(col("id"), col("w"), col("h"))).as("fh"),
        GraftFunctions.imageAHash(
          GraftFunctions.buildGif(col("id"), col("w"), col("h"))).as("one"))
      .collect()(0)
    assert(r.getSeq[Long](0) === Seq(r.getLong(1)))
  }

  test("GifFrameHashes: corrupt payloads → NULL, never a throw") {
    assert(frameHashes("GIF89a then garbage".getBytes("UTF-8")) === None)
    assert(frameHashes("not a gif at all".getBytes("UTF-8")) === None)
    assert(frameHashes(buildAnim(5L, 16, 16, 3).take(100)) === None) // truncated
  }

  // ---- BMP resize ----

  private def resizeThenHash(id: Long, w: Int, h: Int, w2: Int, h2: Int): java.lang.Long = {
    import spark.implicits._
    val r = Seq((id, w, h, w2, h2)).toDF("id", "w", "h", "w2", "h2")
      .select(GraftFunctions.imageAHash(GraftFunctions.resizeBmp(
        GraftFunctions.buildBmp(col("id"), col("w"), col("h")),
        col("w2"), col("h2"))))
      .collect()(0)
    if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
  }

  test("ResizeBmp: NN resize hashes to the composed-formula reference") {
    for ((id, w, h, w2, h2) <- Seq((4L, 20, 18, 9, 8), (31L, 16, 16, 12, 10),
        (77L, 30, 24, 8, 8))) {
      val expected =
        refHash(w2, h2, (x, y) => px(id, 0, (x.toLong * w / w2).toInt, (y.toLong * h / h2).toInt))
      assert(resizeThenHash(id, w, h, w2, h2) === expected, s"id=$id ${w}x$h→${w2}x$h2")
    }
  }

  test("ResizeBmp: identity resize preserves the aHash") {
    import spark.implicits._
    val r = Seq((13L, 16, 20)).toDF("id", "w", "h")
      .select(
        GraftFunctions.imageAHash(GraftFunctions.resizeBmp(
          GraftFunctions.buildBmp(col("id"), col("w"), col("h")), col("w"), col("h"))).as("rs"),
        GraftFunctions.imageAHash(
          GraftFunctions.buildBmp(col("id"), col("w"), col("h"))).as("orig"))
      .collect()(0)
    assert(r.getLong(0) === r.getLong(1))
  }

  test("ResizeBmp: output is itself a decodable BMP with the target dims") {
    import spark.implicits._
    val meta = Seq((9L, 24, 16)).toDF("id", "w", "h")
      .select(GraftFunctions.decodeMediaMeta(GraftFunctions.resizeBmp(
        GraftFunctions.buildBmp(col("id"), col("w"), col("h")), lit(10), lit(9))).as("m"))
      .select(col("m.format"), col("m.width"), col("m.height"))
      .collect()(0)
    assert(meta.getString(0) === "bmp")
    assert(meta.getInt(1) === 10)
    assert(meta.getInt(2) === 9)
  }

  test("ResizeBmp: non-BMP input or bad target dims → NULL, never a throw") {
    import spark.implicits._
    def isNull(c: org.apache.spark.sql.Column): Boolean =
      Seq(Tuple1(1)).toDF("x").select(c).collect()(0).isNullAt(0)
    assert(isNull(GraftFunctions.resizeBmp(lit("junk".getBytes("UTF-8")), lit(8), lit(8))))
    assert(isNull(GraftFunctions.resizeBmp(
      GraftFunctions.buildBmp(lit(1L), lit(16), lit(16)), lit(0), lit(8))))
    assert(isNull(GraftFunctions.resizeBmp(
      GraftFunctions.buildBmp(lit(1L), lit(16), lit(16)), lit(8), lit(5000))))
  }
}
