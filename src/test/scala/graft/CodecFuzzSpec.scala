package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Codec fuzz property (round-13 verdict #6): the NULL-never-throw
  * contract was pinned on STRUCTURED corruptions (truncation at a chunk
  * boundary, wrong magic); this spec drives every byte decoder with
  * adversarially unstructured input —
  *
  *   1. pure random bytes (lengths 0‥2 KiB, plus the 0/1/8-byte edge),
  *   2. single random bit-flips of VALID files from the engine's own
  *      builders (the header stays plausible, the body lies),
  *   3. random-offset truncations of those valid files,
  *
  * ≥1000 cases per decoder, every payload through EVERY decoder
  * (cross-format bytes are exactly what a crawl hands a classifier).
  * Deterministically seeded so a failure reproduces. The property:
  * evaluation COMPLETES (no executor throw) — each decode is NULL or a
  * valid value — plus the non-vacuity check that the unmutated originals
  * still decode non-NULL where their format owns the decoder.
  */
class CodecFuzzSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private val seed = 20260815L

  /** One valid file per (builder, variant): collected once, mutated on
    * the driver, decoded distributed.
    */
  private lazy val validFiles: Seq[Array[Byte]] = {
    val df = Seq(1L, 2L).toDF("id")
    val cols = Seq(
      GraftFunctions.buildBmp(col("id"), lit(16), lit(12)),
      GraftFunctions.buildGif(col("id"), lit(16), lit(12)),
      GraftFunctions.buildPng(col("id"), lit(16), lit(12)),
      GraftFunctions.buildJpeg(col("id"), lit(16), lit(16)),
      GraftFunctions.buildAnimGif(col("id"), lit(8), lit(8), lit(3)),
      GraftFunctions.buildWav(col("id"), lit(8000), lit(256)),
      GraftFunctions.buildMp3(col("id"), lit(5), lit(64)),
      GraftFunctions.buildMp3Vbr(col("id"), lit(5), lit(64)),
      GraftFunctions.buildMp4(lit(16), lit(12), lit(1000)),
      GraftFunctions.buildAviFrames(lit(8), lit(8), lit(3)),
      GraftFunctions.buildWarc(col("id"), lit("fuzz corpus page text")),
      GraftFunctions.buildMediaWarc(col("id"), lit("fuzz corpus page text")),
      GraftFunctions.buildWarcGz(col("id"), lit("fuzz corpus page text")),
      GraftFunctions.buildTar(col("id"), lit("fuzz corpus page text")))
    df.select(array(cols: _*).as("fs"))
      .collect()
      .flatMap(_.getSeq[Array[Byte]](0))
      .toSeq
  }

  private lazy val payloads: Seq[Array[Byte]] = {
    val rnd = new scala.util.Random(seed)
    def randomBytes(n: Int): Array[Byte] = {
      val a = new Array[Byte](n); rnd.nextBytes(a); a
    }
    // class 1: pure random — 1040 cases incl. degenerate lengths
    val random = Seq(0, 1, 2, 4, 8).map(randomBytes) ++
      (1 to 1035).map(_ => randomBytes(1 + rnd.nextInt(2048)))
    // class 2: single random bit-flips of valid files — 28 files × 40
    val mutants = validFiles.flatMap { f =>
      (1 to 40).map { _ =>
        val c = f.clone()
        val i = rnd.nextInt(c.length)
        c(i) = (c(i) ^ (1 << rnd.nextInt(8))).toByte
        c
      }
    }
    // class 3: random-offset truncations — 28 files × 20
    val truncs = validFiles.flatMap { f =>
      (1 to 20).map(_ => f.take(rnd.nextInt(f.length)))
    }
    random ++ mutants ++ truncs
  }

  test("every byte decoder is total: random/bit-flipped/truncated bytes decode to NULL or a value, never a throw") {
    assert(validFiles.size === 28)
    assert(payloads.size >= 2000, s"fuzz corpus too small: ${payloads.size}")
    val df = payloads.zipWithIndex
      .map { case (b, i) => (i.toLong, b) }
      .toDF("id", "payload")
      // NULL payload is part of the totality contract too
      .unionByName(Seq((-1L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload"))
      .repartition(32)
    val decoded = df.select(
      col("id"),
      GraftFunctions.imageAHash(col("payload")).as("ahash"),
      GraftFunctions.decodeMediaMeta(col("payload")).as("meta"),
      GraftFunctions.gifFrameHashes(col("payload")).as("gif_frames"),
      GraftFunctions.audioPcmFeatures(col("payload")).as("pcm"),
      GraftFunctions.aviFrameChecksums(col("payload"), lit(2)).as("avi"),
      GraftFunctions.warcRecords(col("payload")).as("warc"),
      GraftFunctions.mediaWarcRecords(col("payload")).as("mwarc"),
      GraftFunctions.gzipMembers(col("payload")).as("gz"),
      GraftFunctions.tarEntries(col("payload")).as("tar"),
      GraftFunctions.resizeBmp(col("payload"), lit(4), lit(4)).as("resized"))
    // forcing every row through every decoder IS the property: an executor
    // throw fails the action; NULLs and valid values both pass
    assert(decoded.count() === payloads.size + 1)
  }

  test("non-vacuity: the unmutated originals still decode where their format owns the decoder") {
    val df = validFiles.zipWithIndex
      .map { case (b, i) => (i.toLong, b) }
      .toDF("idx", "payload")
    val n = df
      .select(
        coalesce(
          GraftFunctions.imageAHash(col("payload")).cast("string"),
          GraftFunctions.gifFrameHashes(col("payload")).cast("string"),
          GraftFunctions.decodeMediaMeta(col("payload")).cast("string"),
          GraftFunctions.audioPcmFeatures(col("payload")).cast("string"),
          GraftFunctions.aviFrameChecksums(col("payload"), lit(1)).cast("string"),
          GraftFunctions.warcRecords(col("payload")).cast("string"),
          GraftFunctions.mediaWarcRecords(col("payload")).cast("string"),
          GraftFunctions.gzipMembers(col("payload")).cast("string"),
          GraftFunctions.tarEntries(col("payload")).cast("string")).as("any"))
      .where(col("any").isNotNull)
      .count()
    assert(n === validFiles.size.toLong,
      "every valid builder output must decode through at least one decoder")
  }
}
