package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (BASELINE.json north star): image/audio/video
  * payloads as opaque `binary` columns with typed metadata, plus
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape — is real
  * and tested. The decode step is real wherever the format is parseable
  * without a codec library: [[decodeMeta]] walks WAV/RIFF chunks, BMP /
  * PNG / GIF / JPEG image headers, MP4 box trees (mvhd duration, tkhd
  * dims) and MP3 frame headers (ID3v2 skip + bitrate/samplerate tables)
  * from the raw bytes, and image PIXELS decode for real across
  * BMP/GIF/PNG/baseline-JPEG. Only compressed-STREAM payloads (MP4
  * sample data, MP3 audio frames — true entropy decode) stay behind the
  * clearly-marked stub [[fakeDecodeMeta]]; a production build swaps it
  * for a codec-backed implementation with the same signature (in PySpark
  * bindings this is where an Arrow-batched `mapInPandas` UDF would sit);
  * nothing else changes.
  *
  * Everything below is built-in byte/array expressions: `substring` on
  * binary, `aggregate` over byte positions — codegen'd, shuffle-free,
  * embarrassingly parallel. At 100 TB this matters: media ETL is a pure
  * map, and any shuffle here would dominate the job.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(
    Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false), // image | audio | video
      StructField("payload", BinaryType),
      StructField(
        "meta",
        StructType(
          Seq(
            StructField("width", IntegerType),
            StructField("height", IntegerType),
            StructField("sample_rate", IntegerType),
            StructField("duration_ms", IntegerType)
          )
        )
      )
    )
  )

  /** Deterministic synthetic media table (no RNG, reproducible): payload
    * bytes derive from sha2 of the id, repeated to a kind-dependent length.
    */
  def synthetic(spark: SparkSession, n: Int): DataFrame = {
    val kinds = when(col("media_id") % 3 === 0, "image")
      .when(col("media_id") % 3 === 1, "audio")
      .otherwise("video")
    spark
      .range(n)
      .withColumnRenamed("id", "media_id")
      .withColumn("kind", kinds)
      .withColumn(
        "payload",
        to_binary(repeat(sha2(col("media_id").cast(StringType), 256), 8), lit("hex"))
      )
      .withColumn(
        "meta",
        struct(
          (pmod(col("media_id"), lit(64)) * 16 + 16).cast(IntegerType).as("width"),
          (pmod(col("media_id"), lit(48)) * 16 + 16).cast(IntegerType).as("height"),
          lit(16000).cast(IntegerType).as("sample_rate"),
          (pmod(col("media_id"), lit(30)) * 1000 + 1000).cast(IntegerType).as("duration_ms")
        )
      )
  }

  /** STUB decode: deterministic fake of "entropy-decode the compressed
    * stream and report its true dimensions" — the one step that genuinely
    * needs a codec library this container doesn't ship. All container
    * METADATA (including MP4/MP3) decodes for real in [[decodeMeta]].
    * Replace with a codec call in production; signature stays.
    */
  def fakeDecodeMeta(payload: Column): Column =
    struct(
      (abs(xxhash64(payload)) % 4096).cast(IntegerType).as("decoded_w"),
      (abs(xxhash64(payload, lit(1))) % 4096).cast(IntegerType).as("decoded_h")
    )

  /** "Resize": truncate/pad payload to a byte budget (stub for pixel
    * resize; real impl swaps in a codec). substring on binary is a
    * zero-copy slice.
    */
  def resizeBytes(payload: Column, maxBytes: Int): Column =
    substring(payload, lit(1), lit(maxBytes))

  /** Frame sampling: every `stride`-th chunk of `frameBytes` bytes
    * (deterministic stand-in for video frame extraction). Output is an
    * array<binary> of sampled frames.
    */
  def sampleFrames(payload: Column, frameBytes: Int, stride: Int): Column =
    transform(
      sequence(lit(0), (length(payload) / lit(frameBytes * stride)).cast(IntegerType) - 1),
      k => substr(payload, k * (frameBytes * stride) + 1, lit(frameBytes))
    )

  /** REAL metadata decode across every supported container: WAV (RIFF
    * chunk walk), BMP/PNG/GIF/JPEG image headers, MP4 (ISO-BMFF box walk:
    * mvhd duration, tkhd dims) and MP3 (ID3v2 skip + frame header) —
    * struct(format,width,height,sample_rate,channels,bit_depth,duration_ms),
    * NULL for unrecognized/corrupt payloads. See
    * [[graft.functions.DecodeMediaMeta]], [[graft.functions.Mp4Codec]],
    * [[graft.functions.Mp3Codec]]. Image PIXELS additionally decode for
    * real across BMP/GIF/PNG/baseline-JPEG
    * ([[graft.functions.ImageAHash]]); only compressed-stream payloads
    * remain behind [[fakeDecodeMeta]].
    */
  def decodeMeta(payload: Column): Column =
    graft.functions.GraftFunctions.decodeMediaMeta(payload)

  /** The full media featurization pass — real header decode where the
    * format allows, the disclosed stub otherwise — plus histogram feature
    * and thumbnail bytes, as one map-only projection.
    */
  def featurize(media: DataFrame): DataFrame =
    media
      .withColumn("decoded_real", decodeMeta(col("payload")))
      .withColumn("decoded", fakeDecodeMeta(col("payload")))
      .withColumn("feature", graft.functions.GraftFunctions.byteHistogram(col("payload")))
      .withColumn("thumb", resizeBytes(col("payload"), 64))
}
