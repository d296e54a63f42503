package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** MP4 box-walk and MP3 frame-header decode: byte-built genuine fixtures
  * in, exact metadata out, NULL-on-corrupt throughout.
  */
class ContainerSpec extends SparkSpec {
  import spark.implicits._

  private def metaOf(bytes: Array[Byte]) = {
    GraftFunctions.register(spark)
    Seq(Tuple1(bytes)).toDF("b")
      .select(GraftFunctions.decodeMediaMeta(col("b")).as("m"))
      .select(col("m.format"), col("m.width"), col("m.height"),
        col("m.sample_rate"), col("m.channels"), col("m.duration_ms"))
      .collect()(0)
  }

  private def mp4Bytes(w: Int, h: Int, durMs: Int): Array[Byte] = {
    GraftFunctions.register(spark)
    spark.sql(s"SELECT build_mp4($w, $h, $durMs) AS b").collect()(0).getAs[Array[Byte]](0)
  }

  private def mp3Bytes(id: Long, frames: Int, tag: Int): Array[Byte] = {
    GraftFunctions.register(spark)
    spark.sql(s"SELECT build_mp3(${id}L, $frames, $tag) AS b").collect()(0).getAs[Array[Byte]](0)
  }

  test("mp4: box walk recovers dims and duration exactly") {
    for ((w, h, d) <- Seq((320, 240, 5000), (16, 16, 1000), (1920, 1080, 3599999))) {
      val r = metaOf(mp4Bytes(w, h, d))
      assert(r.getString(0) === "mp4")
      assert(r.getInt(1) === w && r.getInt(2) === h)
      assert(r.getInt(5) === d, s"duration ${w}x$h")
    }
  }

  test("mp4: an unknown leading box (real-world 'free'/'skip') is walked over") {
    val b = mp4Bytes(64, 48, 777)
    // splice a 16-byte `free` box between ftyp (20 bytes) and moov
    val free = Array[Byte](0, 0, 0, 16) ++ "free".getBytes("US-ASCII") ++ Array.fill[Byte](8)(0x5a)
    val spliced = b.take(20) ++ free ++ b.drop(20)
    val r = metaOf(spliced)
    assert(r.getString(0) === "mp4" && r.getInt(1) === 64 && r.getInt(5) === 777)
  }

  test("mp4: corrupt trees return NULL, never throw") {
    GraftFunctions.register(spark)
    def isNull(bytes: Array[Byte]): Boolean =
      Seq(Tuple1(bytes)).toDF("b")
        .select(GraftFunctions.decodeMediaMeta(col("b")).as("m"))
        .collect()(0).isNullAt(0)
    val good = mp4Bytes(32, 32, 1234)
    assert(!isNull(good))
    assert(isNull(good.take(30))) // truncated mid-moov
    val badSize = good.clone()
    badSize(20) = 0x7f // moov size absurdly larger than the file
    assert(isNull(badSize))
    // a file with ftyp but no moov at all
    assert(isNull(good.take(20)))
  }

  test("mp3: frame header + ID3v2 skip recover rate/channels/duration") {
    for ((id, n, tag) <- Seq((1L, 3, 0), (7L, 31, 16), (23L, 8, 129))) {
      val r = metaOf(mp3Bytes(id, n, tag))
      assert(r.getString(0) === "mp3")
      assert(r.getInt(3) === 44100 && r.getInt(4) === 1)
      assert(r.getInt(5) === n * 417 * 8 / 128, s"duration id=$id n=$n tag=$tag")
    }
  }

  test("mp3: corrupt or out-of-scope headers return NULL, never throw") {
    GraftFunctions.register(spark)
    def isNull(bytes: Array[Byte]): Boolean =
      Seq(Tuple1(bytes)).toDF("b")
        .select(GraftFunctions.decodeMediaMeta(col("b")).as("m"))
        .collect()(0).isNullAt(0)
    val good = mp3Bytes(5L, 4, 20)
    assert(!isNull(good))
    // ID3 tag claiming to extend past the payload
    val badTag = good.clone(); badTag(9) = 0x7f; badTag(8) = 0x7f; badTag(7) = 0x7f
    assert(isNull(badTag))
    // free-format bitrate (index 0) is out of scope
    val freeBr = good.clone(); freeBr(10 + 20 + 2) = (freeBr(10 + 20 + 2) & 0x0f).toByte
    assert(isNull(freeBr))
    // reserved MPEG version bits
    val badVer = good.clone(); badVer(10 + 20 + 1) = 0xe9.toByte
    assert(isNull(badVer))
    // random non-media bytes
    assert(isNull(Array.tabulate[Byte](64)(i => (i * 7).toByte)))
  }

  test("existing formats are unaffected by the new fallback probes") {
    // a WAV still decodes as wav (RIFF wins before the MP3 probe)
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT decode_media_meta(build_wav(3L, 16000, 1600)) AS m")
      .select(col("m.format"), col("m.sample_rate")).collect()(0)
    assert(r.getString(0) === "wav" && r.getInt(1) === 16000)
  }
}
