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

  private def mp3VbrBytes(id: Long, frames: Int, tag: Int): Array[Byte] = {
    GraftFunctions.register(spark)
    spark.sql(s"SELECT build_mp3_vbr(${id}L, $frames, $tag) AS b").collect()(0).getAs[Array[Byte]](0)
  }

  test("mp3 VBR: Xing frame count gives the exact duration the CBR estimate cannot") {
    // n chosen so the CBR estimate genuinely disagrees (at n=4/5 the
    // Xing frame's own 417 bytes coincidentally cancel the small frames)
    for ((id, n, tag) <- Seq((2L, 7, 0), (11L, 17, 7), (31L, 1, 129))) {
      val r = metaOf(mp3VbrBytes(id, n, tag))
      assert(r.getString(0) === "mp3")
      assert(r.getInt(3) === 44100 && r.getInt(4) === 1)
      val exact = (n.toLong * 1152L * 1000L / 44100L).toInt
      assert(r.getInt(5) === exact, s"id=$id n=$n")
      // and the CBR byte-length estimate over the mixed 417/208 payload
      // genuinely disagrees (the whole point of the Xing path)
      val payload = 417 + (n + 1) / 2 * 417 + n / 2 * 208
      val cbr = payload * 8 / 128
      assert(cbr !== exact, s"fixture failed to make CBR wrong: n=$n")
    }
  }

  test("mp3 VBR: 'Info' alias works; truncated/absent frames field falls back to CBR") {
    val good = mp3VbrBytes(5L, 6, 0)
    val exact = (6L * 1152L * 1000L / 44100L).toInt
    // Info alias: same tag semantics under the CBR-encoder magic
    val info = good.clone()
    info(10 + 21) = 'I'; info(10 + 22) = 'n'; info(10 + 23) = 'f'; info(10 + 24) = 'o'
    assert(metaOf(info).getInt(5) === exact)
    // flags cleared → no frames field → CBR estimate over the whole payload
    val noFrames = good.clone(); noFrames(10 + 21 + 7) = 0
    val cbr = ((good.length - 10).toLong * 8L / 128L).toInt
    assert(metaOf(noFrames).getInt(5) === cbr)
    // corrupting the Xing magic degrades to CBR too, never throws
    val noTag = good.clone(); noTag(10 + 21) = 'Q'
    assert(metaOf(noTag).getInt(5) === cbr)
  }

  test("mp3 VBR: CBR fixtures are unaffected by the Xing probe (x54 regression pin)") {
    val r = metaOf(mp3Bytes(9L, 12, 40))
    assert(r.getInt(5) === 12 * 417 * 8 / 128)
  }

  private def aviFramesBytes(w: Int, h: Int, frames: Int): Array[Byte] = {
    GraftFunctions.register(spark)
    spark.sql(s"SELECT build_avi_frames($w, $h, $frames) AS b").collect()(0).getAs[Array[Byte]](0)
  }

  private def aviChecksums(bytes: Array[Byte], stride: Int): Option[Seq[Long]] = {
    GraftFunctions.register(spark)
    val r = Seq(Tuple1(bytes)).toDF("b")
      .select(GraftFunctions.aviFrameChecksums(col("b"), lit(stride)).as("c"))
      .collect()(0)
    if (r.isNullAt(0)) None else Some(r.getSeq[Long](0))
  }

  private def aviRefSum(w: Int, h: Int, f: Int): Long =
    (0 until 24).map(i => ((w * 31 + h * 17 + f * 7 + i * 13) & 0xff).toLong * (i + 1)).sum

  test("avi frame sampling: every stride-th checksum matches the closed form") {
    for ((w, h, n, st) <- Seq((9, 11, 7, 2), (16, 8, 5, 1), (20, 30, 10, 3))) {
      val got = aviChecksums(aviFramesBytes(w, h, n), st)
      val want = (0 until n).filter(_ % st == 0).map(f => aviRefSum(w, h, f))
      assert(got === Some(want), s"w=$w h=$h n=$n stride=$st")
    }
  }

  test("avi frame sampling: corrupt inputs NULL, never throw; metadata walk unaffected") {
    val good = aviFramesBytes(10, 10, 4)
    // the same bytes still decode their avih metadata (frames · 40 ms):
    // the multi-frame fixture is a valid x69-grade container too
    val m = metaOf(good)
    assert(m.getString(0) === "avi")
    assert(m.getInt(1) === 10 && m.getInt(2) === 10 && m.getInt(5) === 160)
    // truncated mid-chunk → NULL
    assert(aviChecksums(good.take(good.length - 10), 2) === None)
    // bad magic → NULL
    val bad = good.clone(); bad(0) = 'X'
    assert(aviChecksums(bad, 2) === None)
    // nonsense stride → NULL
    assert(aviChecksums(good, 0) === None)
    // random bytes → NULL
    assert(aviChecksums(Array.tabulate[Byte](64)(i => (i * 3).toByte), 2) === None)
  }

  test("avi frame sampling: well-formed movi with zero dc/db chunks is an EMPTY array, not NULL") {
    // hand-build RIFF('AVI ' LIST('movi' '00tx'(4B))) — a movi whose only
    // chunk is a text stream: structurally valid, nothing to sample. NULL
    // is reserved for corruption; this must be Some(empty).
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def ascii(s: String): Unit = s.foreach(c => out.write(c.toInt))
    ascii("RIFF"); le32(4 + 12 + 12) // 'AVI ' + LIST hdr + inner chunk
    ascii("AVI ")
    ascii("LIST"); le32(4 + 12); ascii("movi")
    ascii("00tx"); le32(4); le32(0xdeadbeefL)
    assert(aviChecksums(out.toByteArray, 2) === Some(Seq.empty[Long]))
  }

  test("existing formats are unaffected by the new fallback probes") {
    // a WAV still decodes as wav (RIFF wins before the MP3 probe)
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT decode_media_meta(build_wav(3L, 16000, 1600)) AS m")
      .select(col("m.format"), col("m.sample_rate")).collect()(0)
    assert(r.getString(0) === "wav" && r.getInt(1) === 16000)
  }

  private def aviBytes(w: Int, h: Int, frames: Int): Array[Byte] = {
    GraftFunctions.register(spark)
    spark.sql(s"SELECT build_avi($w, $h, $frames) AS b").collect()(0).getAs[Array[Byte]](0)
  }

  test("avi: hdrl walk recovers dims and 25fps duration exactly") {
    for ((w, h, f) <- Seq((320, 240, 100), (32, 24, 10), (1920, 1080, 90000))) {
      val r = metaOf(aviBytes(w, h, f))
      assert(r.getString(0) === "avi")
      assert(r.getInt(1) === w && r.getInt(2) === h)
      assert(r.getInt(5) === f * 40, s"duration for $f frames") // 40 ms/frame
    }
  }

  test("avi: a JUNK chunk before hdrl (real-world padding) is walked over") {
    val b = aviBytes(64, 48, 77)
    // splice a 12-byte JUNK chunk right after the 12-byte RIFF/AVI header,
    // bumping the RIFF size by 12+8
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](12, 0, 0, 0) ++ Array.fill[Byte](12)(0x5a)
    val spliced = b.take(12) ++ junk ++ b.drop(12)
    val oldSize = (b(4) & 0xff) | ((b(5) & 0xff) << 8) | ((b(6) & 0xff) << 16) | ((b(7) & 0xff) << 24)
    val ns = oldSize + 20
    spliced(4) = (ns & 0xff).toByte; spliced(5) = ((ns >> 8) & 0xff).toByte
    spliced(6) = ((ns >> 16) & 0xff).toByte; spliced(7) = ((ns >> 24) & 0xff).toByte
    val r = metaOf(spliced)
    assert(r.getString(0) === "avi" && r.getInt(1) === 64 && r.getInt(5) === 77 * 40)
  }

  test("avi: corrupt/truncated files return NULL, never throw") {
    GraftFunctions.register(spark)
    def isNull(bytes: Array[Byte]): Boolean = {
      Seq(Tuple1(bytes)).toDF("b")
        .select(GraftFunctions.decodeMediaMeta(col("b")).as("m")).collect()(0).isNullAt(0)
    }
    val good = aviBytes(100, 80, 50)
    // truncated before the avih payload completes
    assert(isNull(good.take(40)))
    // RIFF size pointing past the buffer
    val badSize = good.clone(); badSize(4) = 0xff.toByte; badSize(5) = 0xff.toByte
    assert(isNull(badSize))
    // avih shrunk below MainAVIHeader size (size field at hdrl+avih header)
    val shrunk = good.clone()
    // avih size is at offset 12(RIFF/AVI )+8(LIST hdr)+4(hdrl)+4(avih)=28
    shrunk(28) = 8; shrunk(29) = 0; shrunk(30) = 0; shrunk(31) = 0
    assert(isNull(shrunk))
    // zero dwMicroSecPerFrame (avih payload starts at 32)
    val zeroRate = good.clone()
    zeroRate(32) = 0; zeroRate(33) = 0; zeroRate(34) = 0; zeroRate(35) = 0
    assert(isNull(zeroRate))
  }
}
