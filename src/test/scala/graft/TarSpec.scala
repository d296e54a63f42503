package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The ustar container walk: WebDataset-style round-trip, conformant
  * prefix-split long paths, and the typeflag matrix — extension headers
  * (PAX 'x', GNU 'L') must NULL the archive, never masquerade as sample
  * members.
  */
class TarSpec extends SparkSpec {
  import spark.implicits._
  GraftFunctions.register(spark)

  /** A genuine 512-byte ustar header with arbitrary prefix/typeflag —
    * octal fields + computed checksum, so TarCodec's checksum gate passes
    * and the test exercises the field under test, not the checksum.
    */
  private def header(name: String, prefix: String, typeflag: Byte, size: Int): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes("UTF-8"); System.arraycopy(nb, 0, h, 0, nb.length)
    def oct(v: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val p = ("0" * (len - 1 - s.length)) + s
      var i = 0
      while (i < len - 1) { h(off + i) = p.charAt(i).toByte; i += 1 }
      h(off + len - 1) = 0
    }
    oct(420, 100, 8); oct(0, 108, 8); oct(0, 116, 8)
    oct(size.toLong, 124, 12); oct(0, 136, 12)
    h(156) = typeflag
    h(257) = 'u'; h(258) = 's'; h(259) = 't'; h(260) = 'a'; h(261) = 'r'; h(262) = 0
    h(263) = '0'; h(264) = '0'
    val pb = prefix.getBytes("UTF-8"); System.arraycopy(pb, 0, h, 345, pb.length)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = h.map(_ & 0xff).sum.toLong
    val cs = java.lang.Long.toOctalString(sum)
    val cp = ("0" * (6 - cs.length)) + cs
    var i = 0
    while (i < 6) { h(148 + i) = cp.charAt(i).toByte; i += 1 }
    h(154) = 0; h(155) = ' '.toByte
    h
  }

  private def archive(members: (Array[Byte], Array[Byte])*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (h, payload) =>
      out.write(h); out.write(payload)
      out.write(new Array[Byte](((payload.length + 511) / 512) * 512 - payload.length))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  private def walk(bytes: Array[Byte]): Option[Seq[Row]] = {
    val r = Seq(Tuple1(bytes)).toDF("tar")
      .select(GraftFunctions.tarEntries(col("tar")).as("es"))
      .head()
    if (r.isNullAt(0)) None else Some(r.getSeq[Row](0))
  }

  test("WebDataset round-trip: buildTar members walk back in order with exact payloads") {
    val rows = Seq((4L, "hello"), (3L, "no-cls"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), GraftFunctions.tarEntries(
        GraftFunctions.buildTar(col("doc_id"), col("text"))).as("es"))
      .orderBy("doc_id")
      .collect()
    val e3 = rows(0).getSeq[Row](1)
    assert(e3.map(_.getString(0)) === Seq("3.txt", "3.json")) // id%3==0: no .cls
    val e4 = rows(1).getSeq[Row](1)
    assert(e4.map(_.getString(0)) === Seq("4.txt", "4.json", "4.cls"))
    assert(new String(e4(0).getAs[Array[Byte]](3), "UTF-8") === "hello")
    assert(new String(e4(2).getAs[Array[Byte]](3), "UTF-8") === "4")
    // entry_offset is the HEADER offset of each 512-block member
    assert(e4.map(_.getLong(2)) === Seq(0L, 1024L, 2048L))
  }

  test("ustar prefix field joins as prefix/name — long paths are not truncated") {
    val payload = "x".getBytes("UTF-8")
    val got = walk(archive(
      (header("sample.txt", "deep/nested/shard-00042", '0'.toByte, 1), payload)))
    assert(got.isDefined)
    assert(got.get.map(_.getString(0)) === Seq("deep/nested/shard-00042/sample.txt"))
  }

  test("GNU-version headers do NOT join offset 345 as a prefix (it holds atime/ctime there)") {
    // same header but version " \0" (GNU magic "ustar ") instead of
    // POSIX "00": bytes at 345 are octal atime/ctime, and joining them
    // would garble every member name
    val payload = "x".getBytes("UTF-8")
    val h = header("sample.txt", "13735123456", '0'.toByte, 1)
    h(262) = ' '; h(263) = ' '; h(264) = 0 // GNU "ustar  \0" magic+version
    // re-checksum after the mutation
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = h.map(_ & 0xff).sum.toLong
    val cs = java.lang.Long.toOctalString(sum)
    val cp = ("0" * (6 - cs.length)) + cs
    for (i <- 0 until 6) h(148 + i) = cp.charAt(i).toByte
    h(154) = 0; h(155) = ' '.toByte
    val got = walk(archive((h, payload)))
    assert(got.isDefined)
    assert(got.get.map(_.getString(0)) === Seq("sample.txt"),
      "GNU header's timestamp bytes were joined as a path prefix")
  }

  test("pre-POSIX NUL typeflag is a regular file") {
    val payload = "y".getBytes("UTF-8")
    val got = walk(archive((header("a.txt", "", 0.toByte, 1), payload)))
    assert(got.isDefined && got.get.map(_.getString(0)) === Seq("a.txt"))
  }

  test("extension/non-file typeflags NULL the archive instead of surfacing ghost entries") {
    val pax = "path=very/long/real/name.txt\n".getBytes("UTF-8")
    for (tf <- Seq('x', 'g', 'L', 'K', '5', '2')) {
      val got = walk(archive(
        (header("ext-header", "", tf.toByte, pax.length), pax),
        (header("real.txt", "", '0'.toByte, 1), "z".getBytes("UTF-8"))))
      assert(got.isEmpty, s"typeflag '$tf' was not rejected")
    }
  }

  test("truncated payload and missing terminator NULL the archive") {
    val full = archive((header("a.txt", "", '0'.toByte, 5), "abcde".getBytes("UTF-8")))
    assert(walk(full).isDefined)
    assert(walk(full.dropRight(1100)).isEmpty) // payload+terminator gone
    assert(walk(full.dropRight(512)).isEmpty)  // half the end marker gone
  }
}
