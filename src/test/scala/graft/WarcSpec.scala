package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** WARC container family (x92): fixture roundtrip, record-walk
  * arithmetic, the ISO 28500 malformedness contract (NULL, never a
  * throw), and the multi-SF gate parity of the full surface.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def recordsOf(bytes: Array[Byte]): Row = {
    Seq(Tuple1(bytes)).toDF("b")
      .select(GraftFunctions.warcRecords(col("b")).as("r"))
      .collect()(0)
  }

  private def build(id: Long, text: String): Array[Byte] =
    Seq((id, text)).toDF("id", "t")
      .select(GraftFunctions.buildWarc(col("id"), col("t")).as("w"))
      .collect()(0).getAs[Array[Byte]](0)

  test("fixture roundtrip: warcinfo + 1+id%3 resources, headers and payloads recovered") {
    for (id <- Seq(0L, 7L, 11L)) {
      val rows = recordsOf(build(id, "hello warc world")).getSeq[Row](0)
      val nrec = 1 + (id % 3).toInt
      assert(rows.size === 1 + nrec, s"id=$id")
      val info = rows.head
      assert(info.getLong(0) === 0L) // first record starts at byte 0
      assert(info.getString(1) === "warcinfo")
      assert(info.isNullAt(2)) // warcinfo has no target URI
      assert(info.getString(5) === "software: graft\r\n")
      assert(info.getInt(4) === 17)
      rows.tail.zipWithIndex.foreach { case (r, i) =>
        assert(r.getString(1) === "resource")
        assert(r.getString(2) === s"http://example.com/doc/$id/$i")
        assert(r.getString(3) === s"2020-01-01T00:00:0${i}Z")
        assert(r.getString(5).contains(s"<h1>Heading $id&#33;</h1>"))
        assert(r.getInt(4) === r.getString(5)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
      }
      // offsets are exact prefix sums: each record starts where the
      // previous one's header+payload+separator ended
      val raw = build(id, "hello warc world")
      rows.foreach { r =>
        val off = r.getLong(0).toInt
        assert(new String(raw, off, 8, "US-ASCII") === "WARC/1.0", s"id=$id off=$off")
      }
      assert(rows.map(_.getLong(0)) === rows.map(_.getLong(0)).sorted)
    }
  }

  test("malformed containers return NULL, never a throw (the x89 rule)") {
    val good = build(5L, "some text")
    def nullFor(bytes: Array[Byte], why: String): Unit =
      assert(recordsOf(bytes).isNullAt(0), why)
    // bad magic
    nullFor("HTTP/1.1 200 OK\r\n\r\n".getBytes("US-ASCII"), "bad magic")
    nullFor({ val c = good.clone(); c(0) = 'X'.toByte; c }, "corrupted magic")
    // truncated payload: cut mid-record
    nullFor(good.take(good.length - 3), "truncated separator")
    nullFor(good.take(40), "truncated headers")
    // wrong record separator: flip the final LF
    nullFor({ val c = good.clone(); c(c.length - 1) = 'x'.toByte; c }, "bad separator")
    // missing Content-Length
    nullFor(
      "WARC/1.0\r\nWARC-Type: resource\r\n\r\nhi\r\n\r\n".getBytes("US-ASCII"),
      "missing Content-Length")
    // unparseable Content-Length
    nullFor(
      "WARC/1.0\r\nWARC-Type: x\r\nContent-Length: nope\r\n\r\n\r\n\r\n"
        .getBytes("US-ASCII"),
      "bad Content-Length")
    // header line without a colon
    nullFor(
      "WARC/1.0\r\ngarbage line\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
        .getBytes("US-ASCII"),
      "colon-less header")
    // trailing garbage after a valid record
    nullFor(good ++ "junk".getBytes("US-ASCII"), "trailing garbage")
    // NULL input → NULL; empty input → empty array, not NULL
    val n = Seq(Tuple1(null.asInstanceOf[Array[Byte]])).toDF("b")
      .select(GraftFunctions.warcRecords(col("b")).as("r")).collect()(0)
    assert(n.isNullAt(0))
    assert(recordsOf(Array.empty[Byte]).getSeq[Row](0).isEmpty)
  }

  test("header names are case-insensitive; unknown headers are ignored (ISO 28500)") {
    val bytes =
      ("WARC/1.0\r\n" +
        "warc-type: resource\r\n" +
        "WARC-TARGET-URI: http://x/1\r\n" +
        "X-Custom-Header: whatever\r\n" +
        "content-length: 2\r\n" +
        "\r\nhi\r\n\r\n").getBytes("US-ASCII")
    val rows = recordsOf(bytes).getSeq[Row](0)
    assert(rows.size === 1)
    assert(rows.head.getString(1) === "resource")
    assert(rows.head.getString(2) === "http://x/1")
    assert(rows.head.isNullAt(3)) // no WARC-Date header
    assert(rows.head.getString(5) === "hi")
  }

  test("gzip members: per-record compression roundtrips; CRC/ISIZE verified; headers handled") {
    GraftFunctions.register(spark)
    def members(bytes: Array[Byte]): Row =
      Seq(Tuple1(bytes)).toDF("b")
        .select(GraftFunctions.gzipMembers(col("b")).as("m"))
        .collect()(0)
    val gz = Seq((9L, "compressed warc text")).toDF("id", "t")
      .select(GraftFunctions.buildWarcGz(col("id"), col("t")).as("w"))
      .collect()(0).getAs[Array[Byte]](0)
    // 9 % 3 = 0 → 1 resource + warcinfo = 2 members, concatenation of
    // members re-parses to the SAME records the plain file carries
    val ms = members(gz).getSeq[Array[Byte]](0)
    assert(ms.size === 2)
    val plain = build(9L, "compressed warc text")
    assert(ms.map(_.toSeq).reduce(_ ++ _) === plain.toSeq)
    assert(new String(ms(0), "US-ASCII").startsWith("WARC/1.0\r\nWARC-Type: warcinfo"))
    // optional header fields: FNAME + FEXTRA + FCOMMENT all consumed
    val withName = {
      val bos = new java.io.ByteArrayOutputStream()
      // hand-built header: magic, deflate, FLG=FEXTRA|FNAME|FCOMMENT
      bos.write(Array[Byte](0x1f, 0x8b.toByte, 8, (4 | 8 | 16).toByte, 0, 0, 0, 0, 0, 0))
      bos.write(Array[Byte](2, 0, 42, 42)) // XLEN=2 + extra bytes
      bos.write("name.txt".getBytes("US-ASCII")); bos.write(0)
      bos.write("comment".getBytes("US-ASCII")); bos.write(0)
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      val payload = "hello".getBytes("US-ASCII")
      d.setInput(payload); d.finish()
      val buf = new Array[Byte](64)
      val m = d.deflate(buf)
      bos.write(buf, 0, m)
      val crc = new java.util.zip.CRC32(); crc.update(payload)
      val t = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      t.putInt(crc.getValue.toInt); t.putInt(payload.length)
      bos.write(t.array())
      bos.toByteArray
    }
    assert(new String(members(withName).getSeq[Array[Byte]](0)(0), "US-ASCII") === "hello")
    // damage matrix → NULL, never a throw
    assert(members(gz.take(gz.length - 3)).isNullAt(0)) // truncated trailer
    assert(members(gz.take(15)).isNullAt(0)) // truncated stream
    assert(members({ val c = gz.clone(); c(0) = 'X'.toByte; c }).isNullAt(0)) // magic
    assert(members({ val c = gz.clone(); c(3) = 0xe0.toByte; c }).isNullAt(0)) // reserved FLG
    assert(members({ // corrupt the stored CRC of the LAST member
      val c = gz.clone(); c(c.length - 8) = (c(c.length - 8) ^ 0xff).toByte; c
    }).isNullAt(0))
    assert(members(Array.empty[Byte]).getSeq[Array[Byte]](0).isEmpty)
    val n = Seq(Tuple1(null.asInstanceOf[Array[Byte]])).toDF("b")
      .select(GraftFunctions.gzipMembers(col("b")).as("m")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("x97 surface equals x92's record content on the shared id range") {
    // same doc → same records whether read from the plain or the
    // compressed container (offsets aside, which only x92 carries)
    val sf = "/root/testdata/sf0.001"
    val gzRows = SparkEntry.queries("x97_warc_gz")(spark, sf).collect()
    assert(gzRows.nonEmpty)
    gzRows.foreach { r =>
      val id = r.getLong(0)
      val i = r.getInt(1)
      assert(r.getString(2) === s"http://example.com/doc/$id/$i")
      assert(r.getString(3) === s"2020-01-01T00:00:0${i}Z")
      assert(r.getString(5).startsWith(s"Heading $id!"))
    }
    assert(gzRows.groupBy(_.getLong(0)).forall { case (id, rs) =>
      rs.length == 1 + (id % 3).toInt
    })
  }

  test("x98 CDX rows tile the file: offsets strictly increase, lengths sum to file size") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val got = SparkEntry.queries("x98_cdx_index")(spark, s"/root/testdata/$sf").collect()
      assert(got.nonEmpty, sf)
      got.groupBy(_.getLong(0)).foreach { case (id, rs) =>
        val sorted = rs.sortBy(_.getInt(1))
        sorted.foreach { r =>
          assert(r.getString(2) === s"com,example)/doc/$id/${r.getInt(1)}", sf)
          assert(r.getLong(4) > 0, sf)
        }
        // consecutive records tile: offset_{i+1} = offset_i + len_i
        sorted.sliding(2).filter(_.size == 2).foreach { p =>
          assert(p(1).getLong(3) === p(0).getLong(3) + p(0).getLong(4), s"$sf doc=$id")
        }
        // the first resource sits strictly after the warcinfo record
        assert(sorted.head.getLong(3) > 0, sf)
      }
    }
  }

  test("x92 surface matches its closed form on the real corpus at two SFs") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val got = SparkEntry.queries("x92_warc_records")(spark, s"/root/testdata/$sf").collect()
      assert(got.nonEmpty, sf)
      got.foreach { r =>
        val id = r.getLong(0)
        val i = r.getInt(1)
        assert(r.getString(2) === s"http://example.com/doc/$id/$i", sf)
        assert(r.getString(3) === s"2020-01-01T00:00:0${i}Z", sf)
        assert(r.getString(6).startsWith(s"Heading $id!"), sf)
        // resource records of one doc share a payload → equal lengths,
        // and consecutive offsets differ by exactly one record's bytes
        assert(r.getLong(4) > 0, sf)
      }
      val byDoc = got.groupBy(_.getLong(0))
      byDoc.foreach { case (id, rs) =>
        assert(rs.length === 1 + (id % 3).toInt, s"$sf doc=$id")
        val sorted = rs.sortBy(_.getInt(1))
        val offs = sorted.map(_.getLong(4))
        val gaps = offs.sliding(2).filter(_.size == 2).map(p => p(1) - p(0)).toSeq
        assert(gaps.distinct.size <= 1, s"$sf doc=$id uneven record stride")
      }
    }
  }
}
