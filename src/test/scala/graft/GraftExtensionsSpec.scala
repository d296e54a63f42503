package graft

/** Pure-SQL access to graft's custom expressions via the session extension
  * (GraftSession builds with `.withExtensions(new GraftExtensions)`), with
  * no GraftFunctions.register call anywhere in this suite.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("extension-injected functions resolve from SQL") {
    val r = spark
      .sql("""SELECT
              |  round(cosine_sim(array(1.0F, 0.0F), array(1.0F, 1.0F)), 6) AS c,
              |  simhash64(array('a', 'b')) AS sh,
              |  size(minhash_sig(array('a', 'b'), 16)) AS k,
              |  byte_histogram(cast('ab' as binary))[97] AS h,
              |  nfc_normalize('café') AS nfc
              |""".stripMargin)
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 0.707107) < 1e-6)
    assert(r.getInt(2) === 16)
    assert(math.abs(r.getFloat(3) - 0.5f) < 1e-6)
    assert(r.getString(4) === "café") // decomposed input composed to NFC
  }

  test("round-4 injections: media, image-hash, and text-stat functions resolve from SQL") {
    val r = spark
      .sql("""SELECT
              |  image_ahash(build_bmp(7L, 16, 16)) AS ab,
              |  image_ahash(build_gif(7L, 16, 16)) AS ag,
              |  decode_media_meta(build_bmp(7L, 16, 16)).format AS fmt,
              |  repetition_counts(array('a', 'a', 'b')).top_run AS tr,
              |  char_run_entropy_sums('aab').n AS n
              |""".stripMargin)
      .collect()(0)
    assert(!r.isNullAt(0) && r.getLong(0) === r.getLong(1)) // BMP ≡ GIF round-trip
    assert(r.getString(2) === "bmp")
    assert(r.getInt(3) === 2)
    assert(r.getInt(4) === 3)
    val va = spark
      .sql("""SELECT vector_avg(v) FROM VALUES (array(1.0D, 3.0D)), (array(3.0D, 5.0D)) AS t(v)""")
      .collect()(0).getSeq[Double](0)
    assert(va === Seq(2.0, 4.0))
  }

  test("extension-injected misra_gries_tokens resolves from SQL") {
    val cands = spark
      .sql("""SELECT misra_gries_tokens(t, 8) FROM VALUES
              |  (array('a', 'a', 'b')), (array('a', 'c')) AS v(t)""".stripMargin)
      .collect()(0).getSeq[String](0)
    // k=8 > vocab: no eviction, candidates = sorted vocabulary
    assert(cands === Seq("a", "b", "c"))
  }

  test("extension-injected zorder_value resolves from SQL and matches the Column form") {
    // a=0b11 on even bits, b=0b01 on odd → 0b0111 = 7; (7,7) → 63
    val r = spark
      .sql("SELECT zorder_value(3, 1, 3) AS z1, zorder_value(7, 7, 3) AS z2, zorder_value(5L, 9L, 10) AS z3")
      .collect()(0)
    assert(r.getInt(0) === 7 && r.getInt(1) === 63)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val colForm = Seq((5L, 9L))
      .toDF("a", "b")
      .select(graft.operators.ZOrder.zValue(col("a"), col("b"), 10).as("z"))
      .collect()(0)
      .getLong(0)
    assert(r.getLong(2) === colForm)
  }

  test("extension-injected topk aggregate resolves from SQL") {
    val topk = spark
      .sql("""SELECT topk_by_score(s, id, 2) AS t FROM VALUES
              |  (0.1D, 1L), (0.9D, 2L), (0.5D, 3L) AS v(s, id)""".stripMargin)
      .collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
    assert(topk.map(_.getLong(0)) === Seq(2L, 3L))
  }

  test("extension-injected kmv_mins resolves from SQL") {
    val mins = spark
      .sql("""SELECT kmv_mins(h, 3) AS m FROM VALUES
              |  (9L), (4L), (7L), (4L), (1L), (CAST(NULL AS BIGINT)) AS v(h)""".stripMargin)
      .collect()(0).getSeq[Long](0)
    // k smallest DISTINCT (dup 4 once, null skipped), ascending
    assert(mins === Seq(1L, 4L, 7L))
  }
}
