package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.Similarity
import graft.streaming.AnnIndexStream
import graft.streaming.AnnIndexStream.Vec

/** The fourteenth batch/stream twin: after every micro-batch, the
  * maintainer's top-k must equal [[Similarity.intLshTopK]] over every
  * vector delivered so far — candidate membership (not existing-pair
  * scores) is what each batch changes, and a new vector must be able to
  * enter any query's top-k, displacing a committed rank.
  */
class AnnIndexStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus: Seq[(Long, Array[Float])] = {
    GraftFunctions.register(spark)
    spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id"))
      .limit(40)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .toSeq
  }

  // the x91 shape: low-id vectors are the query set
  private lazy val queries: DataFrame = corpus.take(4)
    .toDF("vec_id", "embedding")
    .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

  private def vecsDF(vs: Seq[(Long, Array[Float])]): DataFrame =
    vs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

  private def rank(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet

  private def batchTopK(vs: Seq[(Long, Array[Float])], k: Int = 5): Set[(Long, Long, Double, Int)] =
    rank(Similarity.intLshTopK(queries, vecsDF(vs), k, tables = 8, bitsPerTable = 6))

  test("topK ≡ batch intLshTopK after every micro-batch, rank displacement included") {
    assert(corpus.size >= 40, s"need 40 vectors, testdata gave ${corpus.size}")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Vec]
    val m = new AnnIndexStream.Maintainer(spark, tables = 8, bitsPerTable = 6)
    val query = AnnIndexStream.start(input.toDS(), m)
    try {
      // batch 1: a first tranche of corpus vectors
      val b1 = corpus.slice(4, 16)
      input.addData(b1.map { case (id, v) => Vec(id, v) }: _*)
      query.processAllAvailable()
      var prefix = b1
      assert(rank(m.topK(queries)) === batchTopK(prefix))

      // batch 2: EXACT COPIES of the query vectors under new ids — they
      // must enter at cosine 1.0, displacing committed ranks
      val b2 = corpus.take(4).map { case (id, v) => (5000 + id, v) } ++ corpus.slice(16, 24)
      input.addData(b2.map { case (id, v) => Vec(id, v) }: _*)
      query.processAllAvailable()
      prefix ++= b2
      val after2 = rank(m.topK(queries))
      assert(after2 === batchTopK(prefix))
      assert(after2.exists { case (_, n, s, r) => n >= 5000 && s >= 0.999999 && r === 1 },
        "planted copy did not take rank 1")

      // batch 3: the remaining tranche
      val b3 = corpus.slice(24, 40)
      input.addData(b3.map { case (id, v) => Vec(id, v) }: _*)
      query.processAllAvailable()
      prefix ++= b3
      assert(rank(m.topK(queries)) === batchTopK(prefix))
    } finally query.stop()
  }

  test("replayed batch is a no-op (idempotent fold)") {
    val vs = corpus.slice(4, 14)
    val m = new AnnIndexStream.Maintainer(spark)
    val batch = vecsDF(vs)
    m.update(batch)
    val once = rank(m.topK(queries))
    val bucketsOnce = m.buckets.count()
    val vectorsOnce = m.vectors.count()
    m.update(batch) // same batch re-delivered after a crash
    assert(rank(m.topK(queries)) === once)
    assert(m.buckets.count() === bucketsOnce)
    assert(m.vectors.count() === vectorsOnce)
    assert(once === batchTopK(vs))
  }

  test("stateDir restart: a fresh Maintainer resumes the persisted index") {
    val vs = corpus.slice(4, 24)
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_state").toString
    val m1 = new AnnIndexStream.Maintainer(spark, stateDir = Some(dir))
    assert(!m1.resumed)
    m1.update(vecsDF(vs.take(8)), epochId = 0L)
    m1.update(vecsDF(vs.slice(8, 14)), epochId = 1L)
    val before = rank(m1.topK(queries))

    val m2 = new AnnIndexStream.Maintainer(spark, stateDir = Some(dir))
    assert(m2.resumed)
    assert(rank(m2.topK(queries)) === before)
    // replay of the last batch (offsets not committed) is a no-op
    m2.update(vecsDF(vs.slice(8, 14)), epochId = 1L)
    assert(rank(m2.topK(queries)) === before)
    // and the fold continues correctly across the restart
    m2.update(vecsDF(vs.slice(14, 20)), epochId = 2L)
    assert(rank(m2.topK(queries)) === batchTopK(vs))
  }

  test("mid-write crash (frames without marker) falls back one epoch and re-folds") {
    val vs = corpus.slice(4, 20)
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_crash").toString
    val m1 = new AnnIndexStream.Maintainer(spark, stateDir = Some(dir))
    val b0 = vs.take(8)
    val b1 = vs.slice(8, 16)
    m1.update(vecsDF(b0), epochId = 0L)
    val afterB0 = rank(m1.topK(queries))
    m1.update(vecsDF(b1), epochId = 1L)
    assert(new java.io.File(dir, "commits/1").delete(), "marker should exist")

    val m2 = new AnnIndexStream.Maintainer(spark, stateDir = Some(dir))
    assert(m2.resumed)
    assert(rank(m2.topK(queries)) === afterB0, "loader did not fall back to epoch 0")
    m2.update(vecsDF(b1), epochId = 1L)
    assert(rank(m2.topK(queries)) === batchTopK(b0 ++ b1))
  }

  test("delta epochs compact: old epochs GC, state survives compaction and further deltas") {
    val vs = corpus.slice(4, 24)
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_compact").toString
    val m1 = new AnnIndexStream.Maintainer(spark, stateDir = Some(dir), compactEvery = 2)
    m1.update(vecsDF(vs.take(5)), epochId = 0L)       // delta
    m1.update(vecsDF(vs.slice(5, 10)), epochId = 1L)  // compact
    m1.update(vecsDF(vs.slice(10, 15)), epochId = 2L) // delta
    assert(!new java.io.File(dir, "commits/0").exists, "epoch 0 should be GC'd")
    assert(new java.io.File(dir, "compacts/1").exists, "epoch 1 should be a compact")
    val m2 = new AnnIndexStream.Maintainer(spark, stateDir = Some(dir), compactEvery = 2)
    assert(m2.resumed)
    assert(rank(m2.topK(queries)) === batchTopK(vs.take(15)))
    m2.update(vecsDF(vs.slice(15, 20)), epochId = 3L)
    assert(new java.io.File(dir, "compacts/3").exists, "epoch 3 should compact")
    assert(rank(m2.topK(queries)) === batchTopK(vs))
    val m3 = new AnnIndexStream.Maintainer(spark, stateDir = Some(dir), compactEvery = 2)
    assert(rank(m3.topK(queries)) === batchTopK(vs))
  }

  test("checkpoint without stateDir is refused (silent partial-index restart)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Vec]
    val m = new AnnIndexStream.Maintainer(spark)
    val cp = java.nio.file.Files.createTempDirectory("graft_ann_cp").toString
    val e = intercept[IllegalArgumentException] {
      AnnIndexStream.start(input.toDS(), m, checkpoint = Some(cp))
    }
    assert(e.getMessage.contains("stateDir"))
  }
}
