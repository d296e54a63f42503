package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.{AnchorText, DistinctSketch}
import graft.streaming.AnchorStream
import graft.streaming.AnchorStream.{AnchorStats, Link}

/** AnchorStream ≡ AnchorText.aggregate on every prefix in the
  * no-eviction regime; sketch bounds hold under churn.
  */
class AnchorStreamSpec extends SparkSpec {
  import spark.implicits._

  private def latest(rows: Array[AnchorStats]): Map[String, AnchorStats] =
    rows.groupBy(_.target).map { case (t, rs) =>
      t -> rs.maxBy(_.n_links) // n_links strictly increases per touched key
    }

  private val batch1 = Seq(
    Link("/t", 1L, "alpha"), Link("/t", 2L, "alpha"), Link("/t", 3L, "beta"),
    Link("/u", 4L, "x"))
  private val batch2 = Seq(
    Link("/t", 3L, "gamma"), // doc 3 again: distinct sources stays 3
    Link("/u", 5L, "y")) // tie at 1 → 'x' lexicographically

  test("no-eviction regime: stream stats equal the batch rollup after both batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Link]
    val query = AnchorStream.stats(input.toDS(), mgK = 16, kmvK = 64)
      .writeStream.format("memory").queryName("anchor_twin")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
      val fin = latest(spark.table("anchor_twin").as[AnchorStats].collect())
      val want = AnchorText
        .aggregate((batch1 ++ batch2).toDF("href", "doc_id", "text")
          .select(col("doc_id"), col("href"), col("text")))
        .collect()
        .map(r => r.getAs[String]("target") ->
          ((r.getAs[Long]("n_links"), r.getAs[Long]("n_src_docs"),
            r.getAs[String]("top_text"), r.getAs[Long]("top_cnt"))))
        .toMap
      assert(fin.keySet === want.keySet)
      fin.foreach { case (t, s) =>
        val (nl, nd, tt, tc) = want(t)
        assert(s.n_links === nl, s"$t n_links")
        assert(s.est_src_docs === nd, s"$t distinct sources (exact below k)")
        assert(s.top_text === tt, s"$t plurality")
        assert(s.top_count_lb === tc, s"$t plurality count")
      }
    } finally query.stop()
  }

  test("state stays sketch-bounded under open-vocabulary churn") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Link]
    val mgK = 4
    val kmvK = 8
    val query = AnchorStream.stats(input.toDS(), mgK = mgK, kmvK = kmvK)
      .writeStream.format("memory").queryName("anchor_churn")
      .outputMode(OutputMode.Update())
      .start()
    try {
      // 3 batches: "hot" at 50% survives a k=4 MG sketch; 60 distinct
      // sources through a k=8 KMV stay at the estimate formula
      (0 until 3).foreach { b =>
        val links = (0 until 10).map(i => Link("/g", (b * 20 + i).toLong, "hot")) ++
          (0 until 10).map(i => Link("/g", (b * 20 + 10 + i).toLong, s"tail_${b}_$i"))
        input.addData(links: _*)
        query.processAllAvailable()
      }
      val fin = latest(spark.table("anchor_churn").as[AnchorStats].collect())("/g")
      assert(fin.n_links === 60L)
      assert(fin.top_text === "hot") // >n/k frequency must survive MG
      assert(fin.top_count_lb <= 30L) // never overcounts
      // KMV estimate of 60 distinct via the x57 formula on these hashes
      val hashes = (0 until 60).map(i => DistinctSketch.hash40Scala(i.toString)).sorted
      val wantEst = (kmvK - 1).toLong * DistinctSketch.Domain / math.max(hashes(kmvK - 1), 1L)
      assert(fin.est_src_docs === wantEst)
    } finally query.stop()
  }
}
