package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.PageRank
import graft.streaming.PageRankStream
import graft.streaming.PageRankStream.Edge

/** The sixteenth batch/stream twin — the graph family's streaming member:
  * after every micro-batch, `ranks()` over the maintained edge list must
  * equal the batch [[PageRank.integerPageRank]] over every edge delivered
  * so far (the view-forced emission: one new edge moves every score, so
  * the only correct surface is a query against current state). Includes
  * the structural cases that make incremental centrality non-trivial: a
  * batch that only ADDS out-edges to an existing node (its out-degree
  * changes, so mass through it re-routes) and a batch that connects two
  * previously separate components.
  */
class PageRankStreamSpec extends SparkSpec {
  import spark.implicits._

  // x46's trade graph at sf0.001, symmetrized — real degrees, real cycles
  private lazy val allEdges: Seq[(Long, Long)] = {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val trade = orders
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
      .limit(60)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    trade.flatMap { case (a, b) => Seq((a, b), (b, a)) }
  }

  private def rankSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def batchRanks(edges: Seq[(Long, Long)]): Set[(Long, Long)] =
    rankSet(PageRank.integerPageRank(edges.toDF("src", "dst"), iters = 3))

  test("ranks ≡ batch integerPageRank after every micro-batch (degree shifts, component merge)") {
    assert(allEdges.size >= 80, s"need a real graph, got ${allEdges.size} edges")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Edge]
    val m = new PageRankStream.Maintainer(spark)
    val query = PageRankStream.start(input.toDS(), m)
    try {
      // batch 1: a first slice of the graph
      val b1 = allEdges.take(40)
      input.addData(b1.map { case (s0, d0) => Edge(s0, d0) }: _*)
      query.processAllAvailable()
      var prefix = b1
      assert(rankSet(m.ranks()) === batchRanks(prefix))

      // batch 2: more edges touching EXISTING nodes — out-degrees of
      // already-ranked nodes change, so every share re-divides
      val b2 = allEdges.slice(40, 80)
      input.addData(b2.map { case (s0, d0) => Edge(s0, d0) }: _*)
      query.processAllAvailable()
      prefix ++= b2
      assert(rankSet(m.ranks()) === batchRanks(prefix))

      // batch 3: a disjoint planted component, then a bridge edge into
      // the main graph — the mass redistribution crosses the bridge
      val planted = Seq((900001L, 900002L), (900002L, 900001L),
        (900002L, 900003L), (900003L, 900002L))
      val bridge = Seq((900001L, allEdges.head._1), (allEdges.head._1, 900001L))
      val b3 = planted ++ bridge
      input.addData(b3.map { case (s0, d0) => Edge(s0, d0) }: _*)
      query.processAllAvailable()
      prefix ++= b3
      assert(rankSet(m.ranks()) === batchRanks(prefix))
    } finally query.stop()
  }

  test("replayed batch is a no-op (distinct fold), overlapping batches collapse") {
    val m = new PageRankStream.Maintainer(spark)
    val b = allEdges.take(30)
    m.update(b.toDF("src", "dst"))
    val once = rankSet(m.ranks())
    val stateOnce = m.state.count()
    m.update(b.toDF("src", "dst")) // crash re-delivery
    assert(rankSet(m.ranks()) === once)
    assert(m.state.count() === stateOnce)
    // a batch OVERLAPPING committed edges adds only the new ones
    m.update(allEdges.slice(20, 40).toDF("src", "dst"))
    assert(rankSet(m.ranks()) === batchRanks(allEdges.take(40)))
  }

  test("stateDir restart + replay + continuation across a fresh Maintainer") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pr_state").toString
    val m1 = new PageRankStream.Maintainer(spark, stateDir = Some(dir))
    assert(!m1.resumed)
    m1.update(allEdges.take(30).toDF("src", "dst"), epochId = 0L)
    m1.update(allEdges.slice(30, 50).toDF("src", "dst"), epochId = 1L)
    val before = rankSet(m1.ranks())

    val m2 = new PageRankStream.Maintainer(spark, stateDir = Some(dir))
    assert(m2.resumed)
    assert(rankSet(m2.ranks()) === before)
    m2.update(allEdges.slice(30, 50).toDF("src", "dst"), epochId = 1L) // replay no-op
    assert(rankSet(m2.ranks()) === before)
    m2.update(allEdges.slice(50, 80).toDF("src", "dst"), epochId = 2L)
    assert(rankSet(m2.ranks()) === batchRanks(allEdges.take(80)))
  }

  test("delta epochs compact: GC'd chain, restart over compact+delta ≡ full build") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pr_compact").toString
    val m1 = new PageRankStream.Maintainer(spark, stateDir = Some(dir), compactEvery = 2)
    m1.update(allEdges.take(20).toDF("src", "dst"), epochId = 0L)      // delta
    m1.update(allEdges.slice(20, 40).toDF("src", "dst"), epochId = 1L) // compact
    m1.update(allEdges.slice(40, 60).toDF("src", "dst"), epochId = 2L) // delta
    assert(!new java.io.File(dir, "commits/0").exists, "epoch 0 should be GC'd")
    assert(new java.io.File(dir, "compacts/1").exists)
    val m2 = new PageRankStream.Maintainer(spark, stateDir = Some(dir), compactEvery = 2)
    assert(m2.resumed)
    assert(rankSet(m2.ranks()) === batchRanks(allEdges.take(60)))
  }

  test("checkpoint without stateDir is refused") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Edge]
    val m = new PageRankStream.Maintainer(spark)
    val cp = java.nio.file.Files.createTempDirectory("graft_pr_cp").toString
    val e = intercept[IllegalArgumentException] {
      PageRankStream.start(input.toDS(), m, checkpoint = Some(cp))
    }
    assert(e.getMessage.contains("stateDir"))
  }
}
