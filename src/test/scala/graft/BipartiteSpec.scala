package graft

import org.apache.spark.sql.functions._
import graft.operators.Bipartite

class BipartiteSpec extends SparkSpec {
  import spark.implicits._

  /** Reference projection on Scala collections: distinct incidence,
    * right-degree cap, a<b pair counts, minShared cut.
    */
  private def ref(
      edges: Seq[(Long, Long)], maxDeg: Int, minShared: Long): Set[(Long, Long, Long)] = {
    val e = edges.distinct
    val keptR = e.groupBy(_._2).filter(_._2.size <= maxDeg).keySet
    val byR = e.filter(x => keptR(x._2)).groupBy(_._2).values
    byR
      .flatMap { es =>
        val ls = es.map(_._1).sorted
        for { i <- ls.indices; j <- (i + 1) until ls.size } yield (ls(i), ls(j))
      }
      .groupBy(identity)
      .map { case (p, o) => (p._1, p._2, o.size.toLong) }
      .filter(_._3 >= minShared)
      .toSet
  }

  private def run(
      edges: Seq[(Long, Long)], maxDeg: Int, minShared: Long, parts: Int = 4
  ): Set[(Long, Long, Long)] =
    Bipartite
      .coOccurrencePairs(
        edges.toDF("l", "r").repartition(parts), "l", "r", maxDeg, minShared)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("projection parity with the reference, duplicate incidence collapsed") {
    val edges = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L),          // item 100 shared by 1,2,3
      (1L, 101L), (2L, 101L),                      // 101 shared by 1,2
      (1L, 101L),                                  // duplicate row
      (3L, 102L), (4L, 102L),
      (5L, 103L)                                   // lone visitor
    )
    assert(run(edges, maxDeg = 10, minShared = 1) === ref(edges, 10, 1))
    // weight accumulates across items: (1,2) share 100 AND 101
    assert(run(edges, 10, 2) === Set((1L, 2L, 2L)))
  }

  test("hub cap excludes the quadratic item and ONLY that item") {
    val hub = (1L to 6L).map(c => (c, 999L)) // degree 6 hub
    val tail = Seq((1L, 50L), (2L, 50L), (1L, 51L), (2L, 51L))
    val edges = hub ++ tail
    // cap below the hub degree: only the tail items project
    assert(run(edges, maxDeg = 5, minShared = 1) === Set((1L, 2L, 2L)))
    // cap at the hub degree: the 15 hub pairs appear
    val withHub = run(edges, maxDeg = 6, minShared = 1)
    assert(withHub.size === 15) // C(6,2) distinct pairs; (1,2) merges tail+hub weight
    assert(withHub.contains((1L, 2L, 3L))) // 999 + 50 + 51
  }

  test("pairs are canonical a<b and the result is partitioning-invariant") {
    val edges = Seq((9L, 1L), (3L, 1L), (5L, 1L), (9L, 2L), (3L, 2L))
    val a = run(edges, 10, 1, parts = 1)
    assert(a === run(edges, 10, 1, parts = 7))
    assert(a.forall(p => p._1 < p._2))
    assert(a.contains((3L, 9L, 2L)))
  }
}
