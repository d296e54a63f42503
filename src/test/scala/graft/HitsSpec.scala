package graft

import org.apache.spark.sql.functions._
import graft.operators.Hits

class HitsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference model: the same synchronous unnormalized recurrence on
    * plain Scala maps — h and a both advance from the previous round.
    */
  private def model(edges: Seq[(Long, Long)], rounds: Int): Map[Long, (Long, Long)] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var h = nodes.map(_ -> 1L).toMap
    var a = nodes.map(_ -> 1L).toMap
    for (_ <- 1 to rounds) {
      val aNext = e.groupBy(_._2).map { case (v, es) => v -> es.map(x => h(x._1)).sum }
      val hNext = e.groupBy(_._1).map { case (u, es) => u -> es.map(x => a(x._2)).sum }
      a = nodes.map(n => n -> aNext.getOrElse(n, 0L)).toMap
      h = nodes.map(n => n -> hNext.getOrElse(n, 0L)).toMap
    }
    nodes.map(n => n -> ((h(n), a(n)))).toMap
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int, parts: Int = 4): Map[Long, (Long, Long)] =
    Hits
      .hubsAndAuthorities(edges.toDF("src", "dst").repartition(parts), rounds)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("round-by-round parity with the reference model on an asymmetric graph") {
    // 1 → {10, 11}, 2 → {10}, 11 → {12}: mixed roles — node 11 is both
    // an authority (pointed at by 1) and a hub (points at 12)
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (11L, 12L))
    for (r <- 0 to 3) assert(run(edges, r) === model(edges, r), s"rounds=$r")
  }

  test("hand-checked round 2: auth = sum of in-neighbor outdegs, hub = sum of out-neighbor indegs") {
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (11L, 12L))
    val got = run(edges, 2)
    // outdeg: 1→2, 2→1, 11→1; indeg: 10→2, 11→1, 12→1
    // auth2(10) = outdeg(1)+outdeg(2) = 3; auth2(11) = outdeg(1) = 2;
    // auth2(12) = outdeg(11) = 1; hub2(1) = indeg(10)+indeg(11) = 3;
    // hub2(2) = indeg(10) = 2; hub2(11) = indeg(12) = 1
    assert(got === Map(
      1L -> ((3L, 0L)), 2L -> ((2L, 0L)),
      10L -> ((0L, 3L)), 11L -> ((1L, 2L)), 12L -> ((0L, 1L))))
  }

  test("bipartite zeros: pure sources keep auth 0, pure sinks keep hub 0, from round 1 on") {
    val edges = Seq((1L, 100L), (2L, 100L), (2L, 101L))
    val got = run(edges, 1)
    assert(got(1L)._2 === 0L && got(2L)._2 === 0L)
    assert(got(100L)._1 === 0L && got(101L)._1 === 0L)
    // and every score strictly positive on its own role side
    assert(got(1L)._1 > 0 && got(100L)._2 > 0)
  }

  test("duplicate edges collapse to simple-graph semantics") {
    val dup = Seq((1L, 10L), (1L, 10L), (1L, 10L), (2L, 10L))
    assert(run(dup, 2) === run(dup.distinct, 2))
  }

  test("rounds=0 returns the all-ones start; result is partitioning-invariant") {
    val edges = Seq((1L, 10L), (2L, 10L))
    assert(run(edges, 0) === Map(1L -> ((1L, 1L)), 2L -> ((1L, 1L)), 10L -> ((1L, 1L))))
    val e5 = Seq((1L, 10L), (1L, 11L), (2L, 10L), (11L, 12L), (12L, 1L))
    assert(run(e5, 3, parts = 1) === run(e5, 3, parts = 7))
  }
}
