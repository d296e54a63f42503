package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Reference model: the same truncating-integer recurrence on plain
    * Scala maps — the spec's ground truth for the distributed job.
    */
  private def model(
      edges: Seq[(Long, Long)],
      iters: Int,
      scale: Long = 1000000000000L
  ): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = scale / nodes.size
    val tele = (15L * base) / 100L
    var r = nodes.map(_ -> base).toMap
    for (_ <- 0 until iters) {
      val incoming = e
        .map { case (s, d) => d -> r(s) / outdeg(s) }
        .groupBy(_._1)
        .map { case (d, xs) => d -> xs.map(_._2).sum }
      r = nodes.map(v => v -> (tele + (85L * incoming.getOrElse(v, 0L)) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank
      .integerPageRank(edges.toDF("src", "dst"), iters = iters)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  test("path graph matches the integer reference model exactly") {
    // symmetrized path 1—2—3: hub 2 must outrank the leaves
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val got = run(edges, iters = 3)
    assert(got === model(edges, 3))
    assert(got(2L) > got(1L) && got(1L) === got(3L))
  }

  test("star graph: center accumulates rank, leaves stay symmetric") {
    val star = (2L to 6L).flatMap(l => Seq((1L, l), (l, 1L)))
    val got = run(star, iters = 3)
    assert(got === model(star, 3))
    assert((2L to 6L).map(got).toSet.size === 1)
    assert(got(1L) > got(2L))
  }

  test("dangling sink evaporates mass but still receives teleport + incoming") {
    // directed 1→2 only: node 2 has no out-edges
    val edges = Seq((1L, 2L))
    val got = run(edges, iters = 2)
    assert(got === model(edges, 2))
    assert(got(2L) > got(1L))
  }

  test("result is partitioning-invariant (exact integer determinism)") {
    val edges = for { a <- 1L to 20L; b <- 1L to 20L if (a + b) % 3 == 0 && a != b }
      yield (a, b)
    val df = edges.toDF("src", "dst")
    val a = PageRank.integerPageRank(df, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.integerPageRank(df.repartition(13, col("dst")), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("symmetric graph conserves mass up to truncation loss") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L))
    val total = run(edges, iters = 3).values.sum
    val scale = 1000000000000L
    // damping deliberately re-injects only ~100% (15% tele + 85% flow);
    // truncation can only lose — total must stay within a tight band
    assert(total <= scale && total > (scale / 100L) * 99L)
  }
}
