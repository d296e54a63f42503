package graft

import org.apache.spark.sql.functions._
import graft.operators.Paths

class PathsSpec extends SparkSpec {
  import spark.implicits._

  test("seedDistance: multi-hop exact distances, min over two seeds, unreachable NULL, off-graph seed surfaces") {
    // path 1-2-3-4-5 seeded at both ends → dists 0,1,2,1,0;
    // isolated edge 8-9 unreachable → NULL; seed 99 not in the graph
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L)).toDF("a", "b")
    val seeds = Seq(1L, 5L, 99L).toDF("node")
    val out = Paths
      .seedDistance(edges, seeds)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out === Map(
      1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L,
      8L -> -1L, 9L -> -1L, 99L -> 0L))
  }

  test("seedDistance: maxIters truncation leaves the tail NULL; invariance under direction and partitioning") {
    val chain = (0L until 20L).map(i => (i, i + 1)).toDF("a", "b")
    val seeds = Seq(0L).toDF("node")
    val cut = Paths
      .seedDistance(chain, seeds, maxIters = 5)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(cut(5L) === 5L)
    assert(cut(6L) === -1L) // beyond the round budget: honestly unsettled
    def run(e: org.apache.spark.sql.DataFrame) = Paths
      .seedDistance(e, seeds)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val base = run(chain)
    assert(base(20L) === 20L)
    assert(base === run(chain.select($"b".as("a"), $"a".as("b")).repartition(7)))
  }
}
