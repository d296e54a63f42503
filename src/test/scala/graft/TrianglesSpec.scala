package graft

import org.apache.spark.sql.functions._

import graft.operators.Triangles

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)]) =
    Triangles
      .perNode(edges.toDF("a", "b"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))))
      .toMap

  test("hand-built graph: K4 plus a pendant — exact counts and cc") {
    // K4 on a,b,c,d (4 triangles, each node in 3) + pendant e-a
    val k4 = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"))
    val got = run(k4 :+ (("e", "a")))
    // a: deg 4, 3 triangles, cc = 2*3/12 = 0.5 → 500000 ppm
    assert(got("a") === ((4L, 3L, 500000L)))
    // b,c,d: deg 3, 3 triangles, cc = 2*3/6 = 1.0
    Seq("b", "c", "d").foreach(n => assert(got(n) === ((3L, 3L, 1000000L)), n))
    // e: deg 1, 0 triangles, cc NULL
    assert(got("e") === ((1L, 0L, -1L)))
  }

  test("triangle-free graph (star + path): all zero") {
    val star = Seq(("hub", "s1"), ("hub", "s2"), ("hub", "s3"), ("s3", "t1"), ("t1", "t2"))
    val got = run(star)
    assert(got.values.forall(_._2 === 0L))
    assert(got("hub") === ((3L, 0L, 0L)))
  }

  /** Brute-force per-node triangle counts from an adjacency set. */
  private def refTriangles(edges: Seq[(String, String)]): Map[String, Long] = {
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keys.toSeq.sorted
    nodes.map { u =>
      val ns = adj(u).toSeq
      u -> ns.combinations(2).count { case Seq(v, w) => adj(v).contains(w) }.toLong
    }.toMap
  }

  test("brute-force parity on a dense-ish random graph with a heavy hub") {
    // hub connected to everything (the last-reducer case the orientation
    // exists for) + deterministic scattered edges
    val others = (0 until 40).map(i => f"n$i%02d")
    val hub = others.map(("hub", _))
    val scattered = (0 until 120).map(i => (others(i % 40), others((i * 7 + 3) % 40)))
      .filter { case (x, y) => x != y }
    val edges = hub ++ scattered
    val want = refTriangles(edges)
    val got = run(edges)
    assert(got.keySet === want.keySet)
    want.foreach { case (n, t) => assert(got(n)._2 === t, s"node $n") }
    assert(want.values.sum > 0, "graph accidentally triangle-free")
  }

  test("canonicalization: duplicates, reversed duplicates, self-loops don't change counts") {
    val base = Seq(("a", "b"), ("b", "c"), ("a", "c"))
    val dirty = base ++ base.map(_.swap) ++ base ++ Seq(("a", "a"), ("c", "c"))
    assert(run(dirty) === run(base))
    assert(run(base)("a") === ((2L, 1L, 1000000L)))
  }
}
