package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** BM25's exact-integer contract, pinned against an independent Scala
  * replay (same staged floor divisions, computed with plain Longs) plus
  * the ranking properties the score must deliver: idf discrimination,
  * length normalization, tf saturation, term-set query semantics.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._
  graft.functions.GraftFunctions.register(spark)

  /** Independent fold of the documented contract (k1=1200, b=750 milli). */
  private def refBm25(
      docs: Seq[(Long, String)],
      queries: Seq[(Long, Seq[String])],
      k: Int
  ): Set[(Long, Long, Long, Int)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
    val n = toks.size.toLong
    val tot = math.max(toks.values.map(_.size.toLong).sum, 1L)
    val df = toks.values.toSeq.flatMap(_.distinct)
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    (for {
      (qid, terms) <- queries
      scored = toks.keys.toSeq.flatMap { d =>
        val tl = toks(d)
        val len = tl.size.toLong
        val score = terms.distinct.flatMap { term =>
          val tf = tl.count(_ == term).toLong
          if (tf == 0) None
          else {
            val lfPpm = 250L * 1000L + 750L * (len * n * 1000L / tot)
            val tfC = math.min(tf, 4000L)
            val denomU = tfC * 1000000L + 1200L * lfPpm / 1000L
            val normPpm = tfC * 2200L * 1000000000000L / (1000L * denomU)
            val idfPpm = (n - df(term)) * 1000000L / (df(term) + 1L)
            Some(idfPpm * (normPpm / 1000L) / 1000L)
          }
        }.sum
        if (score > 0 || terms.distinct.exists(t => tl.contains(t))) Some((d, score)) else None
      }
      ranked = scored.sortBy { case (d, s) => (-s, d) }.take(k)
      ((d, s), i) <- ranked.zipWithIndex
    } yield (qid, d, s, i + 1)).toSet
  }

  private def run(
      docs: Seq[(Long, String)],
      queries: Seq[(Long, Seq[String])],
      k: Int
  ): Set[(Long, Long, Long, Int)] =
    Retrieval
      .bm25TopK(docs.toDF("doc_id", "text"), queries.toDF("query_id", "terms"), k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet

  test("contract parity with the independent Scala replay on a random corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    val docs = (1L to 20L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val queries = Seq(
      (100L, Seq("alpha", "zeta")),
      (101L, Seq("gamma")),
      (102L, Seq("eta", "eta", "beta")))
    assert(run(docs, queries, 4) === refBm25(docs, queries, 4))
  }

  test("idf discrimination: the doc matching the rare term outranks the common-term doc") {
    val docs = Seq(
      (1L, "common common filler filler"),
      (2L, "rare filler filler filler"),
      (3L, "common filler filler filler"),
      (4L, "common filler filler filler"),
      (5L, "common filler filler filler"))
    val got = run(docs, Seq((9L, Seq("rare", "common"))), 5)
    val rank1 = got.find(t => t._1 == 9L && t._4 == 1).get
    assert(rank1._2 === 2L, s"rare-term doc should rank first, got $got")
  }

  test("length normalization: same tf, shorter doc scores higher (b > 0)") {
    val docs = Seq(
      (1L, "hit pad"),
      (2L, "hit pad pad pad pad pad pad pad pad pad pad pad"),
      (3L, "zz yy xx ww vv uu"))
    val got = run(docs, Seq((9L, Seq("hit"))), 2).toSeq.sortBy(_._4)
    assert(got.map(_._2) === Seq(1L, 2L))
    assert(got(0)._3 > got(1)._3)
  }

  test("duplicate query terms count once (term-set semantics)") {
    val docs = Seq((1L, "hit pad pad"), (2L, "miss pad pad"))
    val once = run(docs, Seq((9L, Seq("hit"))), 1)
    val twice = run(docs, Seq((9L, Seq("hit", "hit", "hit"))), 1)
    assert(once.map(t => (t._2, t._3)) === twice.map(t => (t._2, t._3)))
  }

  test("tf saturation: tf growth raises the score sublinearly") {
    // extra hit-free docs keep df < N so idf stays positive
    val docs = Seq(
      (1L, ("hit " * 1 + "pad " * 9).trim),
      (2L, ("hit " * 5 + "pad " * 5).trim),
      (3L, ("hit " * 10).trim)) ++
      (4L to 9L).map(i => (i, s"none$i at$i all$i here$i truly$i"))
    val got = run(docs, Seq((9L, Seq("hit"))), 3).toSeq.sortBy(_._4)
    // ranks follow tf (same doc length = 10 everywhere hit appears)
    assert(got.map(_._2) === Seq(3L, 2L, 1L))
    val byDoc = got.map(t => t._2 -> t._3).toMap
    assert(byDoc(1L) > 0L)
    // sublinear: 5x / 10x the tf gives far less than 5x / 10x the score
    assert(byDoc(2L) < 5L * byDoc(1L))
    assert(byDoc(3L) < 10L * byDoc(1L))
  }
}
