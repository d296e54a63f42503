package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** x145's operator: greedy MMR over the banded int-LSH top-10. The
  * load-bearing row is the diversity inequality — the whole point of
  * MMR is that its picks are less self-similar than the plain top-k's.
  */
class MmrSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  graft.functions.GraftFunctions.register(spark)
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private lazy val picks = Similarity
    .mmrDiversifyIntLsh(emb, k = 3, candK = 10)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    .groupBy(_._1)

  private lazy val plain = Similarity
    .knnGraphIntLsh(emb, k = 10)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    .groupBy(_._1)
    .map { case (q, rows) => q -> rows.sortBy(_._3).map(_._2).toSeq }

  private lazy val vecs: Map[Long, Array[Double]] = emb
    .select(col("vec_id"), col("embedding"))
    .collect()
    .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    .toMap

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(v => v * v).sum)
    val nb = math.sqrt(b.map(v => v * v).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  private def meanPairSim(ids: Seq[Long]): Double = {
    val ps = for (i <- ids.indices; j <- i + 1 until ids.size)
      yield cos(vecs(ids(i)), vecs(ids(j)))
    if (ps.isEmpty) 0.0 else ps.sum / ps.size
  }

  test("structure: picks come from the candidate set, distinct, positions 1..k") {
    picks.foreach { case (q, rows) =>
      val ids = rows.sortBy(_._3).map(_._2).toSeq
      assert(ids.distinct.size === ids.size, s"query $q repeated a pick")
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length), s"query $q positions")
      val candSet = plain(q).toSet
      assert(ids.forall(candSet), s"query $q picked outside its candidates")
    }
  }

  test("position 1 is the plain relevance winner") {
    picks.foreach { case (q, rows) =>
      val p1 = rows.find(_._3 == 1).get._2
      assert(p1 === plain(q).head, s"query $q pos-1 != rank-1")
    }
  }

  test("diversity: MMR picks are less self-similar than the plain top-3 in " +
    "aggregate, strictly on some queries") {
    // NOTE deliberately aggregate: greedy MMR minimizes each pick's
    // max-similarity TO THE SELECTED SET, which does not bound the mean
    // pairwise similarity of the final set per query (a low-max pick
    // can still pull the mean up) — asserting per-query set-level
    // dominance fails on real data (query 452 at sf0.001), correctly.
    val triples = picks.filter(_._2.length == 3)
    assert(triples.nonEmpty, "no query produced 3 picks")
    var mmrTotal = 0.0
    var plainTotal = 0.0
    var strictly = 0
    triples.foreach { case (q, rows) =>
      val mmrIds = rows.sortBy(_._3).map(_._2).toSeq
      val plainIds = plain(q).take(3)
      val (m, p) = (meanPairSim(mmrIds), meanPairSim(plainIds))
      mmrTotal += m; plainTotal += p
      if (m < p - 1e-9) strictly += 1
    }
    assert(mmrTotal < plainTotal, "aggregate diversity did not improve")
    assert(strictly > 0, "MMR never strictly diversified any query — λ-blend inert")
  }

  test("per-step contract: each later pick's max-sim to the already-picked " +
    "set is minimal among candidates tied on the blend's relevance trade") {
    // the property greedy MMR DOES guarantee, checked with independently
    // recomputed cosines (plain double loop, ±1 ppm slack for the 1-ulp
    // drift between this loop and the codegen'd expression's rounding)
    def simPpm(a: Long, b: Long): Long = math.rint(cos(vecs(a), vecs(b)) * 1e6).toLong
    picks.foreach { case (q, rows) =>
      val order = rows.sortBy(_._3).map(_._2).toSeq
      val cands = plain(q)
      val candScore = cands.map(id => id -> simPpm(q, id)).toMap
      for (step <- 1 until order.length) {
        val selected = order.take(step)
        val winner = order(step)
        def blend(c: Long): Long = {
          val maxSim = selected.map(s => simPpm(c, s)).max
          (7L * candScore(c) - 3L * maxSim) / 10L
        }
        val remaining = cands.filterNot(selected.contains)
        val wb = blend(winner)
        remaining.foreach { c =>
          assert(blend(c) <= wb + 1L,
            s"query $q step ${step + 1}: candidate $c blend ${blend(c)} beats winner $winner blend $wb")
        }
      }
    }
  }
}
