package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, RangeJoin}

/** Property pins for the two composed time-series joins: on seeded random
  * data, the distributed formulations must agree exactly with naive
  * in-memory reference implementations of the same semantics.
  */
class JoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomCase(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val keys = 1 to 4
    val left = for {
      k <- keys; i <- 1 to 25
    } yield (k.toLong, (k * 1000 + i).toLong, rnd.nextInt(500).toLong, rnd.nextInt(100).toDouble)
    val right = for {
      k <- keys; i <- 1 to 15
    } yield (k.toLong, (k * 100 + i).toLong, rnd.nextInt(500).toLong, rnd.nextInt(100).toDouble)
    (left, right)
  }

  test("asof: distributed union+window ≡ naive per-row scan on random data") {
    for (seed <- Seq(11, 23, 47)) {
      val (left, right) = randomCase(seed)
      // ties in right ts within a key make "the latest right row" ambiguous;
      // keep one row per (key, ts) like real state streams do
      val rightDedup = right.groupBy(r => (r._1, r._3)).map(_._2.maxBy(_._2)).toSeq

      val lDf = left.toDF("k", "lid", "lts", "lval")
      val rDf = rightDedup.toDF("k", "rid", "rts", "rval")
      val got = AsofJoin
        .backward(lDf, rDf, Seq("k"), "lts", "rts")
        .collect()
        .map(r => (r.getLong(1), Option(r.get(4)).map(_.asInstanceOf[Long])))
        .toMap

      val want = left.map { case (k, lid, lts, _) =>
        val candidates = rightDedup.filter(r => r._1 == k && r._3 <= lts)
        lid -> (if (candidates.isEmpty) None else Some(candidates.maxBy(_._3)._2))
      }.toMap

      assert(got === want, s"seed=$seed")
    }
  }

  test("asof forward: time-negation path ≡ naive earliest-at-or-after scan") {
    for (seed <- Seq(31, 59)) {
      val (left, right) = randomCase(seed)
      val rightDedup = right.groupBy(r => (r._1, r._3)).map(_._2.maxBy(_._2)).toSeq

      val got = AsofJoin
        .forward(
          left.toDF("k", "lid", "lts", "lval"),
          rightDedup.toDF("k", "rid", "rts", "rval"),
          Seq("k"), "lts", "rts")
        .collect()
        .map(r => (r.getLong(1), Option(r.get(4)).map(_.asInstanceOf[Long])))
        .toMap

      val want = left.map { case (k, lid, lts, _) =>
        val candidates = rightDedup.filter(r => r._1 == k && r._3 >= lts)
        lid -> (if (candidates.isEmpty) None else Some(candidates.minBy(_._3)._2))
      }.toMap

      assert(got === want, s"seed=$seed")
    }
  }

  test("range: bin-blocked join ≡ naive containment filter on random data") {
    for (seed <- Seq(5, 17); binWidth <- Seq(13L, 100L)) {
      val rnd = new scala.util.Random(seed)
      val points = (1 to 80).map(i =>
        ((i % 3 + 1).toLong, i.toLong, rnd.nextInt(400).toLong))
      val intervals = (1 to 30).map { i =>
        val s = rnd.nextInt(400).toLong
        ((i % 3 + 1).toLong, (1000 + i).toLong, s, s + rnd.nextInt(80).toLong)
      }

      val got = RangeJoin
        .binned(
          points.toDF("k", "pid", "pts"),
          intervals.toDF("k", "ivid", "s", "e"),
          Seq("k"), "pts", "s", "e", binWidth)
        .select("pid", "ivid")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))

      val want = for {
        (pk, pid, pts) <- points
        (ik, ivid, s, e) <- intervals
        if pk == ik && pts >= s && pts <= e
      } yield (pid, ivid)

      assert(got.toSet === want.toSet, s"seed=$seed binWidth=$binWidth")
      assert(got.length === want.length, s"duplicates: seed=$seed binWidth=$binWidth")
    }
  }
}
