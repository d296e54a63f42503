package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Delta

/** Property tests over random snapshot/state pairs (SURVEY.md §5.2):
  *   - row count invariant under the delta join (the reference's historical
  *     duplication bug, main.py:355 "FIXED DUPLICATION");
  *   - every output SYMBOL appears exactly once;
  *   - OI_Change = OI − prevOI whenever the symbol is in (cleaned, keep-last)
  *     state, else 0; Open likewise (main.py:294-308).
  * ScalaCheck generators driven directly with fixed seeds (deterministic;
  * the scalatest-scalacheck bridge artifact is not on the classpath).
  */
class DeltaPropertySpec extends SparkSpec {
  import spark.implicits._

  private val symGen = Gen.oneOf((1 to 12).map(i => s"S$i"))
  private val currentGen = Gen.listOfN(
    12,
    for {
      s <- symGen
      close <- Gen.choose(0.0, 100.0).map(v => math.rint(v * 100) / 100)
      oi <- Gen.choose(0L, 1000L)
    } yield (s, close, oi)
  )
  private val stateGen = Gen.listOfN(
    18,
    for {
      s <- symGen
      close <- Gen.oneOf(
        Gen.choose(0.0, 100.0).map(v => f"$v%.2f"),
        Gen.const("garbage"),
        Gen.const(""))
      oi <- Gen.oneOf(Gen.choose(0L, 1000L).map(_.toString), Gen.const("junk"))
    } yield (s, close, oi)
  )

  test("delta join invariants hold for random snapshot/state pairs") {
    (1 to 8).foreach { trial =>
      val seed = Seed(trial.toLong * 7919)
      val cur = currentGen.pureApply(Gen.Parameters.default, seed)
      val st = stateGen.pureApply(Gen.Parameters.default, seed.next)

      // keep-last per symbol on the current side, as the pipeline does
      val curDedup = cur.zipWithIndex
        .groupBy(_._1._1)
        .map { case (_, rows) => rows.maxBy(_._2)._1 }
        .toSeq
      val curDf = curDedup.toDF("SYMBOL", "Close", "OI")
      val stDf = st.zipWithIndex
        .map { case ((s, c, o), i) => (s, c, o, i.toLong) }
        .toDF("SYMBOL", "Close", "OI", "state_seq")

      val out = Delta.applyDelta(curDf, Delta.prepareState(stDf, "state_seq")).collect()

      assert(out.length === curDedup.length, s"trial $trial: row count changed by join")
      assert(
        out.map(_.getString(0)).distinct.length === out.length,
        s"trial $trial: duplicate symbols")

      val lastState = st.zipWithIndex.groupBy(_._1._1).map { case (s, rows) =>
        val (_, c, o) = rows.maxBy(_._2)._1
        s -> ((scala.util.Try(c.toDouble).getOrElse(0.0), scala.util.Try(o.toLong).getOrElse(0L)))
      }
      out.foreach { r =>
        val sym = r.getString(0)
        val oi = r.getLong(r.fieldIndex("OI"))
        val open = r.getDouble(r.fieldIndex("Open"))
        val chg = r.getLong(r.fieldIndex("OI_Change"))
        lastState.get(sym) match {
          case Some((pc, poi)) =>
            assert(open === pc, s"trial $trial: Open for $sym")
            assert(chg === oi - poi, s"trial $trial: OI_Change for $sym")
          case None =>
            assert(open === 0.0, s"trial $trial: Open for unseen $sym")
            assert(chg === 0L, s"trial $trial: OI_Change for unseen $sym")
        }
      }
    }
  }
}
