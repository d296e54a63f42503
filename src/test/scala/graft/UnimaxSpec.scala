package graft

import org.apache.spark.sql.functions._
import graft.operators.Mix

/** Mix.unimaxQuotas (x107): exact waterfill — saturation prefix,
  * remainder split, budget conservation, epoch cap.
  */
class UnimaxSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long)], budget: Long, cap: Long = 1L) =
    Mix.unimaxQuotas(rows.toDF("lang", "n_tok"), col("lang"), col("n_tok"), budget, cap)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("cap"), r.getAs[Long]("quota"),
          r.getAs[Long]("keep_ppm"), r.getAs[Boolean]("saturated"))))
      .toMap

  test("hand waterfill: small languages saturate, the rest split the rest") {
    // caps 10, 100, 1000; B = 500: 10 saturates (10*3=30<=500), then
    // 100*2=200 <= 490 saturates, leaving 390 for the last → quota 390.
    val out = run(Seq(("big", 1000L), ("mid", 100L), ("small", 10L)), 500L)
    assert(out("small") === ((10L, 10L, 10L, 1000000L, true)))
    assert(out("mid") === ((100L, 100L, 100L, 1000000L, true)))
    assert(out("big") === ((1000L, 1000L, 390L, 390000L, false)))
  }

  test("remainder split: first unsaturated languages in sort order get +1") {
    // three equal languages, B = 100: none saturates (30*3=90 <= 100
    // saturates! careful) — use caps 40 each: 40*3=120 > 100 → none
    // saturates; base = 33, rem 1 → 'a' gets 34.
    val out = run(Seq(("a", 40L), ("b", 40L), ("c", 40L)), 100L)
    assert(out("a")._3 === 34L)
    assert(out("b")._3 === 33L)
    assert(out("c")._3 === 33L)
    assert(out.values.map(_._3).sum === 100L)
  }

  test("budget above total capacity saturates everything, no invention") {
    val out = run(Seq(("a", 5L), ("b", 7L)), 1000L, cap = 2L)
    assert(out("a") === ((5L, 10L, 10L, 2000000L, true)))
    assert(out("b") === ((7L, 14L, 14L, 2000000L, true)))
  }

  test("quotas sum to min(budget, total capacity) on seeded data") {
    val rnd = new scala.util.Random(11)
    val langs = (0 until 12).map(i => (s"l$i", (rnd.nextInt(1000) + 1).toLong))
    val capTot = langs.map(_._2).sum
    Seq(capTot / 3, capTot - 1, capTot + 50).foreach { b =>
      val out = run(langs, b)
      assert(out.values.map(_._3).sum === math.min(b, capTot), s"budget $b")
      // no unsaturated quota exceeds any saturated cap's fill level
      out.values.foreach { case (_, c, q, _, sat) => if (!sat) assert(q <= c) }
    }
  }
}
