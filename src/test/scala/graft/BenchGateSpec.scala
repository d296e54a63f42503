package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench environment-poisoning gate over SYNTHETIC detail JSONs —
  * no Spark, no host: pure trigger logic (r13 verdict #3). The scenario
  * the cycles-primary gate exists for: a host that slows its clock
  * burns proportionally more cpu-seconds at proportionally lower MHz on
  * identical plans; the old raw-cpu trigger read that as an engine
  * regression and forced two wall-baseline re-captures in one round.
  */
class BenchGateSpec extends AnyFunSuite {

  // a miniature committed bench_full.json in the writer's exact field
  // order — the same text shape parseBaseline runs against in production
  private val baselineJson =
    """{"metric":"total","value":3.0,"detail":{
      |"q01_pricing":{"runs":[1.000,1.100,1.050],"cpu":4.0,"cpus":[4.000,4.200,4.100],"jit":[0,0,0],"gc":[0,0,0],"host":[4,4,4],"steal":[0,0,0],"mhz":[2600.0,2600.0,2600.0],"thr":[0,0,0],"env_suspect":false,"requeued":false,"warm_ok":true},
      |"x09_cosine":{"runs":[0.300,0.310,0.290],"cpu":1.0,"cpus":[1.000,1.050,1.020],"jit":[0,0,0],"gc":[0,0,0],"host":[1,1,1],"steal":[0,0,0],"mhz":[2600.0,2600.0,2600.0],"thr":[0,0,0],"env_suspect":false,"requeued":false,"warm_ok":true}
      |}}""".stripMargin.replace("\n", "")

  test("parseBaseline: per-query bests and the median mhz") {
    val b = BenchGate.parseBaseline(baselineJson)
    assert(b.best === Map(
      "q01_pricing" -> ((1.0, 4.0)),
      "x09_cosine" -> ((0.29, 1.0))))
    assert(b.mhz === 2600.0)
  }

  test("frequency drift is NOT suspect: 1.9x cpu at 0.52x clock is flat cycles") {
    // the r9/r13 capped-host regime: cpu-seconds scale with 1/mhz on
    // identical plans. Raw-cpu would fire (7.6 > 2·4.0 + floor); the
    // cycles form sees 7.6·1360 ≈ 4.0·2600 and stays quiet.
    val suspect = BenchGate.envSuspect(
      walls = Seq(1.9, 2.0, 1.95),
      cpus = Seq(7.6, 7.9, 7.7),
      base = Some((1.0, 4.0)),
      runMhz = 1360.0,
      baseMhz = 2600.0)
    // wall trigger would fire at >2x wall though (1.9 < 2.0 — under it)
    assert(!suspect, "flat cycles at a slower clock must not be suspect")
  }

  test("genuine cpu regression fires at flat clock (cycles-primary)") {
    assert(BenchGate.envSuspect(
      walls = Seq(2.3, 2.4, 2.35),
      cpus = Seq(9.0, 9.2, 9.1),
      base = Some((1.0, 4.0)),
      runMhz = 2600.0,
      baseMhz = 2600.0), "2.25x cycles at the same clock is a regression")
  }

  test("raw-cpu fallback fires when mhz is unknown on either side") {
    assert(BenchGate.envSuspect(
      walls = Seq(2.3), cpus = Seq(9.0),
      base = Some((1.0, 4.0)), runMhz = 0.0, baseMhz = 2600.0))
    assert(BenchGate.envSuspect(
      walls = Seq(2.3), cpus = Seq(9.0),
      base = Some((1.0, 4.0)), runMhz = 2600.0, baseMhz = 0.0))
  }

  test("wall stays the secondary net: scheduler starvation with flat cpu fires") {
    // co-tenant wall inflation with NO cpu inflation — invisible to
    // cycles, caught by the wall gate (the r11 x29/x31 shape)
    assert(BenchGate.envSuspect(
      walls = Seq(2.5, 2.6, 2.7),
      cpus = Seq(4.0, 4.1, 4.05),
      base = Some((1.0, 4.0)),
      runMhz = 2600.0,
      baseMhz = 2600.0), "2.5x wall at flat cycles must still be suspect")
  }

  test("spread trigger: cleanest-3 cpu disagreement > 3x with the 0.5 s floor") {
    assert(BenchGate.envSuspect(
      walls = Seq(1.0, 1.0, 1.0), cpus = Seq(1.0, 2.0, 27.0),
      base = None, runMhz = 0.0, baseMhz = 0.0))
    // tiny-query timer noise under the absolute floor must not trip
    assert(!BenchGate.envSuspect(
      walls = Seq(0.05, 0.06, 0.05), cpus = Seq(0.05, 0.06, 0.2),
      base = None, runMhz = 0.0, baseMhz = 0.0))
  }

  test("small absolute drift under the floor never fires (the 1.4x r13 case)") {
    // the r13 host drift: ~1.4x cpu-seconds at flat MHz — REAL slowdown,
    // but under the 2x line; the gate must not force a re-baseline
    assert(!BenchGate.envSuspect(
      walls = Seq(1.4, 1.45, 1.42),
      cpus = Seq(5.6, 5.7, 5.65),
      base = Some((1.0, 4.0)),
      runMhz = 2600.0,
      baseMhz = 2600.0))
  }

  test("totalRatios: drift reads as wall-up / cycles-flat in-band") {
    val b = BenchGate.parseBaseline(baselineJson)
    // same engine work at a 2x-slower effective host: wall 2x, cpu 2x,
    // clock halved → cycles flat
    val run = Seq(
      ("q01_pricing", 2.0, 8.0, 1300.0),
      ("x09_cosine", 0.58, 2.0, 1300.0),
      ("x_unmatched", 9.9, 9.9, 1300.0)) // not in baseline — excluded
    val (wallRatio, cyclesRatio) = BenchGate.totalRatios(run, b)
    assert(math.abs(wallRatio - 2.0) < 0.01, s"wall ratio $wallRatio")
    assert(math.abs(cyclesRatio - 1.0) < 0.01, s"cycles ratio $cyclesRatio")
    // an engine regression moves BOTH
    val reg = Seq(("q01_pricing", 2.0, 8.0, 2600.0), ("x09_cosine", 0.58, 2.0, 2600.0))
    val (w2, c2) = BenchGate.totalRatios(reg, b)
    assert(math.abs(w2 - 2.0) < 0.01 && math.abs(c2 - 2.0) < 0.01, s"$w2 $c2")
    // empty overlap → (0, 0), never a divide-by-zero
    assert(BenchGate.totalRatios(Seq(("zzz", 1.0, 1.0, 2600.0)), b) === ((0.0, 0.0)))
  }
}
