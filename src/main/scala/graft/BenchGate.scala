package graft

/** The bench artifact's environment-poisoning gate, extracted from
  * [[Bench]] so the trigger logic is spec-testable against synthetic
  * detail JSONs (r13 verdict #3).
  *
  * WHY CYCLES, NOT SECONDS: the r13 round re-captured the quiet wall
  * baseline TWICE purely for host drift (91.8 → 121.4 s totals on
  * byte-identical plans) — wall against a drifting host had become the
  * weakest gate in the system. Process-CPU·MHz ("cycles") is the
  * drift-resistant comparator: a host capped at a lower clock burns
  * MORE cpu-seconds at LOWER mhz for the same work, and the product
  * cancels the frequency term. The vs-baseline suspect trigger is
  * therefore cycles-PRIMARY (gate b), with the raw-cpu form only as the
  * fallback when either side lacks an mhz sample; the wall trigger
  * (gate c) stays as the SECONDARY net — it is the judge's 2×-per-query
  * rule verbatim, and co-tenant wall inflation without cpu inflation
  * (pure scheduler starvation) is invisible to cycles.
  *
  * The artifact emits both totals-level ratios
  * (`total_wall_ratio`, `total_cpu_cycles_ratio`) so a drifting host
  * reads as "wall ratio up, cycles ratio flat" in-band — the signature
  * that says RE-BASELINE WALL, DON'T SUSPECT THE ENGINE.
  */
object BenchGate {

  /** Per-query quiet-baseline bests (wall, cpu) plus the baseline
    * host's median MHz.
    */
  final case class Baseline(best: Map[String, (Double, Double)], mhz: Double)

  val empty: Baseline = Baseline(Map.empty, 0.0)

  /** Minimal extraction from a committed bench_full.json: per-query
    * `"name":{"runs":[..]..."cpus":[..]}` bests and the median of every
    * per-run mhz sample. Full JSON parsing isn't needed for a flat
    * numeric lookup, and the artifact is self-produced.
    */
  def parseBaseline(txt: String): Baseline = {
    val m = scala.collection.mutable.Map.empty[String, (Double, Double)]
    val rx =
      """"([a-z0-9_]+)":\{"runs":\[([0-9.,\-]+)\][^}]*?"cpus":\[([0-9.,\-]+)\]""".r
    for (mm <- rx.findAllMatchIn(txt)) {
      val ws = mm.group(2).split(",").map(_.toDouble).filter(_ >= 0)
      val cs = mm.group(3).split(",").map(_.toDouble).filter(_ >= 0)
      if (ws.nonEmpty && cs.nonEmpty) m(mm.group(1)) = (ws.min, cs.min)
    }
    val mrx = """"mhz":\[([0-9.,\-]+)\]""".r
    val mhzs = mrx.findAllMatchIn(txt)
      .flatMap(_.group(1).split(",").map(_.toDouble)).filter(_ > 0).toSeq.sorted
    Baseline(m.toMap, if (mhzs.isEmpty) 0.0 else mhzs(mhzs.size / 2))
  }

  /** The per-query suspect verdict over the cleanest samples.
    *
    * @param walls   wall seconds of the query's GOOD runs
    * @param cpus    process-cpu seconds of the same runs
    * @param base    the baseline's (best wall, best cpu) for this query
    * @param runMhz  this query's median per-run MHz sample (0 = unknown)
    * @param baseMhz the baseline host's median MHz (0 = unknown)
    *
    * Triggers, judged over the three CLEANEST (lowest-cpu) reps:
    *   (a) spread: max/min cpu > 3× with an absolute gap > 0.5 s;
    *   (b) vs-baseline CPU, cycles-primary: best-rep cpu·runMhz > 2×
    *       baseline cpu·baseMhz, with the 0.5 s floor evaluated at the
    *       BASELINE clock (cpu·runMhz/baseMhz − baseCpu > 0.5); falls
    *       back to the raw-cpu form when either mhz is unknown;
    *   (c) vs-baseline WALL (secondary): best wall > 2× baseline wall
    *       with the 0.5 s floor — wall drift re-baselines, cycles don't.
    */
  def envSuspect(
      walls: Seq[Double],
      cpus: Seq[Double],
      base: Option[(Double, Double)],
      runMhz: Double,
      baseMhz: Double): Boolean = {
    val cleanest = cpus.sorted.take(3)
    if (cleanest.isEmpty) false
    else {
      val spread = cleanest.last / math.max(cleanest.head, 1e-9) > 3.0 &&
        cleanest.last - cleanest.head > 0.5
      val vsBaseCpu = base.exists { case (_, bc) =>
        val adj =
          if (runMhz > 0 && baseMhz > 0) cleanest.head * runMhz / baseMhz
          else cleanest.head
        adj > 2.0 * math.max(bc, 1e-9) && adj - bc > 0.5
      }
      val vsBaseWall = walls.nonEmpty && base.exists { case (bw, _) =>
        val w = walls.min
        w > 2.0 * math.max(bw, 1e-9) && w - bw > 0.5
      }
      spread || vsBaseCpu || vsBaseWall
    }
  }

  /** Totals-level drift diagnostics over the queries present in BOTH
    * the run and the baseline: (wall ratio, cpu-cycles ratio). A
    * drifting host shows wall ratio ≫ cycles ratio; a genuine engine
    * regression moves both. (0, 0) when nothing matches.
    *
    * @param run (name, best wall, best cpu, median run mhz) per query
    */
  def totalRatios(
      run: Seq[(String, Double, Double, Double)],
      baseline: Baseline): (Double, Double) = {
    val matched = run.filter(r => r._2 >= 0 && baseline.best.contains(r._1))
    if (matched.isEmpty) (0.0, 0.0)
    else {
      val wallNum = matched.map(_._2).sum
      val wallDen = matched.map(r => baseline.best(r._1)._1).sum
      val cycNum = matched.map { r =>
        r._3 * (if (r._4 > 0) r._4 else baseline.mhz)
      }.sum
      val cycDen = matched.map(r => baseline.best(r._1)._2 * baseline.mhz).sum
      (
        if (wallDen > 0) wallNum / wallDen else 0.0,
        if (cycDen > 0 && baseline.mhz > 0) cycNum / cycDen else 0.0)
    }
  }
}
