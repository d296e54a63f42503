package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Robustness against host noise: this host shows multi-minute CPU-steal
  * bursts (measured up to 85% steal) that land on whichever stage happens to
  * be running, and a single burst can outlast two consecutive runs of one
  * query. Each query is therefore timed THREE times and the MINIMUM wall
  * time is reported — min-of-N is the standard robust throughput estimator:
  * it suppresses one-off stalls while never flattering a genuinely slow
  * query. Before its timed runs each query gets ONE untimed warm-up
  * execution (disable with SPARK_GRAFT_WARMUP=0): the round-6 driver run
  * showed 2–12× process-CPU inflation concentrated in string-expression-hot
  * queries — the signature of JIT-compile starvation under host contention
  * — and the warm-up lets classloading + C2 compilation of a query's
  * generated code happen OUTSIDE the timed window.
  *
  * The artifact is SELF-DIAGNOSING: per query it records, for each run,
  *   - `runs`:  wall-clock seconds (all runs, so a steal burst is visible
  *     as an outlier instead of silently inflating the headline);
  *   - `cpus`:  JVM process-CPU seconds per run (`cpu` keeps the min-run
  *     value for continuity) — wall ≫ cpu is scheduler steal /
  *     involuntary wait, not engine work;
  *   - `jit`:   JIT compilation-time delta per run
  *     (CompilationMXBean.getTotalCompilationTime) — cpu inflated AND jit
  *     high means the run paid compile cost, i.e. compile-starved or
  *     cold; cpu inflated with jit ≈ 0 means the code ran interpreted or
  *     genuinely slower;
  *   - `gc`:    GC-time delta per run (sum over GarbageCollectorMXBeans)
  *     — attributes memory-pressure stalls;
  *   - `host`/`steal`: whole-host busy and steal CPU seconds per run from
  *     `/proc/stat` deltas — the layer the JVM beans can't see. wall ≫
  *     cpu with steal high = the hypervisor robbed the guest; steal ≈ 0
  *     with host ≫ cpu = another process on the host ate the cores;
  *   - `mhz`/`thr`: median CPU frequency (`/proc/cpuinfo`) at run end and
  *     cgroup CPU-throttle seconds accrued during the run — the
  *     frequency-starvation regime (CPU capping / power save) that
  *     inflates process-CPU at idle host load and near-zero steal, which
  *     none of the fields above can see (round-8's x17: 20× CPU
  *     inflation, host ~10% busy, steal ≈ 0.1 s);
  *   - `warm_ok`: whether the untimed warm-up pass succeeded — when it
  *     fails, the timed runs are SKIPPED (one failing execution per
  *     broken query, not four) and the query reports -1.
  * So an inflated official run is attributable to steal/JIT/GC/frequency
  * from the artifact alone, with no access to the host.
  *
  * And the artifact is SELF-GATING: a query whose three cleanest reps
  * still disagree >3× in process-CPU (or whose best rep burns >2× the
  * committed quiet-host baseline's CPU, or whose best WALL exceeds 2×
  * the baseline's best wall — the r11 blind spot where co-tenant load
  * inflated wall and cpu together) after self-heal retries is
  * marked `env_suspect`; a suspect HEADLINE query marks the whole
  * artifact `"contaminated": true` and exits non-zero — a poisoned run
  * can no longer be committed as the number of record (round-8 verdict
  * item #1: BENCH_r08.json shipped 176.7 s while its own per-run fields
  * showed x44 at cpu [27, 446, 2227] s across three reps of identical
  * code; the quiet-host rerun was 87.9 s).
  *
  * Failures are logged to stderr and reported as -1 so a broken query is
  * visible instead of masquerading as a fast one.
  *
  * Two fidelity rules learned from earlier rounds:
  *   - queries are materialized with a `noop`-format WRITE, not `count()`:
  *     under count() Catalyst prunes every projection that doesn't feed the
  *     count, so a map-only query (PII scrub, text stats, entropy) times
  *     the parquet SCAN while the operator being benchmarked is optimized
  *     away. The noop sink evaluates every output column and discards the
  *     rows — the honest operator cost, with zero disk interference;
  *   - the full JSON line is ALSO written to `bench_full.json` in the
  *     working directory, because the driver's stdout capture has twice
  *     truncated the per-query detail out of the round artifact.
  */
object Bench {

  private val osBean =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
  private val compBean = java.lang.management.ManagementFactory.getCompilationMXBean
  private def jitMs: Long =
    if (compBean != null && compBean.isCompilationTimeMonitoringSupported)
      compBean.getTotalCompilationTime
    else 0L
  private def gcMs: Long = {
    val it = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.iterator()
    var s = 0L
    while (it.hasNext) { val t = it.next().getCollectionTime; if (t > 0) s += t }
    s
  }

  /** Kernel tick rate for `/proc/stat` conversion — `getconf CLK_TCK`
    * once at startup (USER_HZ is a kernel build constant, virtually
    * always 100, but reading it costs one exec and removes the
    * assumption); 100 if getconf is unavailable.
    */
  private val tickHz: Double =
    try {
      val p = new ProcessBuilder("getconf", "CLK_TCK").start()
      val out = new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      p.waitFor()
      val v = out.toDouble
      if (v > 0) v else 100.0
    } catch { case _: Throwable => 100.0 }

  /** Whole-host CPU seconds from `/proc/stat`'s aggregate "cpu" line —
    * (busy, steal, iowait) at `tickHz`. The JVM beans above can't see
    * scheduler steal (the hypervisor takes it from OUTSIDE the guest), so
    * this is the attribution layer beneath cpu/jit/gc: a run whose wall ≫
    * cpu with a large steal delta was robbed by the host, one with a small
    * steal delta was genuinely waiting. (0,0,0) if procfs is unavailable.
    */
  private def hostTicks: (Double, Double, Double) =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val p = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        // fields: user nice system idle iowait irq softirq steal ...
        val busy = p(0) + p(1) + p(2) +
          p.lift(5).getOrElse(0L) + p.lift(6).getOrElse(0L)
        (busy / tickHz, p.lift(7).getOrElse(0L) / tickHz, p.lift(4).getOrElse(0L) / tickHz)
      } finally src.close()
    } catch { case _: Throwable => (0.0, 0.0, 0.0) }

  /** Median CPU frequency in MHz from `/proc/cpuinfo` — the attribution
    * layer NONE of the other fields can see: cgroup CPU capping /
    * power-state throttling slows every instruction, which inflates
    * process-CPU-seconds while host-busy and steal both stay low (the
    * round-8 x17 signature: 20× CPU inflation on an apparently idle
    * host). A run whose `mhz` sample sits far below the machine's
    * nominal clock was frequency-starved, not engine-slow. 0 if
    * unavailable.
    */
  private def cpuMhz: Double =
    try {
      val src = scala.io.Source.fromFile("/proc/cpuinfo")
      try {
        val vs = src.getLines().collect {
          case l if l.startsWith("cpu MHz") => l.split(":")(1).trim.toDouble
        }.toArray.sorted
        if (vs.isEmpty) 0.0 else vs(vs.length / 2)
      } finally src.close()
    } catch { case _: Throwable => 0.0 }

  /** Cumulative cgroup CPU-throttle seconds (quota enforcement — the
    * OTHER way a container runs slow at idle host load): cgroup v1
    * `cpu/cpu.stat throttled_time` (ns) or v2 `cpu.stat throttled_usec`.
    * 0 if neither exists.
    */
  private def throttledSec: Double = {
    def read(path: String, key: String, scale: Double): Option[Double] =
      try {
        val src = scala.io.Source.fromFile(path)
        try src.getLines().collectFirst {
          case l if l.startsWith(key) => l.split("\\s+")(1).toDouble / scale
        } finally src.close()
      } catch { case _: Throwable => None }
    read("/sys/fs/cgroup/cpu/cpu.stat", "throttled_time", 1e9)
      .orElse(read("/sys/fs/cgroup/cpu.stat", "throttled_usec", 1e6))
      .getOrElse(0.0)
  }

  /** One run's evidence: wall s, process-cpu s, jit-compile s, gc s,
    * whole-host busy s and steal s over the run's wall window, median
    * CPU MHz at run end, and cgroup throttle-seconds accrued during the
    * run. */
  private case class Run(
      wall: Double, cpu: Double, jit: Double, gc: Double,
      hostBusy: Double, steal: Double, mhz: Double, thr: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // testdata files are single small parquets; the default 128m split
      // gives 1-3 scan tasks and serializes scan-stage compute — split
      // finer so scan stages use the full core count
      .config("spark.sql.files.maxPartitionBytes", "8m")
      // see GraftSession: the default 100-entry codegen cache is evicted
      // by a single CC mega-plan, re-JITing ~86 classes per rep (~3.4 s)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    val failed = Run(-1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    def timed(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Run = {
      val g0 = gcMs; val j0 = jitMs; val th0 = throttledSec
      val (hb0, st0, _) = hostTicks
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = (osBean.getProcessCpuTime - c0) / 1e9
        val (hb1, st1, _) = hostTicks
        Run(wall, cpu, (jitMs - j0) / 1e3, (gcMs - g0) / 1e3, hb1 - hb0, st1 - st0,
          cpuMhz, throttledSec - th0)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed
      }
    }

    // ---- environment-poisoning gate (round-8 verdict #1) -------------
    // The committed r8 artifact carried per-run CPU spreads of 80× on
    // identical code (x44: cpu [27, 446, 2227] s within ONE artifact) and
    // was committed as the number of record anyway. The bench now refuses
    // to certify such a run: per query, the THREE CLEANEST reps (lowest
    // process-CPU — extra reps are added while suspicion persists, so a
    // transient burst heals itself) must agree. A query is `env_suspect`
    // when, over those cleanest reps,
    //   (a) max/min process-CPU > 3× with an absolute gap > 0.5 s (the
    //       floor keeps 0.05-vs-0.2 s timer noise on tiny queries from
    //       tripping the ratio), or
    //   (b) best-rep CPU·MHZ (cycles — drift-proof; falls back to raw
    //       cpu when either side lacks an mhz sample) > 2× (and > 0.5 s
    //       at the baseline clock above) the committed baseline's best
    //       cpu·mhz for the same query
    //       (bench_baseline.json — the quiet-host artifact;
    //       override with SPARK_GRAFT_BENCH_BASELINE, absent = skip (b)), or
    //   (c) best-rep WALL > 2× (and > 0.5 s above) the committed
    //       baseline's best wall for the same query (round-11 verdict #1:
    //       a co-tenant burst that inflates wall AND cpu together — plus
    //       the JIT cost of running interpreted — slips under (a)'s
    //       spread and (b)'s cpu ratio; BENCH_r11 shipped x29 at 3.26×
    //       and x31 at 2.96× their baseline walls with env_suspect:false.
    //       The judge's 2×-per-query rule is a WALL rule, so the gate
    //       must trigger on wall too).
    // If any HEADLINE query stays suspect after retries the artifact is
    // marked "contaminated": true and the process exits non-zero, so a
    // poisoned run cannot silently become the number of record.
    // baseline: name -> (best wall, best cpu), plus the baseline host's
    // median MHz. Parsing and the trigger logic live in [[BenchGate]]
    // (spec-testable against synthetic detail JSONs — r13 verdict #3);
    // the vs-baseline CPU trigger is CYCLES-primary there: cpu·mhz
    // cancels frequency drift, so only the WALL gate ever needs a
    // re-baseline when the host slows (the r13 drift lesson).
    val baseline: BenchGate.Baseline = {
      val path = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", "bench_baseline.json")
      try {
        val txt = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
          java.nio.charset.StandardCharsets.UTF_8)
        val b = BenchGate.parseBaseline(txt)
        // a READABLE baseline that matches zero entries (writer field-order
        // drift vs the regex) disables gates (b)/(c) just as silently as a
        // missing file — flag it the same way
        if (b.best.isEmpty)
          System.err.println(
            s"[bench] WARNING: baseline at $path parsed to ZERO per-query " +
              "entries (regex/field-order mismatch?); cpu/wall vs-baseline " +
              "suspect gates are OFF for this run")
        b
      } catch {
        // a missing/unreadable baseline silently disables gates (b) and
        // (c) — say so on stderr, or the r11 blind spot resurfaces the
        // moment the baseline file is renamed
        case e: Throwable =>
          System.err.println(
            s"[bench] WARNING: baseline unreadable ($path: ${e.getMessage}); " +
              "cpu/wall vs-baseline suspect gates are OFF for this run")
          BenchGate.empty
      }
    }
    val baselineBest = baseline.best
    val baselineMhz = baseline.mhz
    def medianMhz(samples: Seq[Run]): Double = {
      val vs = samples.map(_.mhz).filter(_ > 0).sorted
      if (vs.isEmpty) 0.0 else vs(vs.size / 2)
    }
    def envSuspect(samples: Seq[Run], base: Option[(Double, Double)]): Boolean = {
      val good = samples.filter(_.wall >= 0)
      if (good.isEmpty) false
      else BenchGate.envSuspect(
        good.map(_.wall), good.map(_.cpu), base, medianMhz(good), baselineMhz)
    }
    val maxExtraReps = 3
    // ---- deferred quiet-host requeue (round-10 verdict #2) -----------
    // Inline extra reps can't outlast a co-tenant burst that runs longer
    // than the query's whole rep budget (r10's committed x77 row: 5.68 s
    // vs 0.68 s quiet, host 32/32 CPUs busy through every rep). So after
    // the sweep, still-suspect queries are REQUEUED: wait until the host
    // is actually quiet (1-s /proc/stat busy windows below ~35% of cores,
    // bounded wait), then append fresh reps. envSuspect judges the three
    // CLEANEST reps of the merged sample set, so one quiet round heals a
    // poisoned query, and the committed snapshot becomes load-independent
    // instead of carrying whichever number the burst left behind.
    def waitForQuietHost(maxWaitSec: Double): Boolean = {
      val nCpus = Runtime.getRuntime.availableProcessors()
      val deadline = System.nanoTime() + (maxWaitSec * 1e9).toLong
      while (System.nanoTime() < deadline) {
        val (b0, _, _) = hostTicks
        Thread.sleep(1000)
        val (b1, _, _) = hostTicks
        if (b1 - b0 < nCpus * 0.35) return true
        Thread.sleep(2000)
      }
      false
    }
    // per query: (all samples, warmup ok, INITIAL reps all ok). The
    // initial-rep verdict is what the headline reports on: a query that
    // fails any of its first 3 timed runs is broken-of-record (wall -1),
    // while a transient failure among EXTRA/requeued reps — runs that
    // exist only to heal co-tenant noise — must not fake a -1 for a
    // query with valid initial measurements. Both self-heal tiers gate
    // on the same initial verdict (healing a failed query is pointless).
    val firstPass =
      scala.collection.mutable.LinkedHashMap.empty[String, (Seq[Run], Boolean, Boolean)]
    qs.foreach { case (name, fn) =>
      // a failing warm-up skips the timed runs: a broken query pays ONE
      // failing execution, not four, and warm_ok in the detail attributes
      // the failure to the warm-up pass instead of an unexplained stderr line
      val warmOk = !warmup || timed(name, fn).wall >= 0
      var samples: Seq[Run] = if (warmOk) (1 to 3).map(_ => timed(name, fn)) else Seq(failed)
      val initialOk = samples.forall(_.wall >= 0)
      var extra = 0
      while (initialOk && envSuspect(samples, baselineBest.get(name)) && extra < maxExtraReps) {
        samples = samples :+ timed(name, fn); extra += 1
      }
      firstPass(name) = (samples, warmOk, initialOk)
    }
    val fnByName = qs.toMap
    val maxRequeueRounds = 2
    var round = 0
    var requeued = Set.empty[String]
    while (round < maxRequeueRounds && {
        val stillSuspect = firstPass.collect {
          case (name, (samples, _, initialOk)) if initialOk &&
            envSuspect(samples, baselineBest.get(name)) => name
        }.toSeq
        if (stillSuspect.nonEmpty) {
          System.err.println(
            s"[bench] requeue round ${round + 1}: ${stillSuspect.mkString(", ")}")
          stillSuspect.foreach { name =>
            waitForQuietHost(90.0)
            val (samples, warmOk, initialOk) = firstPass(name)
            firstPass(name) =
              (samples ++ (1 to 3).map(_ => timed(name, fnByName(name))), warmOk, initialOk)
            requeued += name
          }
        }
        stillSuspect.nonEmpty
      }) round += 1
    val results = firstPass.toSeq.map { case (name, (samples, warmOk, initialOk)) =>
      val good = samples.filter(_.wall >= 0)
      val suspect = initialOk && envSuspect(samples, baselineBest.get(name))
      val best = if (initialOk && good.nonEmpty) good.minBy(_.wall) else failed
      (name, best, samples, warmOk, suspect)
    }
    def f(d: Double): String = BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def arr(xs: Seq[Double]): String = xs.map(f).mkString("[", ",", "]")
    val queriesJson = results
      .map { case (k, best, _, _, _) => "\"" + k + "\":" + f(best.wall) }
      .mkString("{", ",", "}")
    val detailJson = results
      .map { case (k, best, runs, warmOk, suspect) =>
        "\"" + k + "\":{\"runs\":" + arr(runs.map(_.wall)) +
          ",\"cpu\":" + f(best.cpu) +
          ",\"cpus\":" + arr(runs.map(_.cpu)) +
          ",\"jit\":" + arr(runs.map(_.jit)) +
          ",\"gc\":" + arr(runs.map(_.gc)) +
          ",\"host\":" + arr(runs.map(_.hostBusy)) +
          ",\"steal\":" + arr(runs.map(_.steal)) +
          ",\"mhz\":" + arr(runs.map(_.mhz)) +
          ",\"thr\":" + arr(runs.map(_.thr)) +
          ",\"env_suspect\":" + suspect +
          ",\"requeued\":" + requeued(k) +
          ",\"warm_ok\":" + warmOk + "}"
      }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, best, _, _, _) if best.wall >= 0 => best.wall }.sum
    // The driver's stdout capture keeps only the last ~2 KB; the full
    // per-query line is ~10 KB, so it was truncated mid-line and never
    // parsed (BENCH_r01..r04 all carry "parsed": null). Print a COMPACT
    // headline line — total over ALL queries, per-query times for a
    // representative subset — small enough to survive the capture window,
    // as the very last stdout. Full numbers live in bench_full.json.
    val headline = Set(
      "q01_pricing_summary", "q09_revenue_by_nation", "q13_options_pipeline",
      "q14_weekly_pipeline", "q18_asof_join", "q20_rolling_window",
      "q27_ntile", "q31_tumbling", "x01_dedup_exact", "x06_ngram_jaccard",
      "x07_minhash_lsh", "x09_cosine_topk", "x10_ann_lsh",
      "x14_neardup_clusters", "x17_sessionize", "x22_tfidf",
      "x31_substring_dedup", "x42_token_shards", "x46_pagerank")
    val headQueries = results
      .collect { case (k, best, _, _, _) if headline(k) => "\"" + k + "\":" + f(best.wall) }
      .mkString("{", ",", "}")
    val nOk = results.count(_._2.wall >= 0)
    val suspects = results.collect { case (k, _, _, _, true) => k }
    // The artifact is CONTAMINATED when a headline query is still
    // env-suspect after self-heal retries: the total cannot be trusted as
    // the number of record, the artifact says so in-band, and the process
    // exits non-zero so automation can't commit it silently.
    val contaminated = suspects.exists(headline)
    val suspectsJson = suspects.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Frequency-normalized ADVISORY total (round-9 verdict #7): a host
    // capped at a steady lower clock (r9's driver ran every sample at
    // 2100 MHz vs the 2600 quiet baseline) inflates CPU-bound wall by
    // ~baseline/run; total_mhz_adj = total · runMhz/baselineMhz gives the
    // comparable number WITHOUT weakening the gate — contamination still
    // marks and still exits non-zero; the adjusted line just lets a
    // capped-but-steady host be read against the quiet baseline.
    val runMhzSamples = results
      .flatMap(_._3.map(_.mhz)).filter(_ > 0).sorted
    val runMhz = if (runMhzSamples.isEmpty) 0.0 else runMhzSamples(runMhzSamples.size / 2)
    val mhzRatio = if (baselineMhz > 0 && runMhz > 0) runMhz / baselineMhz else 1.0
    val totalAdj = total * mhzRatio
    // BOTH drift diagnostics in-band (r13 verdict #3): over the queries
    // present in run AND baseline, the total-wall ratio and the total
    // cpu-CYCLES ratio. Drift signature: wall ratio up, cycles flat →
    // re-baseline wall; engine regression: both up → investigate.
    val (wallRatio, cyclesRatio) = BenchGate.totalRatios(
      results.map { case (name, best, samples, _, _) =>
        (name, best.wall, best.cpu, medianMhz(samples.filter(_.wall >= 0)))
      },
      baseline)
    val mhzJson =
      s""""run_mhz":${f(runMhz)},"baseline_mhz":${f(baselineMhz)},"mhz_ratio":${f(mhzRatio)},"total_mhz_adj":${f(totalAdj)},"total_wall_ratio":${f(wallRatio)},"total_cpu_cycles_ratio":${f(cyclesRatio)}"""
    val fullLine =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$queriesJson,"detail":$detailJson,"warmup":$warmup,"tick_hz":${f(tickHz)},"env_suspect":$suspectsJson,"contaminated":$contaminated,$mhzJson,"sf":"$sfDir"}"""
    // durable full artifact: all queries + per-run samples + cpu/jit/gc
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_full.json"),
      (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // stop() BEFORE the metric print: nothing (even a stray executor log, if
    // a driver merges streams) may follow the line the driver parses. Paired
    // with build.sbt's StdoutOutput + showSuccess:=false, this line is the
    // literal final stdout line of the sbt invocation.
    spark.stop()
    println(
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$headQueries,"n_queries":${results.size},"n_ok":$nOk,"n_env_suspect":${suspects.size},"contaminated":$contaminated,$mhzJson,"full":"bench_full.json","sf":"$sfDir"}""")
    System.out.flush()
    if (contaminated) sys.exit(3)
  }
}
