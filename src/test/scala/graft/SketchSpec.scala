package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The approximate-aggregate family a 100 TB engine leans on when exact
  * answers would shuffle too much, each pinned against its exact twin with
  * the error bound the sketch contracts:
  *
  *   - approx_percentile (KLL-style): rank error ≤ 1/accuracy of the true
  *     rank — fixed-size state vs the exact percentile's full sort;
  *   - CountMinSketch heavy hitters: estimate ≥ true count (never under),
  *     overcount ≤ eps·N with probability ≥ 1−delta;
  *   - the Bloom filter behind x21: zero false negatives by construction,
  *     measured FPR near the configured budget.
  *
  * (HLL distinct-count already pinned in DistinctCountSpec; MinHash/SimHash
  * collision behavior in DedupSpec.)
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_percentile rank error stays within 1/accuracy of exact") {
    // deterministic skewed values: id^2 mod 10007 over 30k rows
    val df = spark.range(30000).select((col("id") * col("id") % 10007L).as("v"))
    val acc = 1000 // rank error budget: n/acc = 30 ranks
    val Seq(exact50, exact95) = df
      .select(percentile($"v", lit(0.5)).as("p50"), percentile($"v", lit(0.95)).as("p95"))
      .collect().headOption.map(r => Seq(r.getDouble(0), r.getDouble(1))).get
    val Seq(apx50, apx95) = df
      .select(
        approx_percentile($"v", lit(0.5), lit(acc)).as("p50"),
        approx_percentile($"v", lit(0.95), lit(acc)).as("p95")
      )
      .collect().headOption.map(r => Seq(r.getLong(0).toDouble, r.getLong(1).toDouble)).get
    // translate the rank-error contract into a rank check: the approx
    // value's true rank must be within n/acc of the target rank
    val n = 30000.0
    def rankOf(v: Double): Double = df.where($"v" <= v).count().toDouble
    assert(math.abs(rankOf(apx50) - 0.5 * n) <= n / acc + 1,
      s"p50 approx=$apx50 exact=$exact50 rank=${rankOf(apx50)}")
    assert(math.abs(rankOf(apx95) - 0.95 * n) <= n / acc + 1,
      s"p95 approx=$apx95 exact=$exact95 rank=${rankOf(apx95)}")
  }

  test("CountMinSketch heavy hitters: never undercounts, overcount within eps*N") {
    // 20k rows, key frequency ∝ zipf-ish: key = floor(sqrt(id)) → low keys heavy
    val df = spark.range(20000).select(sqrt(col("id").cast("double")).cast("long").as("k"))
    val eps = 0.001
    val cms = df.stat.countMinSketch("k", eps = eps, confidence = 0.99, seed = 42)
    val exact = df.groupBy($"k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = 20000L
    // no-undercount is structural (always holds); the eps*N overcount bound
    // is probabilistic PER KEY (prob >= confidence), so assert a violation
    // RATE, not every key — asserting all keys would flake by design
    var overBudget = 0
    exact.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"CMS undercounted key $k: est=$est exact=$c")
      if (est > c + (eps * n).toLong + 1) overBudget += 1
    }
    val allowed = math.max(2, (exact.size * 0.02).toInt)
    assert(overBudget <= allowed, s"$overBudget/${exact.size} keys beyond eps*N (allowed $allowed)")
  }

  test("bloom filter: no false negatives; measured FPR near the configured budget") {
    GraftFunctions.register(spark)
    val members = spark.range(5000).select(concat(lit("gram_"), col("id")).as("g"))
    val bf = members
      .select(GraftFunctions.bloomAgg($"g", 5000L, 5000L * 10).as("bf"))
      .head().getAs[Array[Byte]](0)
    // every member must probe true (no false negatives — the property the
    // x21 decontamination path's exactness rests on)
    val misses = members
      .where(!GraftFunctions.bloomMightContain(lit(bf), $"g"))
      .count()
    assert(misses === 0L)
    // non-members: ~1% fpp at 10 bits/item; allow generous 3x margin
    val fpr = spark.range(5000).select(concat(lit("other_"), col("id")).as("g"))
      .where(GraftFunctions.bloomMightContain(lit(bf), $"g"))
      .count().toDouble / 5000.0
    assert(fpr < 0.03, s"bloom FPR $fpr exceeds 3x the ~1% budget")
  }

  test("Misra-Gries: exact eviction semantics on a single partition") {
    GraftFunctions.register(spark)
    // stream a a a b b c with k=2: a,b fill the counters (a:3, b:2); c
    // finds the map full -> decrement-all (a:2, b:1), c dropped. The
    // candidate set is exactly {a, b}.
    val df = Seq(Seq("a", "a", "a", "b", "b", "c"))
      .toDF("toks")
      .repartition(1)
    val cands = df
      .agg(GraftFunctions.misraGriesTokens($"toks", 2).as("c"))
      .head().getSeq[String](0)
    assert(cands === Seq("a", "b"))
  }

  test("Misra-Gries: candidates cover every phi-heavy token under adversarial spread") {
    GraftFunctions.register(spark)
    // the hard case for per-partition candidate generation: the heavy
    // token is spread EVENLY across partitions (never a local majority)
    // and each partition is padded with its own unique long tail. phi=5%,
    // k = 2/phi = 40. 4 partitions x 250 tokens; "hot" appears 13x per
    // partition = 52/1000 global (5.2% > phi).
    val docs = (0 until 4).map { p =>
      val tail = (0 until 237).map(i => s"tail_${p}_$i")
      (p, (Seq.fill(13)("hot") ++ tail).toSeq)
    }.toDF("p", "toks").repartition(4, $"p")
    val cands = docs
      .agg(GraftFunctions.misraGriesTokens($"toks", 40).as("c"))
      .head().getSeq[String](0).toSet
    assert(cands.contains("hot"), s"phi-heavy token evicted; got ${cands.size} candidates")
  }

  test("heavyTokens: exact equality with the one-phase explode/groupBy twin") {
    // corpus with a token EXACTLY at the threshold boundary (cnt*denom ==
    // total*num must be KEPT - the >= contract), one above, rest below.
    // total = 200 tokens, phi = 1/10 -> threshold 20: "edge" 20x (kept),
    // "big" 60x (kept), 120 unique fillers (dropped).
    val words = Seq.fill(20)("edge") ++ Seq.fill(60)("big") ++ (0 until 120).map(i => s"f$i")
    // 20 docs of 10 tokens each, deterministic round-robin spread
    val docs = words.zipWithIndex
      .groupBy(_._2 % 20).toSeq.sortBy(_._1)
      .map { case (i, ws) => (i.toLong, ws.map(_._1).mkString(" ")) }
      .toDF("doc_id", "text")
    val got = operators.TextAnalysis
      .heavyTokens(docs, phiNum = 1L, phiDenom = 10L, k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter { case (_, c) => c * 10L >= words.size.toLong }
      .map { case (t, c) => (t, c, c * 1000000L / words.size) }
      .sortBy { case (t, c, _) => (-c, t) }
    assert(got.toSeq === exact)
  }

  /** Reference md5-prefix hash, independent of the Spark expression chain:
    * same contract as [[operators.DistinctSketch.hash40]].
    */
  private def refHash40(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(5).map(b => f"${b & 0xff}%02x").mkString, 16)
  }

  test("KMV: k-minima are exactly the brute-force k smallest distinct hashes") {
    GraftFunctions.register(spark)
    val vals = (0 until 500).map(i => s"user_${i % 300}") // 300 distinct
    val df = vals.toDF("v").repartition(7)
    val got = df
      .agg(GraftFunctions.kmvMins(operators.DistinctSketch.hash40($"v"), 32).as("m"))
      .head().getSeq[Long](0)
    val want = vals.distinct.map(refHash40).distinct.sorted.take(32)
    assert(got === want)
  }

  test("KMV operator: exact below k, estimator at k, invariant under partitioning") {
    // group "small" has 10 distinct (< k=16): exact branch, kth NULL;
    // group "big" has 400 distinct: estimator branch
    val rows = (0 until 40).map(i => ("small", "s" + (i % 10))) ++
      (0 until 800).map(i => ("big", s"b${i % 400}"))
    val df = rows.toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) = operators.DistinctSketch
      .kmvDistinct(d, Seq("g"), $"v", k = 16)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val base = run(df)
    val small = base.find(_._1 == "small").get
    assert(small._2 === 10L && small._3 === -1L && small._4 === 10L)
    val big = base.find(_._1 == "big").get
    val kth = rows.collect { case ("big", v) => refHash40(v) }
      .distinct.sorted.apply(15)
    assert(big._2 === 16L && big._3 === kth)
    assert(big._4 === 15L * operators.DistinctSketch.Domain / kth)
    // the sketch is a pure function of the data: partitioning must not show
    assert(run(df.repartition(13)) === base)
    assert(run(df.coalesce(1)) === base)
  }

  test("KMV: estimate lands within the ~1/sqrt(k) relative-error band") {
    val df = spark.range(20000).select(concat(lit("u"), (col("id") % 5000)).as("v"))
    val est = operators.DistinctSketch
      .kmvDistinct(df.select(lit("g").as("g"), $"v"), Seq("g"), $"v", k = 256)
      .head().getLong(3)
    // 1/sqrt(256) ≈ 6.2%; allow 4 sigma
    assert(math.abs(est - 5000L) < 5000 * 0.25, s"est=$est for true 5000")
  }

  test("KMV: null elements are skipped like count(distinct)") {
    val df = Seq(Some("a"), None, Some("b"), None, Some("a")).toDF("v")
    val out = operators.DistinctSketch
      .kmvDistinct(df.select(lit("g").as("g"), $"v"), Seq("g"), $"v", k = 8)
      .head()
    assert(out.getLong(1) === 2L && out.getLong(3) === 2L)
  }

  /** Brute-force CMS reference: matrix + min-of-rows point query, built
    * from [[refHash40]] — independent of both the aggregate's internal
    * loop and the operator's Column-side row hash, so it pins the two
    * equal to each other AND to the spec.
    */
  private def refCms(tokens: Seq[String], depth: Int, width: Int): (Array[Long], Map[String, Long]) = {
    val cells = new Array[Long](depth * width)
    tokens.foreach { t =>
      (0 until depth).foreach { j =>
        cells(j * width + (refHash40(s"$j:$t") % width).toInt) += 1L
      }
    }
    val est = tokens.distinct.map { t =>
      t -> (0 until depth).map(j => cells(j * width + (refHash40(s"$j:$t") % width).toInt)).min
    }.toMap
    (cells, est)
  }

  test("CMS aggregate: counter matrix equals the brute-force reference, any partitioning") {
    GraftFunctions.register(spark)
    val corpus = (0 until 200).map(i => s"tok_${i % 23} tok_${(i * 7) % 23} filler_$i")
    val allTokens = corpus.flatMap(_.split(" "))
    val (wantCells, _) = refCms(allTokens, 3, 16)
    def run(d: org.apache.spark.sql.DataFrame) = d
      .agg(GraftFunctions.countMinTokens(split($"text", " "), 3, 16).as("m"))
      .head().getSeq[Long](0)
    val base = run(corpus.toDF("text"))
    assert(base === wantCells.toSeq)
    // elementwise-add merge => the matrix is partitioning-invariant
    assert(run(corpus.toDF("text").repartition(11)) === wantCells.toSeq)
    assert(run(corpus.toDF("text").coalesce(1)) === wantCells.toSeq)
  }

  test("CMS operator: est >= exact for every token; estimates match brute force") {
    val corpus = (0 until 150).map(i => s"w${i % 19} w${(i * 3) % 19} w${(i * 5) % 19}")
    val allTokens = corpus.flatMap(_.split(" "))
    val exact = allTokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (_, wantEst) = refCms(allTokens, 3, 8) // 19 tokens in 8 cells: collisions certain
    val got = operators.FrequencySketch
      .cmsTokenCounts(corpus.toDF("text"), $"text", depth = 3, width = 8)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === exact.size)
    got.foreach { case (tok, ex, est, over) =>
      assert(ex === exact(tok), s"exact count drift for $tok")
      assert(est === wantEst(tok), s"estimate drift for $tok: got $est want ${wantEst(tok)}")
      assert(est >= ex && over === est - ex, s"one-sided bound violated for $tok")
    }
    // the geometry is tight enough that some token actually overestimates
    // (otherwise the bound assertions above are vacuous)
    assert(got.exists(_._4 > 0L), "no collisions - widen the corpus or shrink width")
  }

  test("CMS aggregate: null token arrays contribute nothing") {
    GraftFunctions.register(spark)
    val df = Seq(Some("a b"), None, Some("a")).toDF("text")
    val got = df
      .agg(GraftFunctions.countMinTokens(split($"text", " "), 2, 4).as("m"))
      .head().getSeq[Long](0)
    val (want, _) = refCms(Seq("a", "b", "a"), 2, 4)
    assert(got === want.toSeq)
  }

  /** Reference HLL register file: bucket = top 6 of the 40 hash bits,
    * rho = LZC of the 34-bit remainder + 1 capped at 31, max per bucket.
    */
  private def refHll(values: Seq[String]): Array[Int] = {
    val regs = new Array[Int](64)
    values.foreach { s =>
      val h = graft.operators.DistinctSketch.hash40Scala(s)
      val j = (h >>> 34).toInt
      val rem = h & ((1L << 34) - 1)
      val raw = if (rem == 0L) 35 else 35 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      val rho = math.min(raw, 31)
      if (rho > regs(j)) regs(j) = rho
    }
    regs
  }

  /** The exact-integer raw estimator the operator contracts. */
  private def refHllEst(regs: Array[Int]): (Int, Long, Long, Long) = {
    val rMax = regs.max
    val s = regs.map(m => 1L << (rMax - m)).sum
    val zeros = regs.count(_ == 0).toLong
    val est = (709265L * 4096L * (1L << rMax)) / (1000000L * s)
    (rMax, s, zeros, est)
  }

  test("HLL registers: brute-force parity, duplicate insensitivity, partitioning invariance") {
    GraftFunctions.register(spark)
    val distinctVals = (0 until 800).map(i => s"tok$i")
    val withDups = distinctVals ++ distinctVals.take(400) ++ distinctVals.take(100)
    val want = refHll(distinctVals).toSeq
    for (p <- Seq(1, 8)) {
      val got = withDups.toDF("v").repartition(p)
        .agg(GraftFunctions.hllRegisters($"v").as("r"))
        .head().getSeq[Int](0)
      assert(got === want, s"parts=$p")
    }
  }

  test("HLL estimate: exact-integer formula parity and raw-regime accuracy") {
    GraftFunctions.register(spark)
    val n = 5000
    val df = (0 until n).map(i => ("g", s"value-$i")).toDF("grp", "v")
    val row = graft.operators.DistinctSketch
      .hllDistinct(df, Seq("grp"), $"v").head()
    val (rMax, s, zeros, est) = refHllEst(refHll((0 until n).map(i => s"value-$i")))
    assert(row.getInt(1) === rMax)
    assert(row.getLong(2) === s)
    assert(row.getLong(3) === zeros)
    assert(row.getLong(4) === est)
    // m=64 → σ ≈ 13%; allow 3σ
    assert(math.abs(est - n.toDouble) / n < 0.4, s"est=$est vs $n")
  }

  test("HLL: per-group independence and null skip") {
    GraftFunctions.register(spark)
    val df = Seq(
      ("a", Some("x")), ("a", Some("y")), ("a", None),
      ("b", Some("x"))
    ).toDF("grp", "v")
    val got = graft.operators.DistinctSketch
      .hllDistinct(df, Seq("grp"), $"v")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val (_, sA, _, _) = refHllEst(refHll(Seq("x", "y")))
    val (_, sB, _, _) = refHllEst(refHll(Seq("x")))
    assert(got === Map("a" -> sA, "b" -> sB))
  }
}
