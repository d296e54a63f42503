package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (0 until 2000)
    .map(i => (i.toLong, s"document body number $i", if (i % 2 == 0) "en" else "es"))
    .toDF("doc_id", "text", "lang")

  test("threshold hex edge cases") {
    assert(Sampling.thresholdHex(0.5) === "8000")
    assert(Sampling.thresholdHex(0.25) === "4000")
    assert(Sampling.thresholdHex(0.0) === "0000")
    assert(Sampling.thresholdHex(1.0) === "g") // sorts above "ffff" → keep all
    // rates rounding to 65536 must clamp to "ffff" — the 5-char "10000"
    // sorts below "1001" and would keep ~6% instead of ~100%
    assert(Sampling.thresholdHex(0.9999999) === "ffff")
    assert(Sampling.deterministicSample(rows, col("text"), 0.9999999).count() >= 1990L)
  }

  test("sample is deterministic and roughly at rate") {
    val a = Sampling.deterministicSample(rows, col("text"), 0.5)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(rows, col("text"), 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
    assert(math.abs(a.size - 1000) < 100) // binomial 3σ ≈ 67
  }

  test("lower rate samples are nested subsets (hash-threshold property)") {
    val half = Sampling.deterministicSample(rows, col("text"), 0.5)
      .select("doc_id").as[Long].collect().toSet
    val quarter = Sampling.deterministicSample(rows, col("text"), 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(quarter.subsetOf(half))
  }

  test("rate 1.0 keeps everything, rate 0.0 keeps nothing") {
    assert(Sampling.deterministicSample(rows, col("text"), 1.0).count() === 2000L)
    assert(Sampling.deterministicSample(rows, col("text"), 0.0).count() === 0L)
  }

  test("stratified sampling applies per-stratum rates and default") {
    val out = Sampling
      .stratifiedSample(rows, col("text"), col("lang"), Map("en" -> 0.25), defaultRate = 1.0)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("es") === 1000L) // default keeps all
    assert(math.abs(byLang("en") - 250L) < 60) // 3σ ≈ 41
  }

  test("capPerGroup keeps exactly cap rows per oversized group, all of an undersized one") {
    val out = Sampling
      .capPerGroup(rows, col("lang"), col("text"), col("doc_id"), cap = 300)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("en" -> 300L, "es" -> 300L))
    val small = Sampling
      .capPerGroup(rows.where(col("doc_id") < 10), col("lang"), col("text"), col("doc_id"), cap = 300)
    assert(small.count() === 10L)
  }

  test("capPerGroup kept set is hash-determined: arrival order and partitioning are irrelevant") {
    val a = Sampling.capPerGroup(rows, col("lang"), col("text"), col("doc_id"), cap = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling
      .capPerGroup(
        rows.orderBy(col("doc_id").desc).repartition(13, col("text")),
        col("lang"), col("text"), col("doc_id"), cap = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b && a.size === 100)
  }

  test("capPerGroup rank predicate plans as WindowGroupLimit (per-partition pre-limit)") {
    val p = Sampling
      .capPerGroup(rows, col("lang"), col("text"), col("doc_id"), cap = 30)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"rank<=cap not pushed as WindowGroupLimit:\n$p")
  }

  /** Reference 40-bit md5-prefix hash (same as SketchSpec's). */
  private def refHash40(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(5).map(b => f"${b & 0xff}%02x").mkString, 16)
  }

  test("weightedSamplePerGroup: exact equality with the brute-force priority ranking") {
    // weights 1..40 cycling; k=12 per lang
    val wrows = (0 until 400)
      .map(i => (i.toLong, if (i % 2 == 0) "en" else "es", (i % 40 + 1).toLong))
      .toDF("doc_id", "lang", "weight")
    val got = Sampling
      .weightedSamplePerGroup(
        wrows, col("lang"), col("doc_id").cast("string"), col("weight"), col("doc_id"), k = 12)
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val want = (0 until 400)
      .map(i => (if (i % 2 == 0) "en" else "es", i.toLong, refHash40(i.toString) / (i % 40 + 1).toLong))
      .groupBy(_._1)
      .flatMap { case (_, g) => g.sortBy(t => (t._3, t._2)).take(12) }
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got.toSeq === want)
  }

  test("weightedSamplePerGroup: heavier rows are sampled more often, deterministically") {
    // two weight classes in one group: weight 100 vs weight 1; with k half
    // the population, the heavy class must dominate the sample
    val wrows = (0 until 1000)
      .map(i => (i.toLong, "g", if (i < 500) 100L else 1L))
      .toDF("doc_id", "lang", "weight")
    def run() = Sampling
      .weightedSamplePerGroup(
        wrows, col("lang"), col("doc_id").cast("string"), col("weight"), col("doc_id"), k = 200)
      .collect().map(_.getLong(0)).toSet
    val s1 = run()
    val heavy = s1.count(_ < 500)
    assert(heavy > 160, s"only $heavy/200 sampled from the 100x-weight class")
    // reproducible: same data, different partitioning → same sample
    val s2 = Sampling
      .weightedSamplePerGroup(
        wrows.repartition(17, col("doc_id")), col("lang"),
        col("doc_id").cast("string"), col("weight"), col("doc_id"), k = 200)
      .collect().map(_.getLong(0)).toSet
    assert(s1 === s2)
  }

  test("weightedSamplePerGroup: non-positive and null weights clamp to 1") {
    val wrows = Seq((1L, "g", Some(0L)), (2L, "g", Some(-5L)), (3L, "g", None), (4L, "g", Some(2L)))
      .toDF("doc_id", "lang", "weight")
    val out = Sampling
      .weightedSamplePerGroup(
        wrows, col("lang"), col("doc_id").cast("string"), col("weight"), col("doc_id"), k = 10)
    assert(out.count() === 4L) // no divide-by-zero, nulls survive as weight 1
    val expected = Map(
      1L -> refHash40("1"), 2L -> refHash40("2"), 3L -> refHash40("3"), 4L -> refHash40("4") / 2)
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === expected)
  }

  test("weightedSamplePerGroup rank predicate plans as WindowGroupLimit") {
    val wrows = (0 until 400)
      .map(i => (i.toLong, if (i % 2 == 0) "en" else "es", (i % 40 + 1).toLong))
      .toDF("doc_id", "lang", "weight")
    val p = Sampling
      .weightedSamplePerGroup(
        wrows, col("lang"), col("doc_id").cast("string"), col("weight"), col("doc_id"), k = 12)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"rank<=k not pushed as WindowGroupLimit:\n$p")
  }

  test("leakageSafeSplit: cluster members share a split, singletons root to themselves, thresholds exact") {
    val docs = Seq(1L, 2L, 3L, 4L, 9L).toDF("doc_id")
    // cluster {1,2,3} via a chain (transitivity must carry 1 and 3 together)
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val out = Sampling
      .leakageSafeSplit(docs, pairs, trainRate = 0.8, valRate = 0.1)
      .orderBy($"doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.map(t => t._1 -> t._2).toSeq === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 9L -> 9L))
    // all cluster members carry the root's split
    assert(out.filter(_._2 == 1L).map(_._3).distinct.length === 1)
    // the split is the md5-bucket rule on the root digits, verified
    // against an independent JVM md5
    def expected(root: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(root.toString.getBytes("UTF-8"))
      val b = f"${(d(0) & 0xff)}%02x${(d(1) & 0xff)}%02x"
      if (b < Sampling.thresholdHex(0.8)) "train"
      else if (b < Sampling.thresholdHex(0.9)) "val"
      else "test"
    }
    out.foreach { case (_, root, split) => assert(split === expected(root)) }
  }

  test("leakageSafeSplit: assignment invariant under pair order and partitioning") {
    val docs = (0L until 200L).toDF("doc_id")
    val pairs = (0L until 60L by 3).flatMap(i => Seq((i, i + 1), (i + 1, i + 2))).toDF("a_id", "b_id")
    def run(p: org.apache.spark.sql.DataFrame) = Sampling
      .leakageSafeSplit(docs, p, trainRate = 0.5, valRate = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    val base = run(pairs)
    assert(base === run(pairs.orderBy($"b_id".desc).repartition(7)))
    // reversed edge direction mines the same undirected graph
    assert(base === run(pairs.select($"b_id".as("a_id"), $"a_id".as("b_id"))))
  }
}
