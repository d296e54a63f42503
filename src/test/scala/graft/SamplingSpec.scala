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
}
