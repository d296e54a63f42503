package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Round-2's two red rows (q28_stats_agg, x17_sessionize) were
  * order-of-accumulation flakes: `round(sum(double))` / rounded Welford
  * moments land within an ulp of a rounding midpoint, and Spark's vs the
  * oracle's merge order decides the last digit. The round-3 contracts are
  * exact (decimal power sums / decimal value sums), which makes them
  * order-INDEPENDENT — a property this suite pins directly by re-running
  * each query under shuffle-partition counts that force different partial
  * merge shapes and requiring bit-identical output, not just
  * approximately-equal output.
  *
  * Also pins that q28's closed-form moments ARE the classic statistics:
  * each agrees with Spark's own stddev_samp / corr / covar_samp to 1e-9,
  * so the exact-sum formulation changed the contract's determinism, never
  * the statistic.
  */
class StatsDeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Collect a query's full result as a canonical sorted string rendering
    * (doubles via toString → shortest decimal; bit-different doubles render
    * differently).
    */
  private def fingerprint(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect().map(_.toString).sorted.toSeq
  }

  private def sweep(name: String): Unit = {
    val base = fingerprint(name)
    assert(base.nonEmpty, s"$name returned no rows")
    // restore whatever the shared session was configured with, not a
    // hard-coded literal — a drifted restore would leak into every suite
    // sharing this session
    val restore = spark.conf.get("spark.sql.shuffle.partitions")
    for (parts <- Seq("1", "7", "32")) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val again = fingerprint(name)
        assert(
          again == base,
          s"$name is not bit-deterministic across shuffle partitioning " +
            s"(diverged at shuffle.partitions=$parts)"
        )
      } finally spark.conf.set("spark.sql.shuffle.partitions", restore)
    }
  }

  test("q28 stats are bit-identical across merge orders") { sweep("q28_stats_agg") }

  test("x17 session sums are bit-identical across merge orders") { sweep("x17_sessionize") }

  test("q01 discounted revenue is bit-identical across merge orders") {
    sweep("q01_pricing_summary")
  }

  test("q09 nation revenue is bit-identical across merge orders") {
    sweep("q09_revenue_by_nation")
  }

  test("q28 closed-form moments equal the built-in statistics to 4-dp rounding") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val builtin = li
      .groupBy(col("l_returnflag"))
      .agg(
        stddev_samp(col("l_extendedprice")).as("sd_price"),
        corr(col("l_extendedprice"), col("l_quantity")).as("corr_pq"),
        covar_samp(col("l_discount"), col("l_tax")).as("cov_dt")
      )
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val closed = SparkEntry
      .queries("q28_stats_agg")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(closed.keySet == builtin.keySet)
    // the query's output is floor-form rounded at 4 dp, so the closed form
    // and the built-in may differ by up to half a grid step plus float noise
    val tol = 6e-5
    for ((k, (sd, co, cv)) <- closed) {
      val (bsd, bco, bcv) = builtin(k)
      assert(math.abs(sd - bsd) < tol, s"$k sd: $sd vs $bsd")
      assert(math.abs(co - bco) < tol, s"$k corr: $co vs $bco")
      assert(math.abs(cv - bcv) < tol, s"$k covar: $cv vs $bcv")
    }
  }
}
