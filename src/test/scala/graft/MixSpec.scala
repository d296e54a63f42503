package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Mix

/** Pins the two-phase grouped running sum (Mix.withSourceCumSum) against
  * the single-partition window it replaces, the greedy budget-fill rule,
  * and the no-single-partition-exchange plan property — the same contract
  * GlobalRankSpec pins for row_number, generalized to weighted sums.
  */
class MixSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val langs = Seq("en", "es", "de", "fr")
    (1 to n).map { i =>
      (i.toLong, langs(rnd.nextInt(langs.length)), 1L + rnd.nextInt(50),
        f"${rnd.nextInt(1000000)}%07d")
    }.toDF("doc_id", "lang", "w", "h")
  }

  test("two-phase cumsum equals the single-partition window across partition counts") {
    val df = corpus(500, 42)
    val expected = df
      .withColumn("cum", sum(col("w")).over(
        Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("cum"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for (p <- Seq(1, 3, 7, 32)) {
      val got = Mix
        .withSourceCumSum(df, col("lang"), Seq(col("h"), col("doc_id")), col("w"),
          outCol = "cum", numPartitions = p)
        .select(col("doc_id"), col("cum"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === expected, s"numPartitions=$p")
    }
  }

  test("budget fill keeps the inclusive hash-order prefix, never overshoots") {
    // source A in explicit order o: weights 3, 4, 5 → cums 3, 7, 12
    val df = Seq(
      ("A", 1L, 3L), ("A", 2L, 4L), ("A", 3L, 5L),
      ("B", 4L, 10L), ("B", 5L, 1L)
    ).toDF("src", "o", "w")
    def kept(budgets: Map[String, Long], dflt: Long): Set[Long] =
      Mix.tokenBudgetFill(df, col("src"), Seq(col("o")), col("w"), budgets, dflt,
          cumCol = "cum")
        .select(col("o")).collect().map(_.getLong(0)).toSet
    assert(kept(Map("A" -> 8L), dflt = 100L) === Set(1L, 2L, 4L, 5L)) // A cut after 7
    assert(kept(Map("A" -> 7L), dflt = 100L) === Set(1L, 2L, 4L, 5L)) // inclusive ≤
    assert(kept(Map("A" -> 6L), dflt = 100L) === Set(1L, 4L, 5L)) // 7 > 6 → only first
    assert(kept(Map("A" -> 2L), dflt = 10L) === Set(4L)) // nothing fits A; B cut at 10
    assert(kept(Map.empty, dflt = 0L) === Set.empty)
  }

  test("sources fill independently: one source's budget never affects another") {
    val df = corpus(300, 7)
    val all = Mix.tokenBudgetFill(df, col("lang"), Seq(col("h"), col("doc_id")),
      col("w"), Map("en" -> 200L), defaultBudget = 150L, cumCol = "cum")
    val tightened = Mix.tokenBudgetFill(df, col("lang"), Seq(col("h"), col("doc_id")),
      col("w"), Map("en" -> 50L), defaultBudget = 150L, cumCol = "cum")
    val allByLang = all.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tightByLang = tightened.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tightByLang.getOrElse("en", 0L) < allByLang("en"))
    for (l <- Seq("es", "de", "fr"))
      assert(tightByLang.getOrElse(l, 0L) === allByLang.getOrElse(l, 0L), l)
    // and each kept set is the hash-order prefix: max kept cum ≤ budget
    val maxCum = tightened.where(col("lang") === "en").agg(max("cum")).collect()(0).getLong(0)
    assert(maxCum <= 50L)
  }

  test("no Exchange SinglePartition in the two-phase plan") {
    val plan = Mix
      .withSourceCumSum(corpus(100, 3), col("lang"), Seq(col("h"), col("doc_id")), col("w"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), s"single-partition exchange:\n$plan")
  }

  test("tokenShards equals the single-window closed form and stays in bounds") {
    val df = corpus(400, 7)
    val s = 8
    val got = Mix
      .tokenShards(df, Seq(col("h"), col("doc_id")), col("w"), numShards = s)
      .select(col("doc_id"), col("cum_tok"), col("shard"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getInt(2))))
      .toMap
    val total = df.agg(sum(col("w"))).collect()(0).getLong(0)
    val expected = df
      .withColumn("cum", sum(col("w")).over(
        Window.orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect()
      .map { r =>
        val cum = r.getAs[Long]("cum")
        val shard = math.min(s - 1, ((cum - r.getAs[Long]("w")) * s / total).toInt)
        (r.getAs[Long]("doc_id"), (cum, shard))
      }
      .toMap
    assert(got === expected)
    assert(got.values.map(_._2).toSet.subsetOf((0 until s).toSet))
  }

  test("tokenShards: shard token masses are balanced within one max-document weight") {
    val df = corpus(600, 11)
    val s = 4
    val byShard = Mix
      .tokenShards(df, Seq(col("h"), col("doc_id")), col("w"), numShards = s)
      .groupBy(col("shard"))
      .agg(sum(col("w")).as("mass"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    assert(byShard.keySet === (0 until s).toSet, "every shard non-empty")
    val total = byShard.values.sum
    val ideal = total.toDouble / s
    val maxW = df.agg(max(col("w"))).collect()(0).getLong(0)
    byShard.values.foreach { m =>
      assert(math.abs(m - ideal) <= maxW, s"shard mass $m vs ideal $ideal (maxW $maxW)")
    }
  }

  private def hrw(n: Int, keys: Seq[Long]) = operators.Mix
    .rendezvousShard(keys.toDF("k"), col("k"), n)
    .collect()
    .map(r => r.getLong(0) -> r.getInt(1))
    .toMap

  test("rendezvous: deterministic, every shard populated, roughly uniform") {
    val keys = (0L until 2000L).toSeq
    val a = hrw(8, keys)
    assert(a === hrw(8, keys)) // pure function of the key
    val sizes = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.keySet === (0 until 8).toSet)
    // binomial(2000, 1/8): mean 250, sd ~15; 5 sigma ≈ 75
    sizes.values.foreach(s => assert(math.abs(s - 250) < 75, s"shard size $s"))
  }

  test("rendezvous: growing n -> n+1 moves ONLY keys won by the new shard") {
    val keys = (0L until 2000L).toSeq
    val before = hrw(8, keys)
    val after = hrw(9, keys)
    val moved = keys.filter(k => before(k) != after(k))
    // every moved key moved TO the new shard — nothing reshuffles among
    // the old shards (THE rendezvous property; mod-hashing moves ~8/9)
    moved.foreach(k => assert(after(k) === 8, s"key $k moved to old shard ${after(k)}"))
    // expected 1/9 ≈ 222 of 2000; allow a wide deterministic band
    assert(moved.size > 120 && moved.size < 350, s"moved ${moved.size}")
  }

  test("rendezvous: single shard degenerates to constant 0") {
    assert(hrw(1, (0L until 20L).toSeq).values.toSet === Set(0))
  }

  test("temperatureQuotas: exact isqrt incl. boundary cases, ppm arithmetic, keep-rate cap") {
    // per-doc token counts summing to 15 / 16 / 17 / 10000 per source:
    // isqrt boundaries (15→3, 16→4, 17→4) and one dominant source
    val docs = Seq(
      ("a", 7L), ("a", 8L),
      ("b", 16L),
      ("c", 9L), ("c", 8L),
      ("d", 10000L)
    ).toDF("source", "nt")
    val out = Mix
      .temperatureQuotas(docs, col("source"), col("nt"))
      .orderBy($"source")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val totTok = 15L + 16L + 17L + 10000L
    val totW = 3L + 4L + 4L + 100L
    def row(s: String, n: Long, w: Long) = {
      val share = n * 1000000L / totTok
      val quota = w * 1000000L / totW
      (s, n, w, share, quota, math.min(quota * 1000000L / share, 1000000L))
    }
    assert(out.toSeq === Seq(
      row("a", 15L, 3L), row("b", 16L, 4L), row("c", 17L, 4L), row("d", 10000L, 100L)))
    // the dominant source is the one cut; small sources keep everything
    val byS = out.map(t => t._1 -> t._6).toMap
    assert(byS("d") < 1000000L)
    assert(byS("a") === 1000000L && byS("b") === 1000000L && byS("c") === 1000000L)
  }

  test("temperatureQuotas: empty corpus yields an empty plan, not ÷0") {
    val empty = Seq.empty[(String, Long)].toDF("source", "nt")
    assert(Mix.temperatureQuotas(empty, col("source"), col("nt")).count() === 0L)
  }
}
