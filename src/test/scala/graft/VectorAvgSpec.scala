package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

class VectorAvgSpec extends SparkSpec {
  import spark.implicits._

  test("elementwise mean matches the posexplode/groupBy formulation across partitions") {
    GraftFunctions.register(spark)
    // 1000 vectors over 3 groups, 8 dims, spread over 8 partitions so the
    // partial-merge path (serialize/deserialize included) actually runs
    val df = spark
      .range(1000)
      .repartition(8)
      .select(
        (col("id") % 3).as("g"),
        transform(sequence(lit(0), lit(7)), i => (col("id") * 31 + i * 7 % 97).cast("double")).as("v")
      )
    val agg = df
      .groupBy($"g")
      .agg(GraftFunctions.vectorAvg($"v").as("c"))
      .select($"g", posexplode($"c").as(Seq("pos", "got")))
    val oracle = df
      .select($"g", posexplode($"v").as(Seq("pos", "x")))
      .groupBy($"g", $"pos")
      .agg(avg($"x").as("want"))
    val joined = agg.join(oracle, Seq("g", "pos")).collect()
    assert(joined.length === 24)
    joined.foreach { r =>
      val got = r.getAs[Double]("got"); val want = r.getAs[Double]("want")
      assert(math.abs(got - want) < 1e-9, s"g=${r.get(0)} pos=${r.get(1)}: $got vs $want")
    }
  }

  test("null vectors skipped; all-null group yields null; float input upcast") {
    GraftFunctions.register(spark)
    val df = Seq(
      (0L, Some(Seq(1.0f, 3.0f))),
      (0L, None),
      (0L, Some(Seq(3.0f, 5.0f))),
      (1L, None)
    ).toDF("g", "v")
    val rows = df
      .groupBy($"g")
      .agg(GraftFunctions.vectorAvg($"v").as("c"))
      .orderBy($"g")
      .collect()
    assert(rows(0).getSeq[Double](1) === Seq(2.0, 4.0))
    assert(rows(1).isNullAt(1))
  }
}
