package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  test("topk agrees with window row_number across many partitions") {
    // deterministic pseudo-random scores over 3 groups × 5000 rows
    val df = spark
      .range(15000)
      .select(
        (col("id") % 3).as("query_id"),
        col("id").as("neighbor_id"),
        (pmod(xxhash64(col("id")), lit(100000)).cast("double") / 100000.0).as("score")
      )
      .repartition(13) // force partial buffers + merges
    val viaAgg = df
      .groupBy(col("query_id"))
      .agg(GraftFunctions.topKByScore(col("score"), col("neighbor_id"), 7).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(
        col("query_id"),
        col("t.neighbor_id"),
        col("t.score"),
        (col("pos") + 1).cast("long").as("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    val viaWindow = df
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 7)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3).toLong))
      .toSet
    assert(viaAgg === viaWindow)
  }

  test("ties broken by lower id; fewer rows than k returns all") {
    val df = Seq(
      (1L, 10L, 0.5), (1L, 5L, 0.5), (1L, 7L, 0.9)
    ).toDF("query_id", "neighbor_id", "score")
    val out = df
      .groupBy(col("query_id"))
      .agg(GraftFunctions.topKByScore(col("score"), col("neighbor_id"), 10).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.neighbor_id"))
      .collect()
      .map(_.getLong(0))
      .toSeq
    assert(out === Seq(7L, 5L, 10L))
  }
}
