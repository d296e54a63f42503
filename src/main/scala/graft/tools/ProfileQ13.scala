package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Parse
import graft.sources.TickerSource

/** Granular timing of the q13 phases (dev tool): where do the seconds go —
  * scan, symbol build, repartition, parse, policy pass?
  */
object ProfileQ13 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, "profile-q13")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    time("scan only")(li.count())
    time("scan+agg (q01 shape)")(li.groupBy(col("l_returnflag")).count().count())
    time("scan+repartition")(li.repartition(32).count())
    val raw = TickerSource.syntheticFromLineitem(spark, dir)
    time("build symbols (1st)")(raw.count())
    time("build symbols (2nd)")(raw.count())
    time("build+expiry parse distinct")(
      raw.select(Parse.expiryFromSymbol(col("symbol")).as("e")).distinct().count())
    time("build+full parseSnapshot")(
      graft.operators.OptionsPipeline.parseSnapshot(raw).count())

    // bisect the parse cost
    val cached = raw.persist()
    time("materialize cache")(cached.count())
    time("split only")(cached.select(split(col("symbol"), "-").as("p")).count())
    time("expiryToken")(cached.select(Parse.expiryToken(col("symbol")).as("t")).count())
    time("expiryFromSymbol")(cached.select(Parse.expiryFromSymbol(col("symbol")).as("e")).count())
    time("token->date only")(
      cached
        .select(element_at(split(col("symbol"), "-"), -1).as("tok"))
        .select(Parse.expiryFromToken(col("tok")).as("e"))
        .count())
    time("make_date variant")(
      cached
        .select(element_at(split(col("symbol"), "-"), -1).as("tok"))
        .select(
          make_date(
            substring(col("tok"), 5, 2).try_cast("int") + lit(2000),
            substring(col("tok"), 3, 2).try_cast("int"),
            substring(col("tok"), 1, 2).try_cast("int")).as("e"))
        .count())
    time("mandatoryPresent")(cached.where(Parse.mandatoryPresent(cached)).count())
    time("markPriceOrDrop")(cached.select(Parse.markPriceOrDrop(col("mark_price")).as("m")).count())
    time("oiContractsOrDrop")(cached.select(Parse.oiContractsOrDrop(col("oi_contracts")).as("o")).count())
    time("strike tryDouble")(cached.select(Parse.tryDouble(col("strike_price")).as("s")).count())
    val pc = graft.operators.OptionsPipeline.parseSnapshot(cached)
    time("full parseSnapshot FROM CACHE")(pc.count())
    println("=== executed plan: parseSnapshot(cached) ===")
    println(pc.queryExecution.executedPlan.toString.linesIterator.take(12).mkString("\n"))

    val uncachedRepart = spark.read.parquet(s"$dir/lineitem.parquet").repartition(32)
    val rebuilt = TickerSource.syntheticFromLineitem(spark, dir)
    val pu = graft.operators.OptionsPipeline.parseSnapshot(rebuilt)
    time("full parseSnapshot NO CACHE")(pu.count())
    println("=== executed plan: parseSnapshot(no cache) ===")
    println(pu.queryExecution.executedPlan.toString.linesIterator.take(14).mkString("\n"))
    spark.stop()
  }
}
