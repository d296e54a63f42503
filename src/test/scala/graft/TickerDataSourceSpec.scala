package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

class TickerDataSourceSpec extends SparkSpec {

  private def writeFixture(): String = {
    val lines = (0 until 10).map { i =>
      s"""{"symbol":"C-ETH-${100 + i}-171025","contract_type":"call_options","strike_price":"${100 + i}","spot_price":"105","mark_price":"1.$i","oi_contracts":"$i"}"""
    } :+ """{"symbol":"P-ETH-99-171025","contract_type":"put_options","strike_price":null,"spot_price":"105"}"""
    val f = Files.createTempFile("tickers", ".jsonl")
    Files.write(f, lines.mkString("\n").getBytes)
    f.toString
  }

  test("v2 source reads snapshot with schema, src_seq order, and null passthrough") {
    val path = writeFixture()
    val df = spark.read.format("graft-tickers").option("path", path).load()
    assert(df.schema === Schemas.ticker)
    val rows = df.orderBy(col("src_seq")).collect()
    assert(rows.length === 11)
    assert(rows(0).getString(0) === "C-ETH-100-171025")
    assert(rows.map(_.getLong(6)).toSeq === (0L until 11L))
    assert(rows(10).isNullAt(2)) // missing strike_price → null
    assert(rows(10).isNullAt(4)) // absent mark_price field → null
  }

  test("partitions option splits the read without changing content") {
    val path = writeFixture()
    val df = spark.read.format("graft-tickers")
      .option("path", path).option("partitions", "3").load()
    assert(df.rdd.getNumPartitions === 3)
    assert(df.count() === 11)
    // feeds the pipeline parser end-to-end
    val parsed = graft.operators.OptionsPipeline.parseSnapshot(df)
    assert(parsed.count() === 10) // the null-strike row is dropped
  }
}
