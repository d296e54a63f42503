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

  test("url option fetches the snapshot over HTTP with reference semantics (main.py:94-104)") {
    // local JDK HttpServer standing in for the exchange API (zero egress)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val body =
      """{"result":[
        |{"symbol":"C-ETH-100-171025","contract_type":"call_options","strike_price":"100","spot_price":"105","mark_price":"1.0","oi_contracts":"7"},
        |{"symbol":"P-ETH-101-171025","contract_type":"put_options","strike_price":"101","spot_price":"105","mark_price":"2.0","oi_contracts":"8"}
        |]}""".stripMargin.replace("\n", "")
    server.createContext(
      "/v2/tickers",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val b = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b)
        ex.close()
      })
    server.createContext(
      "/broken",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.sendResponseHeaders(503, -1)
        ex.close()
      })
    server.start()
    try {
      val port = server.getAddress.getPort
      val df = spark.read.format("graft-tickers")
        .option("url", s"http://127.0.0.1:$port/v2/tickers").load()
      val rows = df.orderBy(col("src_seq")).collect()
      assert(rows.length === 2)
      assert(rows(0).getString(0) === "C-ETH-100-171025")
      assert(rows(1).getString(1) === "put_options")
      assert(rows.map(_.getLong(6)).toSeq === Seq(0L, 1L))

      // non-2xx must fail the read (reference raise_for_status, main.py:101)
      val bad = spark.read.format("graft-tickers")
        .option("url", s"http://127.0.0.1:$port/broken").load()
      val e = intercept[org.apache.spark.SparkException](bad.count())
      assert(e.getMessage.contains("503") ||
        Option(e.getCause).exists(_.getMessage.contains("503")))
    } finally server.stop(0)
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
