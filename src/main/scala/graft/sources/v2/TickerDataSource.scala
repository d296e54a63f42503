package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.Schemas

/** DataSource V2 connector for ticker snapshots (SURVEY.md §2.1).
  *
  * The reference fetches `GET /v2/tickers` eagerly on the driver
  * (main.py:94-104). The scalable shape is a V2 `TableProvider` whose
  * `PartitionReader`s produce the snapshot on executors. Two reader modes:
  *
  *   - `option("path", p)`: a captured snapshot file (JSON lines, one
  *     ticker per line — replay/test mode). `partitions` (default 4) splits
  *     the file by line ranges, a stand-in for per-shard API pagination.
  *   - `option("url", u)`: a live HTTP fetch from the executor-side reader —
  *     the reference's `requests.get(url, timeout=30)` semantics: 30 s
  *     connect/read timeout (`timeoutMs` option), throw on any non-2xx
  *     status (main.py:101 raise_for_status), body is `{"result": [ticker…]}`
  *     (main.py:103-104). One partition per snapshot — the endpoint returns
  *     the whole chain in one response; an API with real pagination would
  *     emit one partition per page from the same `planInputPartitions` seam.
  *
  * `src_seq` is assigned from arrival order (partition base + element index)
  * so keep-last/first-spot semantics are explicit and shuffle-stable
  * (SURVEY.md §7.4).
  */
class TickerDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tickers"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Schemas.ticker

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TickerTable(properties.asScala.toMap)
}

final class TickerTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String =
    s"graft_tickers(${props.get("path").orElse(props.get("url")).getOrElse("?")})"
  override def schema(): StructType = Schemas.ticker
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      private def opt(key: String): Option[String] =
        Option(options.get(key)).orElse(props.get(key))
      private val url = opt("url")
      private val path = opt("path")
      private val nParts = opt("partitions").map(_.toInt).getOrElse(4)
      private val timeoutMs = opt("timeoutMs").map(_.toInt).getOrElse(30000)
      require(
        url.isDefined || path.isDefined,
        "graft-tickers requires a 'path' (capture file) or 'url' (HTTP) option")

      override def build(): Scan = this
      override def readSchema(): StructType = Schemas.ticker
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = url match {
        case Some(u) =>
          // one snapshot per GET; a paginated API would enumerate pages here
          Array(HttpTickerPartition(u, timeoutMs))
        case None =>
          // line-count split done once at planning (file is one snapshot)
          val total = {
            val in = Files.lines(Paths.get(path.get))
            try in.count().toInt
            finally in.close()
          }
          val per = math.max(1, (total + nParts - 1) / nParts)
          (0 until total by per)
            .map(start => TickerInputPartition(path.get, start, math.min(per, total - start)))
            .toArray[InputPartition]
      }

      override def createReaderFactory(): PartitionReaderFactory = {
        case p: TickerInputPartition => new TickerPartitionReader(p)
        case p: HttpTickerPartition => new HttpTickerPartitionReader(p)
        case other => throw new IllegalStateException(s"unexpected partition $other")
      }
    }
}

case class TickerInputPartition(path: String, startLine: Int, numLines: Int)
    extends InputPartition

case class HttpTickerPartition(url: String, timeoutMs: Int) extends InputPartition

private object TickerRows {
  /** Project one ticker JSON object to the Schemas.ticker row shape. */
  def toRow(node: JsonNode, srcSeq: Long): InternalRow = {
    def s(field: String): UTF8String = {
      val v = node.get(field)
      if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
    }
    InternalRow(
      s("symbol"),
      s("contract_type"),
      s("strike_price"),
      s("spot_price"),
      s("mark_price"),
      s("oi_contracts"),
      srcSeq
    )
  }
}

final class TickerPartitionReader(p: TickerInputPartition)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val lines = {
    val all = Files.readAllLines(Paths.get(p.path), StandardCharsets.UTF_8)
    all.subList(p.startLine, p.startLine + p.numLines).asScala
  }
  private var i = -1

  override def next(): Boolean = { i += 1; i < lines.size }

  override def get(): InternalRow =
    TickerRows.toRow(mapper.readTree(lines(i)), (p.startLine + i).toLong)

  override def close(): Unit = ()
}

/** Executor-side HTTP snapshot fetch (reference main.py:94-104): GET with
  * connect+read timeout, fail the task on non-2xx — Spark's task retry then
  * provides the retry/backoff story the reference lacks.
  */
final class HttpTickerPartitionReader(p: HttpTickerPartition)
    extends PartitionReader[InternalRow] {
  private lazy val tickers: IndexedSeq[JsonNode] = {
    val conn = new java.net.URI(p.url).toURL
      .openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(p.timeoutMs)
    conn.setReadTimeout(p.timeoutMs)
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    if (code < 200 || code >= 300) {
      conn.disconnect()
      throw new java.io.IOException(s"graft-tickers: HTTP $code from ${p.url}")
    }
    val body =
      try new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      finally conn.disconnect()
    val root = new ObjectMapper().readTree(body)
    val result = root.get("result")
    if (result == null || !result.isArray)
      throw new java.io.IOException(s"graft-tickers: no 'result' array in response from ${p.url}")
    (0 until result.size()).map(result.get)
  }
  private var i = -1

  override def next(): Boolean = { i += 1; i < tickers.size }

  override def get(): InternalRow = TickerRows.toRow(tickers(i), i.toLong)

  override def close(): Unit = ()
}
