package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
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
  * `PartitionReader`s produce the snapshot on executors: here they read a
  * captured snapshot file (JSON lines, one ticker per line — the zero-egress
  * stand-in); a production build would issue the paginated HTTP calls from
  * the same `PartitionReader` seams without touching the query side.
  *
  * Usage: `spark.read.format("graft-tickers").option("path", p).load()`
  * (registered via META-INF/services), or the full class name. `src_seq` is
  * assigned from (partition base + line number) so arrival order is explicit
  * and shuffle-stable (SURVEY.md §7.4). `partitions` option (default 4)
  * splits the file by line ranges — a stand-in for per-shard API pagination.
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
  override def name(): String = s"graft_tickers(${props.getOrElse("path", "?")})"
  override def schema(): StructType = Schemas.ticker
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      private val path = Option(options.get("path"))
        .orElse(props.get("path"))
        .getOrElse(throw new IllegalArgumentException("graft-tickers requires a 'path' option"))
      private val nParts = Option(options.get("partitions"))
        .orElse(props.get("partitions")).map(_.toInt).getOrElse(4)

      override def build(): Scan = this
      override def readSchema(): StructType = Schemas.ticker
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        // line-count split done once at planning (file is one snapshot;
        // the production impl would enumerate API pages here instead)
        val total = {
          val in = Files.lines(Paths.get(path))
          try in.count().toInt
          finally in.close()
        }
        val per = math.max(1, (total + nParts - 1) / nParts)
        (0 until total by per)
          .map(start => TickerInputPartition(path, start, math.min(per, total - start)))
          .toArray[InputPartition]
      }

      override def createReaderFactory(): PartitionReaderFactory =
        (partition: InputPartition) => {
          val p = partition.asInstanceOf[TickerInputPartition]
          new TickerPartitionReader(p)
        }
    }
}

case class TickerInputPartition(path: String, startLine: Int, numLines: Int)
    extends InputPartition

final class TickerPartitionReader(p: TickerInputPartition)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val lines = {
    val all = Files.readAllLines(Paths.get(p.path), StandardCharsets.UTF_8)
    all.subList(p.startLine, p.startLine + p.numLines).asScala
  }
  private var i = -1

  override def next(): Boolean = { i += 1; i < lines.size }

  override def get(): InternalRow = {
    val node = mapper.readTree(lines(i))
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
      (p.startLine + i).toLong // src_seq = global arrival order
    )
  }

  override def close(): Unit = ()
}
