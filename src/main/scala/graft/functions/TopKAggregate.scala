package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score, id) pairs, ordered by
  * (score desc, id asc). Array-backed insertion keeps the worst element
  * at the tail for O(k) insert with early reject — k is small (≤ ~1000).
  */
final class TopKBuffer(val k: Int) {
  var size = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(s: Double, id: Long): Unit = {
    if (size == k && !better(s, id, scores(k - 1), ids(k - 1))) return
    var pos = if (size < k) size else k - 1
    while (pos > 0 && better(s, id, scores(pos - 1), ids(pos - 1))) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1)
      pos -= 1
    }
    scores(pos) = s; ids(pos) = id
    if (size < k) size += 1
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }
}

/** Exact per-group top-k as a TypedImperativeAggregate (SURVEY.md §4.4).
  *
  * Why not a rank window: `row_number().over(partitionBy(q).orderBy(score))`
  * shuffles EVERY scored pair and sorts per group — at 100 TB the shuffle
  * of |queries|×|corpus| rows is the job. An aggregate gets map-side
  * partial aggregation: each task reduces its partition to k rows per
  * group before the exchange, so the shuffle carries ≤ k·partitions rows
  * per group regardless of corpus size.
  *
  * Output: array<struct<neighbor_id long, score double>> ordered by
  * (score desc, neighbor_id asc) — deterministic ties.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0 && k <= 65536, "k must be in (0, 65536]")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(
      Seq(StructField("neighbor_id", LongType), StructField("score", DoubleType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      buf.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = new GenericInternalRow(Array[Any](buf.ids(i), buf.scores(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) {
      val s = in.readDouble(); val id = in.readLong()
      buf.scores(i) = s; buf.ids(i) = id; i += 1
    }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = cs(0), idExpr = cs(1))
}

/** [[TopKBuffer]]'s integer-score twin: keeps the k best (score, id)
  * pairs under EXACT 64-bit comparison — for rankings whose scores are
  * fixed-point BIGINTs (BM25 `score_ppm`, ppm-scaled distances) where a
  * detour through double would collapse ties above 2^53.
  */
final class TopKLongBuffer(val k: Int) {
  var size = 0
  val scores = new Array[Long](k)
  val ids = new Array[Long](k)

  @inline private def better(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(s: Long, id: Long): Unit = {
    if (size == k && !better(s, id, scores(k - 1), ids(k - 1))) return
    var pos = if (size < k) size else k - 1
    while (pos > 0 && better(s, id, scores(pos - 1), ids(pos - 1))) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1)
      pos -= 1
    }
    scores(pos) = s; ids(pos) = id
    if (size < k) size += 1
  }

  def mergeFrom(other: TopKLongBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }
}

/** [[TopKByScore]] over BIGINT scores — same map-side partial-top-k scale
  * posture (shuffle carries ≤ k rows per group per task), but comparisons
  * are exact 64-bit integer order: a sum-of-contribs score that exceeds
  * 2^53 (where doubles stop being integer-exact and ties collapse) still
  * ranks identically to a SQL engine's BIGINT ORDER BY.
  *
  * Output: array<struct<neighbor_id long, score long>> ordered by
  * (score desc, neighbor_id asc).
  */
case class TopKByLongScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKLongBuffer] {

  require(k > 0 && k <= 65536, "k must be in (0, 65536]")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(
      Seq(StructField("neighbor_id", LongType), StructField("score", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKLongBuffer = new TopKLongBuffer(k)

  override def update(buf: TopKLongBuffer, input: InternalRow): TopKLongBuffer = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      buf.insert(s.asInstanceOf[Long], id.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TopKLongBuffer, b2: TopKLongBuffer): TopKLongBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: TopKLongBuffer): Any = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = new GenericInternalRow(Array[Any](buf.ids(i), buf.scores(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKLongBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeLong(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKLongBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKLongBuffer(k)
    var i = 0
    while (i < n) {
      val s = in.readLong(); val id = in.readLong()
      buf.scores(i) = s; buf.ids(i) = id; i += 1
    }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByLongScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByLongScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = cs(0), idExpr = cs(1))
}
