package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch over one partition's token stream:
  * at most `k` counters; an unseen token either claims a free counter or
  * decrements every counter by one (dropping zeros). Classic guarantee:
  * any token with partition count > N_p / k still holds a counter at the
  * end of the pass.
  */
final class MgBuffer(var k: Int) {
  // java.lang.Long values ON PURPOSE: with scala.Long the map erases to
  // [String, Object] but get() unboxes an absent key's null to 0L and a
  // null-check on the primitive is vacuously true — the eviction branch
  // becomes unreachable and the sketch silently degrades to an unbounded
  // exact count (caught by SketchSpec's eviction pin).
  val counts = new java.util.HashMap[String, java.lang.Long]()

  def add(t: String): Unit = {
    val c = counts.get(t)
    if (c != null) counts.put(t, c + 1L)
    else if (counts.size < k) counts.put(t, 1L)
    else {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Candidate-union merge: keep every key from both sides, summing
    * counts, with NO re-trim. Trimming is what would make the union lose a
    * survivor; skipping it keeps the completeness proof a one-liner (see
    * [[MisraGriesTokens]]) at the cost of a merged size bounded by
    * partitions × k — driver-collected state of the same order as the
    * ivfCentroids / VectorMinMax contracts.
    */
  def mergeFrom(o: MgBuffer): Unit =
    o.counts.forEach { (t, c) =>
      val prev = counts.get(t)
      val sum = if (prev == null) c.longValue else prev.longValue + c.longValue
      counts.put(t, java.lang.Long.valueOf(sum))
    }
}

/** Per-partition Misra-Gries candidates for the global heavy-hitter set,
  * as a TypedImperativeAggregate over a tokens-array column (SURVEY.md
  * §4.4 family, like [[VectorAvg]] / [[TopKByScore]]).
  *
  * Completeness (why the union of per-partition sketches covers every
  * global phi-heavy token): if a token's global count is cnt >= phi * N,
  * then since Sum_p cnt_p = cnt >= phi * Sum_p N_p, by averaging SOME
  * partition has cnt_p >= phi * N_p; with k >= 2/phi that is
  * cnt_p >= phi * N_p > N_p / k, so Misra-Gries keeps it there, and the
  * trim-free merge keeps it in the union. The exact recount pass then
  * removes false positives, so the final answer is EXACT, while only
  * O(partitions × k) sketch entries — never the full vocabulary — cross
  * the aggregation exchange. The 100 TB alternative (groupBy over every
  * token) shuffles one row per DISTINCT TOKEN per partition: a
  * trillion-token corpus's open vocabulary (URLs, hashes, typos) makes
  * that exchange the job's bottleneck; the sketch bounds it by k.
  *
  * NULL arrays are skipped. Returns the candidate tokens sorted (bytewise,
  * like the engines' ORDER BY on the recount) for determinism.
  */
case class MisraGriesTokens(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[MgBuffer] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        buf.add(arr.getUTF8String(i).toString)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: MgBuffer, b2: MgBuffer): MgBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: MgBuffer): Any = {
    val keys = new Array[String](buf.counts.size)
    val it = buf.counts.keySet().iterator()
    var i = 0
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys, (a: String, b: String) =>
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
    new GenericArrayData(keys.map(UTF8String.fromString))
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.counts.size)
    buf.counts.forEach { (t, c) =>
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MgBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesTokens =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesTokens =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}

/** KMV (k-minimum-values) distinct-count sketch buffer: the k smallest
  * DISTINCT hash values seen so far. O(k) state; add is O(log k); the
  * merge is a union re-trimmed to k — unlike Misra-Gries, re-trimming is
  * exactly correct here (the k global minima are a subset of the union of
  * per-partition k-minima), so the merged sketch equals the sketch of the
  * concatenated stream and the result is independent of partitioning.
  */
final class KmvBuffer(var k: Int) {
  val mins = new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit = {
    if (mins.size < k) { mins.add(h); () }
    else if (h < mins.last()) {
      if (mins.add(h)) { mins.remove(mins.last()); () }
    }
  }

  def mergeFrom(o: KmvBuffer): Unit = {
    val it = o.mins.iterator()
    while (it.hasNext) add(it.next().longValue)
  }
}

/** The k smallest distinct values of a LONG hash column, as a sorted
  * ascending array — the KMV distinct-count sketch (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream"): with hashes uniform on
  * [0, 2^b), E[|D|] ≈ (k-1) · 2^b / h_(k), and |D| < k is EXACT (the
  * sketch holds every distinct value). Deterministic given the hash
  * column, hence oracle-able bit-for-bit — randomness lives in the hash,
  * not the sketch.
  *
  * 100 TB posture: per-group state is k longs regardless of cardinality;
  * map-side partials mean one sketch per group per partition — never one
  * row per distinct element — crosses the exchange, the same bound
  * argument as [[MisraGriesTokens]] but with NO recount pass needed
  * (the estimate is the answer; exactness below k is free). NULL hashes
  * are skipped.
  */
case class KmvMins(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KmvBuffer] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: KmvBuffer, b2: KmvBuffer): KmvBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: KmvBuffer): Any = {
    val out = new Array[Long](buf.mins.size)
    val it = buf.mins.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.mins.size)
    val it = buf.mins.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.mins.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvMins =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMins =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}

/** Count-min sketch counter matrix (Cormode & Muthukrishnan, "An improved
  * data stream summary: the count-min sketch and its applications"):
  * `depth` rows × `width` counters. Each token increments one cell per row
  * (cell chosen by that row's hash); a point query reads the MINIMUM of
  * its `depth` cells, which can only OVERestimate (every occurrence of the
  * token landed in all of its cells; collisions only add).
  */
final class CmsBuffer(val depth: Int, val width: Int) {
  val cells = new Array[Long](depth * width)

  def mergeFrom(o: CmsBuffer): Unit = {
    var i = 0
    while (i < cells.length) { cells(i) += o.cells(i); i += 1 }
  }
}

/** Count-min sketch over a tokens-array column, as a
  * TypedImperativeAggregate returning the flattened depth×width counter
  * matrix (row-major array<long>).
  *
  * Why this exists when exact token counts are one `groupBy(token)` away:
  * the exact plan's exchange carries one row per DISTINCT TOKEN per
  * partition — on a trillion-token corpus with an open vocabulary (URLs,
  * hashes, typos) that exchange grows with the data. The sketch's state is
  * a CONSTANT depth×width longs per group×partition, merge is elementwise
  * addition (the merged matrix equals the matrix of the concatenated
  * stream — partitioning-invariant by construction), and the classic
  * guarantee holds per point query: est ≥ true, and
  * est ≤ true + 2N/width with probability ≥ 1 − (1/2)^depth.
  *
  * Determinism / oracle story: the row-j hash of token t is
  * hash40("j:" + t) mod width — the same md5-prefix integer the rest of
  * the engine uses ([[graft.operators.DistinctSketch.hash40Scala]]), so
  * the whole matrix is a pure function of the data and DuckDB replays
  * every cell and every point estimate bit-for-bit (x60). Production
  * swaps xxhash64 in for speed with the sketch unchanged.
  *
  * NULL arrays contribute nothing; NULL elements cannot occur (tokens
  * arrays are built with containsNull=false splits).
  */
case class CountMinTokens(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[CmsBuffer] {

  require(depth > 0 && width > 0, s"depth/width must be positive, got $depth x $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(depth, width)

  override def update(buf: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val t = arr.getUTF8String(i).toString
        var j = 0
        while (j < depth) {
          val cell = (graft.operators.DistinctSketch.hash40Scala(s"$j:$t") % width).toInt
          buf.cells(j * width + cell) += 1L
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: CmsBuffer, b2: CmsBuffer): CmsBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: CmsBuffer): Any = new GenericArrayData(buf.cells.clone())

  override def serialize(buf: CmsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.depth)
    out.writeInt(buf.width)
    var i = 0
    while (i < buf.cells.length) { out.writeLong(buf.cells(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new CmsBuffer(in.readInt(), in.readInt())
    var i = 0
    while (i < buf.cells.length) { buf.cells(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinTokens =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinTokens =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}

/** HyperLogLog register file: 64 byte-sized registers, merge is
  * elementwise max — the merged file equals the file of the concatenated
  * stream, so the sketch is partitioning-invariant by construction
  * (same argument as [[CmsBuffer]], with max for add).
  */
final class HllBuffer {
  val regs = new Array[Byte](64)

  def addHash(h: Long): Unit = {
    val j = (h >>> 34).toInt // top 6 of the 40 hash bits → bucket
    val rem = h & ((1L << 34) - 1)
    // rho = leading-zero count of the remaining 34 bits + 1, capped at 31
    // (rem < 2^4, p = 2^-30 per element — the cap is what keeps the
    // engine's exact-integer estimate inside BIGINT; see HllRegisters)
    val raw = if (rem == 0L) 35 else 35 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
    val rho = math.min(raw, 31)
    if (rho > regs(j)) regs(j) = rho.toByte
  }

  def mergeFrom(o: HllBuffer): Unit = {
    var i = 0
    while (i < 64) { if (o.regs(i) > regs(i)) regs(i) = o.regs(i); i += 1 }
  }
}

/** HyperLogLog distinct-count registers over a STRING column (Flajolet,
  * Fusy, Gandouet, Meunier, AofA '07): m = 64 buckets from the top 6
  * bits of the engine's 40-bit md5-prefix hash, register j = max over
  * the bucket's values of (leading-zero count of the remaining 34 bits
  * + 1), capped at 31. Returns the register file as array<int>[64].
  *
  * Why this next to [[KmvMins]] (x57): KMV is exact below k and its
  * state is k LONGS; HLL's state is m BYTES — 64 bytes summarize any
  * cardinality with ~1.04/√m ≈ 13% standard error, and the union of two
  * sketches is the elementwise max (KMV union must re-trim through the
  * hash values). HLL is the sketch you ship per shard/day and fold over
  * arbitrary lattices; KMV is the sketch you use when small counts must
  * be exact. The engine carries both, sharing hash40 so both replay in
  * DuckDB bit-for-bit.
  *
  * The downstream estimate ([[graft.operators.DistinctSketch
  * .hllDistinct]]) is the raw HLL estimator in EXACT INTEGER form:
  * est = α_ppm·m²·2^R div (10⁶·S) with R = max register and
  * S = Σ_j 2^(R−M_j) (so S/2^R = Σ 2^−M_j exactly, as integers; the
  * rho cap at 31 bounds α_ppm·m²·2^R < 2⁶³). Flajolet's small/large
  * range corrections need ln/float — out of contract here, disclosed:
  * below ~5m/2 distinct the raw estimator biases high and x57's KMV is
  * the engine's exact-small-range tool; the zero-register count is
  * surfaced so callers can detect the regime.
  *
  * NULL inputs are skipped. 100 TB posture: 64 bytes per
  * group×partition cross the exchange, max-merge; never a row per
  * distinct element.
  */
case class HllRegisters(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[HllBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): HllBuffer = new HllBuffer

  override def update(buf: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.addHash(
        graft.operators.DistinctSketch.hash40Scala(v.asInstanceOf[UTF8String].toString))
    }
    buf
  }

  override def merge(b1: HllBuffer, b2: HllBuffer): HllBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: HllBuffer): Any = {
    val out = new Array[Int](64)
    var i = 0
    while (i < 64) { out(i) = buf.regs(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: HllBuffer): Array[Byte] = buf.regs.clone()

  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val buf = new HllBuffer
    System.arraycopy(bytes, 0, buf.regs, 0, 64)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HllRegisters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegisters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}
