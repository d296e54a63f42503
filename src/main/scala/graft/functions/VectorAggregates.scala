package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable (count, elementwise-sums) accumulator; sized lazily from the
  * first vector seen so the aggregate needs no dim parameter.
  */
final class VecSumBuffer {
  var count: Long = 0L
  var sums: Array[Double] = _

  def add(v: ArrayData, isFloat: Boolean): Unit = {
    val n = v.numElements()
    if (sums == null) sums = new Array[Double](n)
    require(n == sums.length, s"ragged vectors: saw dims ${sums.length} and $n")
    var i = 0
    while (i < n) {
      sums(i) += (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
      i += 1
    }
    count += 1
  }

  def mergeFrom(o: VecSumBuffer): Unit =
    if (o.sums != null) {
      if (sums == null) { sums = o.sums.clone(); count = o.count }
      else {
        require(sums.length == o.sums.length, "ragged vectors across partitions")
        var i = 0
        while (i < sums.length) { sums(i) += o.sums(i); i += 1 }
        count += o.count
      }
    }
}

/** Elementwise mean of an array<float>/array<double> column as a
  * TypedImperativeAggregate (SURVEY.md §4.4 family, like TopKByScore).
  *
  * Why not posexplode + groupBy(key, pos) + avg: that formulation shuffles
  * one row PER DIMENSION per vector — a 64-dim corpus shuffles 64× its
  * row count (the char-entropy explode trap in vector form). This
  * aggregate keeps whole vectors in the map task and ships ONE
  * (count, sums[dim]) pair per (group × partition) through the exchange —
  * the standard distributed-centroid shape (same partial-aggregation
  * structure as the IVF k-means step in [[graft.operators.Similarity]]).
  *
  * NULL vectors are skipped; an all-NULL group yields NULL. Ragged
  * dimensions fail loudly rather than silently truncating.
  */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[VecSumBuffer] {

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(buf: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData], elemIsFloat)
    buf
  }

  override def merge(b1: VecSumBuffer, b2: VecSumBuffer): VecSumBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: VecSumBuffer): Any =
    if (buf.sums == null || buf.count == 0) null
    else {
      val out = new Array[Double](buf.sums.length)
      var i = 0
      while (i < out.length) { out(i) = buf.sums(i) / buf.count; i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buf: VecSumBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.count)
    val n = if (buf.sums == null) -1 else buf.sums.length
    out.writeInt(n)
    var i = 0
    while (i < math.max(n, 0)) { out.writeDouble(buf.sums(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new VecSumBuffer
    buf.count = in.readLong()
    val n = in.readInt()
    if (n >= 0) {
      buf.sums = new Array[Double](n)
      var i = 0
      while (i < n) { buf.sums(i) = in.readDouble(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorAvg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorAvg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}

/** Mutable exact-long elementwise signed-sum accumulator for
  * [[LongVecSignedSum]] — fixed dim so an empty group yields an exact
  * zero vector (the "no misclassified docs → zero weight delta" case).
  */
final class LongVecSumBuffer(val dim: Int) {
  var sums: Array[Long] = new Array[Long](dim)

  def add(v: ArrayData, sign: Long): Unit = {
    require(v.numElements() == dim,
      s"ragged vectors: expected dim $dim, saw ${v.numElements()}")
    var i = 0
    while (i < dim) {
      sums(i) = Math.addExact(sums(i), Math.multiplyExact(sign, v.getLong(i)))
      i += 1
    }
  }

  def mergeFrom(o: LongVecSumBuffer): Unit = {
    var i = 0
    while (i < dim) { sums(i) = Math.addExact(sums(i), o.sums(i)); i += 1 }
  }
}

/** Elementwise EXACT-LONG signed sum Σ sign_i · vec_i over an
  * array<long> column — the weight-delta step of the dense batch
  * perceptron (Σ_{i ∈ mis} y_i · cnt_i(b) for every bucket at once),
  * identical to the previous posexplode + groupBy(b) + sum(y·cnt)
  * formulation but shipping ONE dim-long vector per partition through
  * the exchange instead of one row per (doc, bucket). Same map-side
  * partial-aggregation shape as [[VectorAvg]]; integer adds are exact
  * and order-independent, and overflow is LOUD (addExact — the engine's
  * Pca/Preference doctrine). NULL vectors or signs are skipped (a
  * NULL-text doc never contributed sparse rows either); an empty group
  * yields the exact zero vector.
  */
case class LongVecSignedSum(
    vec: Expression,
    sign: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[LongVecSumBuffer] {

  require(dim >= 1, s"dim must be positive, got $dim")

  override def children: Seq[Expression] = Seq(vec, sign)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): LongVecSumBuffer = new LongVecSumBuffer(dim)

  override def update(buf: LongVecSumBuffer, input: InternalRow): LongVecSumBuffer = {
    val v = vec.eval(input)
    if (v != null) {
      val s = sign.eval(input)
      if (s != null) buf.add(v.asInstanceOf[ArrayData], s.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: LongVecSumBuffer, b2: LongVecSumBuffer): LongVecSumBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: LongVecSumBuffer): Any = new GenericArrayData(buf.sums)

  override def serialize(buf: LongVecSumBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.dim)
    var i = 0
    while (i < buf.dim) { out.writeLong(buf.sums(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): LongVecSumBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new LongVecSumBuffer(in.readInt())
    var i = 0
    while (i < buf.dim) { buf.sums(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): LongVecSignedSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LongVecSignedSum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(vec = cs(0), sign = cs(1))
}

/** Mutable elementwise (mins, maxs) accumulator, sized lazily like
  * [[VecSumBuffer]].
  */
final class VecMinMaxBuffer {
  var mins: Array[Double] = _
  var maxs: Array[Double] = _

  def add(v: ArrayData, isFloat: Boolean): Unit = {
    val n = v.numElements()
    if (mins == null) {
      mins = Array.fill(n)(Double.PositiveInfinity)
      maxs = Array.fill(n)(Double.NegativeInfinity)
    }
    require(n == mins.length, s"ragged vectors: saw dims ${mins.length} and $n")
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      if (x < mins(i)) mins(i) = x
      if (x > maxs(i)) maxs(i) = x
      i += 1
    }
  }

  def mergeFrom(o: VecMinMaxBuffer): Unit =
    if (o.mins != null) {
      if (mins == null) { mins = o.mins.clone(); maxs = o.maxs.clone() }
      else {
        require(mins.length == o.mins.length, "ragged vectors across partitions")
        var i = 0
        while (i < mins.length) {
          if (o.mins(i) < mins(i)) mins(i) = o.mins(i)
          if (o.maxs(i) > maxs(i)) maxs(i) = o.maxs(i)
          i += 1
        }
      }
    }
}

/** Elementwise (min, max) ranges of an array<float>/array<double> column as
  * ONE TypedImperativeAggregate returning struct(mins, maxs) — the
  * calibration pass of scalar quantization (x40). Same shape argument as
  * [[VectorAvg]]: the posexplode + groupBy(pos) twin shuffles dim × corpus
  * rows, while this ships one (mins[dim], maxs[dim]) pair per partition —
  * for a corpus-wide calibration that is a SINGLE pair per map task into
  * one tiny reduce, and min/max are exact (no FP-order sensitivity at
  * all, unlike sums). NULL vectors are skipped; an all-NULL input yields
  * NULL.
  */
case class VectorMinMax(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[VecMinMaxBuffer] {

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(
    Seq(
      StructField("mins", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("maxs", ArrayType(DoubleType, containsNull = false), nullable = false)
    )
  )

  override def createAggregationBuffer(): VecMinMaxBuffer = new VecMinMaxBuffer

  override def update(buf: VecMinMaxBuffer, input: InternalRow): VecMinMaxBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData], elemIsFloat)
    buf
  }

  override def merge(b1: VecMinMaxBuffer, b2: VecMinMaxBuffer): VecMinMaxBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: VecMinMaxBuffer): Any =
    if (buf.mins == null) null
    else
      InternalRow(new GenericArrayData(buf.mins), new GenericArrayData(buf.maxs))

  override def serialize(buf: VecMinMaxBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val n = if (buf.mins == null) -1 else buf.mins.length
    out.writeInt(n)
    var i = 0
    while (i < math.max(n, 0)) { out.writeDouble(buf.mins(i)); i += 1 }
    i = 0
    while (i < math.max(n, 0)) { out.writeDouble(buf.maxs(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecMinMaxBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new VecMinMaxBuffer
    val n = in.readInt()
    if (n >= 0) {
      buf.mins = new Array[Double](n)
      buf.maxs = new Array[Double](n)
      var i = 0
      while (i < n) { buf.mins(i) = in.readDouble(); i += 1 }
      i = 0
      while (i < n) { buf.maxs(i) = in.readDouble(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorMinMax =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorMinMax =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}

/** Mutable per-(subspace, code) assignment accumulator for ONE Lloyd
  * round of product-quantization training: counts[m·ksub] +
  * sums[m·ksub·sub] — ~m·ksub·(sub+1) doubles of bounded state per
  * partition (48 KB at m=32, ksub=64, sub=2), regardless of corpus
  * size.
  */
final class PqSumsBuffer(val m: Int, val ksub: Int, val sub: Int) {
  var counts: Array[Long] = new Array[Long](m * ksub)
  var sums: Array[Double] = new Array[Double](m * ksub * sub)

  def mergeFrom(o: PqSumsBuffer): Unit = {
    var i = 0
    while (i < counts.length) { counts(i) += o.counts(i); i += 1 }
    i = 0
    while (i < sums.length) { sums(i) += o.sums(i); i += 1 }
  }
}

/** One Lloyd ROUND of PQ training as a single TypedImperativeAggregate:
  * for every vector, assign each subspace's sub-vector to its nearest
  * current codebook entry (exact double L2, ties to the smallest code)
  * and accumulate (count, sub-vector sum) per (subspace, code) cell.
  * The whole round is ONE map-side-partial aggregation — the
  * per-subspace-loop alternative runs m driver jobs per round, and the
  * posexplode twin shuffles m × corpus rows (the x26 explosion). Eval
  * returns struct(counts: array<long>, sums: array<double>) — one
  * m·ksub·(sub+1)-bounded row to the driver, the ivfCentroids
  * bounded-scalar contract.
  *
  * `books` is the CURRENT flattened codebook [(s·ksub + k)·sub + j];
  * the driver folds eval's sums into the next round's books (empty
  * cells keep their previous entry).
  */
case class PqTrainSums(
    child: Expression,
    books: Seq[Double],
    m: Int,
    ksub: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[PqSumsBuffer] {
  require(m >= 1 && ksub >= 1 && books.length % (m * ksub) == 0,
    "books must hold m*ksub entries of dim/m components")

  private val sub: Int = books.length / (m * ksub)
  @transient private lazy val bookArr: Array[Double] = books.toArray

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("counts", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): PqSumsBuffer = new PqSumsBuffer(m, ksub, sub)

  override def update(buf: PqSumsBuffer, input: InternalRow): PqSumsBuffer = {
    val raw = child.eval(input)
    if (raw != null) {
      val v = raw.asInstanceOf[ArrayData]
      require(v.numElements() == m * sub,
        s"vector dim ${v.numElements()} != codebook dim ${m * sub}")
      val fl = elemIsFloat
      var s = 0
      while (s < m) {
        var bestK = 0
        var bestD = Double.MaxValue
        var k = 0
        while (k < ksub) {
          val base = (s * ksub + k) * sub
          var d = 0.0
          var j = 0
          while (j < sub) {
            val x = if (fl) v.getFloat(s * sub + j).toDouble else v.getDouble(s * sub + j)
            val diff = x - bookArr(base + j)
            d += diff * diff
            j += 1
          }
          if (d < bestD) { bestD = d; bestK = k }
          k += 1
        }
        val cell = s * ksub + bestK
        buf.counts(cell) += 1
        var j = 0
        while (j < sub) {
          val x = if (fl) v.getFloat(s * sub + j).toDouble else v.getDouble(s * sub + j)
          buf.sums(cell * sub + j) += x
          j += 1
        }
        s += 1
      }
    }
    buf
  }

  override def merge(b1: PqSumsBuffer, b2: PqSumsBuffer): PqSumsBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: PqSumsBuffer): Any =
    InternalRow(new GenericArrayData(buf.counts), new GenericArrayData(buf.sums))

  override def serialize(buf: PqSumsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.m); out.writeInt(buf.ksub); out.writeInt(buf.sub)
    var i = 0
    while (i < buf.counts.length) { out.writeLong(buf.counts(i)); i += 1 }
    i = 0
    while (i < buf.sums.length) { out.writeDouble(buf.sums(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PqSumsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val bm = in.readInt(); val bk = in.readInt(); val bs = in.readInt()
    val buf = new PqSumsBuffer(bm, bk, bs)
    var i = 0
    while (i < buf.counts.length) { buf.counts(i) = in.readLong(); i += 1 }
    i = 0
    while (i < buf.sums.length) { buf.sums(i) = in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): PqTrainSums =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PqTrainSums =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}

/** Mutable integer second-moment accumulator for [[IntGram]]: count,
  * per-dimension sums, and the upper-triangle of Σ q qᵀ (row-major
  * packed: entry (i, j), i ≤ j, lives at i·dim − i(i−1)/2 + (j − i)).
  * Sized lazily from the first vector seen.
  */
final class IntGramBuffer {
  var count: Long = 0L
  var sums: Array[Long] = _
  var gram: Array[Long] = _

  def add(v: ArrayData): Unit = {
    val n = v.numElements()
    if (sums == null) {
      sums = new Array[Long](n)
      gram = new Array[Long](n * (n + 1) / 2)
    }
    require(n == sums.length, s"ragged vectors: saw dims ${sums.length} and $n")
    var i = 0
    var k = 0
    while (i < n) {
      val qi = v.getLong(i)
      sums(i) += qi
      var j = i
      while (j < n) { gram(k) += qi * v.getLong(j); j += 1; k += 1 }
      i += 1
    }
    count += 1
  }

  def mergeFrom(o: IntGramBuffer): Unit =
    if (o.sums != null) {
      if (sums == null) {
        sums = o.sums.clone(); gram = o.gram.clone(); count = o.count
      } else {
        require(sums.length == o.sums.length, "ragged vectors across partitions")
        var i = 0
        while (i < sums.length) { sums(i) += o.sums(i); i += 1 }
        i = 0
        while (i < gram.length) { gram(i) += o.gram(i); i += 1 }
        count += o.count
      }
    }
}

/** Exact integer second moments of a quantized ARRAY<BIGINT> vector
  * column — (n, Σq, upper-tri Σ q qᵀ) in ONE pass, the inputs a PCA /
  * whitening / OPQ-rotation trainer needs (covariance·n² derives as
  * n·Σqqᵀ − (Σq)(Σq)ᵀ without ever dividing, so the result is exact and
  * engine-replayable).
  *
  * Why not posexplode twice + groupBy(i, j): that formulation shuffles
  * dim²/2 rows PER VECTOR (a 64-dim corpus ships 2 080× its row count —
  * the VectorAvg explode trap squared); this aggregate keeps whole
  * vectors in the map task and ships ONE (count, sums[dim],
  * gram[dim(dim+1)/2]) triple per partition through the exchange.
  *
  * Caller contract: |q|·√n must stay far from 2³¹ so the gram entries
  * (≤ n·max|q|²) cannot overflow — with the engine-standard 10³
  * quantization that admits corpora to ~10⁹ training rows, far above
  * the documented sample bound of the trainers that consume this.
  * NULL vectors are skipped; an all-NULL input yields NULL.
  */
case class IntGram(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[IntGramBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("g", ArrayType(LongType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): IntGramBuffer = new IntGramBuffer

  override def update(buf: IntGramBuffer, input: InternalRow): IntGramBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(b1: IntGramBuffer, b2: IntGramBuffer): IntGramBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: IntGramBuffer): Any =
    if (buf.sums == null || buf.count == 0) null
    else InternalRow(
      buf.count,
      new GenericArrayData(buf.sums),
      new GenericArrayData(buf.gram))

  override def serialize(buf: IntGramBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.count)
    // sums and gram are null together (sized on the first add)
    if (buf.sums == null) out.writeInt(-1)
    else {
      out.writeInt(buf.sums.length)
      var i = 0
      while (i < buf.sums.length) { out.writeLong(buf.sums(i)); i += 1 }
      i = 0
      while (i < buf.gram.length) { out.writeLong(buf.gram(i)); i += 1 }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): IntGramBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new IntGramBuffer
    buf.count = in.readLong()
    val n = in.readInt()
    if (n >= 0) {
      buf.sums = new Array[Long](n)
      buf.gram = new Array[Long](n * (n + 1) / 2)
      var i = 0
      while (i < n) { buf.sums(i) = in.readLong(); i += 1 }
      i = 0
      while (i < buf.gram.length) { buf.gram(i) = in.readLong(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): IntGram =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): IntGram =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}
