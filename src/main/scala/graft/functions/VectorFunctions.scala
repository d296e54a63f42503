package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity between two embedding vectors, as a native Catalyst
  * expression with whole-stage codegen (`doGenCode`) — the hot inner loop of
  * brute-force ANN stays inside Tungsten-generated Java, no UDF
  * (de)serialization, no boxing (SURVEY.md §4.4).
  *
  * Supports array<float> and array<double> children (testdata
  * embeddings.parquet is array<float>, FIXTURES.md §4). Accumulation is in
  * double regardless of element type. Returns NULL on NULL input, 0.0 when
  * either vector has zero norm, and computes over min(len(a), len(b))
  * elements if lengths differ (defensive; real pipelines have fixed dims).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    val fl = elemIsFloat(left); val fr = elemIsFloat(right)
    var i = 0
    while (i < n) {
      val xi = if (fl) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (fr) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val getR = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
        val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = (double) $a.$getL($i);
           |  double $yi = (double) $b.$getR($i);
           |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
           |}
           |${ev.value} = ($nx == 0.0 || $ny == 0.0)
           |  ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
           |""".stripMargin
      }
    )
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sign-random-projection LSH buckets for `tables` independent hash tables,
  * computed in ONE expression evaluation per vector (array<int> of length
  * `tables`) — the same anti-recompute design as MinHashBands: emitting all
  * tables from a single expression means no projection rewrite can inline
  * the per-table computation N times (SURVEY.md §8.3 lesson).
  *
  * Bucket bit b of table t = sign of dot(v, h_{t,b}) where plane component
  * h_{t,b}[j] = (XXH64(j, XXH64(t*1024+b, seed)) mod 2001 − 1000)/1000 ∈
  * [−1, 1] — deterministic in `seed`, no RNG state to ship, identical on
  * every executor. Codegen'd (`doGenCode`): the dim × tables × bits inner
  * loop runs inside whole-stage-generated Java.
  *
  * The plane matrix is a CONSTANT given (tables, bits, seed, dim), so it is
  * materialized once per task ([[RpBuckets.buildPlanes]], cached in a
  * mutable-state slot / transient field) and the per-row inner loop is a
  * pure multiply-accumulate over it. Deriving components per row (3 hash
  * ops each) tripled the flop count — and late in a many-plan JVM session,
  * where generated code waits behind the JIT compile queue and runs
  * INTERPRETED, that tripling turned x10 into a 60-CPU-second query
  * (§8.3/§8.4 lesson: budget hot-loop work as if it may run interpreted).
  */
case class RpBuckets(child: Expression, tables: Int, bitsPerTable: Int, seed: Int)
    extends UnaryExpression {
  require(tables >= 1, "need at least one table")
  require(bitsPerTable >= 1 && bitsPerTable <= 30, "bucket must fit an int")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // Benign race: concurrent tasks may build the same deterministic array;
  // the reference is published only after the build completes.
  @transient private var cachedPlanes: Array[Double] = _

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val fl = elemIsFloat
    var planes = cachedPlanes
    if (planes == null || planes.length != tables * bitsPerTable * n) {
      planes = RpBuckets.buildPlanes(tables, bitsPerTable, seed, n)
      cachedPlanes = planes
    }
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < bitsPerTable) {
        val base = (t * bitsPerTable + b) * n
        var dot = 0.0
        var j = 0
        while (j < n) {
          dot += (if (fl) v.getFloat(j).toDouble else v.getDouble(j)) * planes(base + j)
          j += 1
        }
        if (dot >= 0) bucket |= (1 << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val planes = ctx.addMutableState("double[]", "rpPlanes")
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val n = ctx.freshName("n"); val out = ctx.freshName("out")
        val t = ctx.freshName("t"); val b = ctx.freshName("b"); val j = ctx.freshName("j")
        val bucket = ctx.freshName("bucket"); val base = ctx.freshName("base")
        val dot = ctx.freshName("dot")
        s"""
           |int $n = $a.numElements();
           |if ($planes == null || $planes.length != ${tables * bitsPerTable} * $n) {
           |  $planes = graft.functions.RpBuckets.buildPlanes(
           |    $tables, $bitsPerTable, $seed, $n);
           |}
           |int[] $out = new int[$tables];
           |for (int $t = 0; $t < $tables; $t++) {
           |  int $bucket = 0;
           |  for (int $b = 0; $b < $bitsPerTable; $b++) {
           |    int $base = ($t * $bitsPerTable + $b) * $n;
           |    double $dot = 0.0;
           |    for (int $j = 0; $j < $n; $j++) {
           |      $dot += ((double) $a.$get($j)) * $planes[$base + $j];
           |    }
           |    if ($dot >= 0) $bucket |= (1 << $b);
           |  }
           |  $out[$t] = $bucket;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |""".stripMargin
      }
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RpBuckets {
  /** The deterministic plane matrix for (tables, bits, seed, dim), flattened
    * as [(t*bits + b)*dim + j]. Same XXH64 derivation as the original
    * per-row formula, so bucket assignments (and the x10/x11 golden pins)
    * are unchanged. Size: tables*bits*dim doubles (x10 config: 16·4·256 =
    * 128 KiB) — built once per task, invoked from generated Java via the
    * companion's static forwarder.
    */
  def buildPlanes(tables: Int, bitsPerTable: Int, seed: Int, dim: Int): Array[Double] = {
    val out = new Array[Double](tables * bitsPerTable * dim)
    var t = 0
    while (t < tables) {
      var b = 0
      while (b < bitsPerTable) {
        val planeSeed = XXH64.hashInt(t * 1024 + b, seed.toLong)
        val base = (t * bitsPerTable + b) * dim
        var j = 0
        while (j < dim) {
          val h = XXH64.hashLong(j.toLong, planeSeed)
          out(base + j) = (java.lang.Math.floorMod(h, 2001L) - 1000L) / 1000.0
          j += 1
        }
        b += 1
      }
      t += 1
    }
    out
  }
}

/** Sign-LSH buckets in EXACT INTEGER arithmetic — [[RpBuckets]]' shape
  * (one expression emits all `tables` buckets; plane matrix cached per
  * task; codegen'd inner loop) with every quantity a BIGINT so the bucket
  * assignment is replayable bit-for-bit by any engine, including a SQL
  * oracle (the x40 SQ8 lesson: integer dot products have no FP-order
  * caveats):
  *
  *   - vector components quantize ONCE per row to q_j =
  *     floor(v_j · 1000) — float→double widening is exact and floor of
  *     one IEEE multiply is correctly rounded, so q_j is identical in
  *     every engine evaluating the same formula;
  *   - plane component c_{t,b,j} = hash40("rp:t:b:j") mod 2001 − 1000 ∈
  *     [−1000, 1000] — the engine-wide md5-prefix integer
  *     ([[graft.operators.DistinctSketch.hash40Scala]]), the SAME
  *     derivation every sketch oracle already replays in DuckDB;
  *   - bit b of table t = [Σ_j q_j·c_{t,b,j} ≥ 0], bucket = Σ_b bit·2^b.
  *
  * Longs cannot overflow: |q| ≤ ~2¹¹ for unit-scale embeddings (even
  * |v| ≤ 10⁶ keeps |q·c| ≤ 2⁴⁰ and dim ≤ 2¹² sums below 2⁵³).
  * [[RpBuckets]] stays the throughput variant (double planes, one hash
  * per component at build); this is the ORACLE-GRADE variant that turns
  * the LSH candidate path itself into a hash-checkable surface (x91).
  */
case class IntLshBuckets(child: Expression, tables: Int, bitsPerTable: Int)
    extends UnaryExpression {
  require(tables >= 1, "need at least one table")
  require(bitsPerTable >= 1 && bitsPerTable <= 30, "bucket must fit an int")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // Benign race: concurrent tasks may build the same deterministic array.
  @transient private var cachedPlanes: Array[Long] = _

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val fl = elemIsFloat
    var planes = cachedPlanes
    if (planes == null || planes.length != tables * bitsPerTable * n) {
      planes = IntLshBuckets.buildPlanes(tables, bitsPerTable, n)
      cachedPlanes = planes
    }
    val q = new Array[Long](n)
    var j = 0
    while (j < n) {
      q(j) = math.floor((if (fl) v.getFloat(j).toDouble else v.getDouble(j)) * 1000.0).toLong
      j += 1
    }
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < bitsPerTable) {
        val base = (t * bitsPerTable + b) * n
        var dot = 0L
        var k = 0
        while (k < n) { dot += q(k) * planes(base + k); k += 1 }
        if (dot >= 0L) bucket |= (1 << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val planes = ctx.addMutableState("long[]", "intLshPlanes")
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val n = ctx.freshName("n"); val out = ctx.freshName("out")
        val q = ctx.freshName("q")
        val t = ctx.freshName("t"); val b = ctx.freshName("b"); val j = ctx.freshName("j")
        val bucket = ctx.freshName("bucket"); val base = ctx.freshName("base")
        val dot = ctx.freshName("dot")
        s"""
           |int $n = $a.numElements();
           |if ($planes == null || $planes.length != ${tables * bitsPerTable} * $n) {
           |  $planes = graft.functions.IntLshBuckets.buildPlanes(
           |    $tables, $bitsPerTable, $n);
           |}
           |long[] $q = new long[$n];
           |for (int $j = 0; $j < $n; $j++) {
           |  $q[$j] = (long) java.lang.Math.floor(((double) $a.$get($j)) * 1000.0);
           |}
           |int[] $out = new int[$tables];
           |for (int $t = 0; $t < $tables; $t++) {
           |  int $bucket = 0;
           |  for (int $b = 0; $b < $bitsPerTable; $b++) {
           |    int $base = ($t * $bitsPerTable + $b) * $n;
           |    long $dot = 0L;
           |    for (int $j = 0; $j < $n; $j++) {
           |      $dot += $q[$j] * $planes[$base + $j];
           |    }
           |    if ($dot >= 0L) $bucket |= (1 << $b);
           |  }
           |  $out[$t] = $bucket;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |""".stripMargin
      }
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IntLshBuckets {
  /** The integer plane matrix for (tables, bits, dim), flattened as
    * [(t·bits + b)·dim + j]: hash40("rp:t:b:j") mod 2001 − 1000. Size
    * tables·bits·dim longs, built once per task; static forwarder for
    * generated Java.
    */
  def buildPlanes(tables: Int, bitsPerTable: Int, dim: Int): Array[Long] = {
    val out = new Array[Long](tables * bitsPerTable * dim)
    var t = 0
    while (t < tables) {
      var b = 0
      while (b < bitsPerTable) {
        val base = (t * bitsPerTable + b) * dim
        var j = 0
        while (j < dim) {
          out(base + j) =
            graft.operators.DistinctSketch.hash40Scala(s"rp:$t:$b:$j") % 2001L - 1000L
          j += 1
        }
        b += 1
      }
      t += 1
    }
    out
  }
}

/** Integer product-quantization CODES (the FAISS PQ encode step in
  * ORACLE-GRADE arithmetic, the IntLshBuckets posture): the vector is
  * split into `m` contiguous subspaces of dim/m components each; within
  * subspace s, the assigned code is the argmin over `ksub` codebook
  * entries of the exact integer squared L2 distance between the
  * floor-1000-quantized sub-vector and the RANGE-CALIBRATED
  * hash40-derived codebook entry
  * `mn_j + hash40("pq:s:k:j") mod (mx_j − mn_j + 1)` — (mn, mx) are the
  * per-dimension integer bounds of the quantized CORPUS (one
  * VectorMinMax pass, the SQ8 calibration discipline: an uncalibrated
  * [−1000, 1000] codebook sits outside unit-scale embedding range and
  * measured recall collapses to 0.02; calibrated random codebooks at
  * m=32, ksub=64 measure 0.64 recall@5 on the test embeddings). Every
  * quantity is closed-form from (mns, mxs, m, ksub), so any SQL engine
  * replays every code. Ties break to the SMALLEST code. Output
  * array<int> of length m — at m=32 a 64-dim float vector compresses to
  * 32 codes (24 B at 6 bits packed vs 256 B of floats).
  *
  * Random-in-range codebooks are NOT data-adapted — that is the price
  * of the oracle; the production variant trains per-subspace Lloyd
  * codebooks with the ivfCentroids machinery and swaps them into the
  * same assignment formula. Longs cannot overflow: |q−c| ≤ range width,
  * squared ≤ ~10¹² per component at |v| ≤ 10³, ≤ dim·10¹² ≪ 2⁶³.
  */
case class IntPqCodes(
    child: Expression,
    m: Int,
    ksub: Int,
    mns: Seq[Long],
    mxs: Seq[Long]
) extends UnaryExpression {
  require(m >= 1 && ksub >= 1, "m and ksub must be positive")
  require(mns.length == mxs.length, "calibration arrays must align")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val book: Array[Long] =
    IntPqCodes.buildCodebooks(m, ksub, mns.length, mns.toArray, mxs.toArray)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val fl = elemIsFloat
    require(n == mns.length, s"vector dim $n != calibration dim ${mns.length}")
    val sub = n / m
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var bestK = 0
      var bestD = Long.MaxValue
      var k = 0
      while (k < ksub) {
        val base = (s * ksub + k) * sub
        var d = 0L
        var j = 0
        while (j < sub) {
          val q = math
            .floor((if (fl) v.getFloat(s * sub + j).toDouble
                    else v.getDouble(s * sub + j)) * 1000.0)
            .toLong
          val diff = q - book(base + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; bestK = k }
        k += 1
      }
      out(s) = bestK
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val bookRef = ctx.addReferenceObj("intPqBook", book, "long[]")
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val n = ctx.freshName("n"); val sub = ctx.freshName("sub")
        val out = ctx.freshName("out"); val s = ctx.freshName("s")
        val k = ctx.freshName("k"); val j = ctx.freshName("j")
        val bestK = ctx.freshName("bestK"); val bestD = ctx.freshName("bestD")
        val d = ctx.freshName("d"); val q = ctx.freshName("q")
        val diff = ctx.freshName("diff"); val base = ctx.freshName("base")
        val book = ctx.freshName("book")
        s"""
           |int $n = $a.numElements();
           |int $sub = $n / $m;
           |long[] $book = $bookRef;
           |int[] $out = new int[$m];
           |for (int $s = 0; $s < $m; $s++) {
           |  int $bestK = 0;
           |  long $bestD = Long.MAX_VALUE;
           |  for (int $k = 0; $k < $ksub; $k++) {
           |    int $base = ($s * $ksub + $k) * $sub;
           |    long $d = 0L;
           |    for (int $j = 0; $j < $sub; $j++) {
           |      long $q = (long) java.lang.Math.floor(
           |        ((double) $a.$get($s * $sub + $j)) * 1000.0);
           |      long $diff = $q - $book[$base + $j];
           |      $d += $diff * $diff;
           |    }
           |    if ($d < $bestD) { $bestD = $d; $bestK = $k; }
           |  }
           |  $out[$s] = $bestK;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |""".stripMargin
      }
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IntPqCodes {
  /** The range-calibrated integer codebook matrix for (m, ksub, dim),
    * flattened as [(s·ksub + k)·sub + j]:
    * `mn_g + hash40("pq:s:k:j") mod (mx_g − mn_g + 1)` with g = s·sub + j
    * the GLOBAL dimension index, sub = dim/m. A degenerate dimension
    * (mx == mn) pins every entry to mn. Built once per expression
    * instance; static forwarder shared by eval and generated Java.
    */
  def buildCodebooks(
      m: Int,
      ksub: Int,
      dim: Int,
      mns: Array[Long],
      mxs: Array[Long]
  ): Array[Long] = {
    val sub = dim / m
    val out = new Array[Long](m * ksub * sub)
    var s = 0
    while (s < m) {
      var k = 0
      while (k < ksub) {
        val base = (s * ksub + k) * sub
        var j = 0
        while (j < sub) {
          val g = s * sub + j
          val w = mxs(g) - mns(g) + 1L
          out(base + j) =
            mns(g) + graft.operators.DistinctSketch.hash40Scala(s"pq:$s:$k:$j") % w
          j += 1
        }
        k += 1
      }
      s += 1
    }
    out
  }
}

/** ADC (asymmetric distance computation) against [[IntPqCodes]] codes:
  * exact integer squared L2 distance between the floor-1000-quantized
  * QUERY vector and the codebook RECONSTRUCTION of a coded corpus
  * vector — Σ_s Σ_j (q_{s,j} − C[s, code_s, j])². The query stays
  * full-precision (asymmetric — the FAISS ADC semantics); the corpus
  * side is only its m code ints. Cost per pair is dim multiplies —
  * the same as a dot product — but the corpus footprint is the codes,
  * not the floats: the 100 TB point. NULL if either input is NULL or
  * the code array's length ≠ m.
  */
case class IntPqDist(
    left: Expression,
    right: Expression,
    m: Int,
    ksub: Int,
    mns: Seq[Long],
    mxs: Seq[Long]
) extends BinaryExpression {
  require(m >= 1 && ksub >= 1, "m and ksub must be positive")
  require(mns.length == mxs.length, "calibration arrays must align")

  override def dataType: DataType = LongType

  private def elemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val book: Array[Long] =
    IntPqCodes.buildCodebooks(m, ksub, mns.length, mns.toArray, mxs.toArray)

  override def nullable: Boolean = true

  override protected def nullSafeEval(q: Any, c: Any): Any = {
    val v = q.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    if (codes.numElements() != m) return null
    val n = v.numElements()
    val fl = elemIsFloat
    require(n == mns.length, s"vector dim $n != calibration dim ${mns.length}")
    val sub = n / m
    var total = 0L
    var s = 0
    while (s < m) {
      val base = (s * ksub + codes.getInt(s)) * sub
      var j = 0
      while (j < sub) {
        val qq = math
          .floor((if (fl) v.getFloat(s * sub + j).toDouble
                  else v.getDouble(s * sub + j)) * 1000.0)
          .toLong
        val diff = qq - book(base + j)
        total += diff * diff
        j += 1
      }
      s += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val bookRef = ctx.addReferenceObj("intPqDistBook", book, "long[]")
    nullSafeCodeGen(
      ctx,
      ev,
      (a, c) => {
        val n = ctx.freshName("n"); val sub = ctx.freshName("sub")
        val s = ctx.freshName("s"); val j = ctx.freshName("j")
        val total = ctx.freshName("total"); val base = ctx.freshName("base")
        val qq = ctx.freshName("qq"); val diff = ctx.freshName("diff")
        val book = ctx.freshName("book")
        s"""
           |if ($c.numElements() != $m) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $n = $a.numElements();
           |  int $sub = $n / $m;
           |  long[] $book = $bookRef;
           |  long $total = 0L;
           |  for (int $s = 0; $s < $m; $s++) {
           |    int $base = ($s * $ksub + $c.getInt($s)) * $sub;
           |    for (int $j = 0; $j < $sub; $j++) {
           |      long $qq = (long) java.lang.Math.floor(
           |        ((double) $a.$get($s * $sub + $j)) * 1000.0);
           |      long $diff = $qq - $book[$base + $j];
           |      $total += $diff * $diff;
           |    }
           |  }
           |  ${ev.value} = $total;
           |}
           |""".stripMargin
      }
    )
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Dot product, same design as [[CosineSimilarity]]. Useful when vectors are
  * pre-normalized (then dot == cosine and we skip the sqrt per pair).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val fl = elemIsFloat(left); val fr = elemIsFloat(right)
    var dot = 0.0; var i = 0
    while (i < n) {
      val xi = if (fl) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (fr) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val getR = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += ((double) $a.$getL($i)) * ((double) $b.$getR($i));
           |}
           |${ev.value} = $dot;
           |""".stripMargin
      }
    )
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** The `take` nearest centroids (by cosine) of an embedding vector, as
  * `array<int>` of 0-based centroid indices, similarity-descending with
  * index-ascending tie-break. One expression serves both IVF roles:
  * `take = 1` is the index-build assignment (which inverted list a corpus
  * vector belongs to), `take = nprobe` is the query-side probe list.
  *
  * The centroid matrix is part of the expression (a driver-computed,
  * bounded k×dim table — the coarse quantizer, NOT data-scale state); it
  * ships to executors once per task via closure serialization, exactly like
  * a broadcast small-dim table.
  *
  * Deliberately [[CodegenFallback]]: the per-row cost is the k×dim
  * multiply-accumulate INSIDE `nullSafeEval` — compiled Scala that the JIT
  * compiles once per JVM, not once per query plan. A `doGenCode` version
  * would re-emit (and re-JIT, or worse, interpret while the compile queue
  * is backlogged — §8.4) the same loop for every plan that uses it; the
  * fallback's per-row boxing shell is noise next to the loop. Same
  * rationale as the MinHash/SimHash sketches.
  */
case class NearestCentroids(
    child: Expression,
    centroids: Seq[Seq[Double]],
    take: Int
) extends UnaryExpression
    with codegen.CodegenFallback {
  require(centroids.nonEmpty, "need at least one centroid")
  require(take >= 1 && take <= centroids.size, "take must be in [1, k]")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // Flat row-major matrix + per-centroid inverse norms, materialized once
  // per deserialized instance (i.e. once per task).
  @transient private lazy val dim: Int = centroids.head.size
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](centroids.size * dim)
    var c = 0
    while (c < centroids.size) {
      val row = centroids(c)
      var j = 0
      while (j < dim) { out(c * dim + j) = row(j); j += 1 }
      c += 1
    }
    out
  }
  @transient private lazy val invNorm: Array[Double] = {
    val out = new Array[Double](centroids.size)
    var c = 0
    while (c < centroids.size) {
      var s = 0.0
      var j = 0
      while (j < dim) { val x = flat(c * dim + j); s += x * x; j += 1 }
      out(c) = if (s == 0.0) 0.0 else 1.0 / math.sqrt(s)
      c += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val fl = elemIsFloat
    val k = centroids.size
    // vector norm once
    var vn = 0.0
    var j = 0
    while (j < n) {
      val x = if (fl) v.getFloat(j).toDouble else v.getDouble(j)
      vn += x * x
      j += 1
    }
    val vInv = if (vn == 0.0) 0.0 else 1.0 / math.sqrt(vn)
    // top-`take` by (sim desc, index asc): insertion into small arrays
    val bestSim = Array.fill(take)(Double.NegativeInfinity)
    val bestIdx = Array.fill(take)(-1)
    var c = 0
    while (c < k) {
      var dot = 0.0
      j = 0
      while (j < n) {
        val x = if (fl) v.getFloat(j).toDouble else v.getDouble(j)
        dot += x * flat(c * dim + j)
        j += 1
      }
      val sim = dot * vInv * invNorm(c)
      // strictly-greater keeps the earliest index on ties
      var p = take
      while (p > 0 && sim > bestSim(p - 1)) p -= 1
      if (p < take) {
        var q = take - 1
        while (q > p) { bestSim(q) = bestSim(q - 1); bestIdx(q) = bestIdx(q - 1); q -= 1 }
        bestSim(p) = sim
        bestIdx(p) = c
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bestIdx)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Trained-codebook PQ code assignment — the production (Lloyd-trained)
  * twin of [[IntPqCodes]]: same per-subspace argmin with
  * smallest-code ties, exact double L2 against a caller-supplied
  * flattened codebook [(s·ksub + k)·sub + j] (from
  * [[graft.operators.Similarity.pqTrain]]). Codegen'd; the codebook
  * rides as a reference object, no per-row allocation.
  */
case class PqAssign(child: Expression, books: Seq[Double], m: Int, ksub: Int)
    extends UnaryExpression {
  require(m >= 1 && ksub >= 1 && books.length % (m * ksub) == 0,
    "books must hold m*ksub entries of dim/m components")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val bookArr: Array[Double] = books.toArray
  private val sub: Int = books.length / (m * ksub)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = elemIsFloat
    val out = new Array[Int](m)
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
      out(s) = bestK
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val bookRef = ctx.addReferenceObj("pqAssignBook", bookArr, "double[]")
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val out = ctx.freshName("out"); val s = ctx.freshName("s")
        val k = ctx.freshName("k"); val j = ctx.freshName("j")
        val bestK = ctx.freshName("bestK"); val bestD = ctx.freshName("bestD")
        val d = ctx.freshName("d"); val x = ctx.freshName("x")
        val diff = ctx.freshName("diff"); val base = ctx.freshName("base")
        val book = ctx.freshName("book")
        s"""
           |double[] $book = $bookRef;
           |int[] $out = new int[$m];
           |for (int $s = 0; $s < $m; $s++) {
           |  int $bestK = 0;
           |  double $bestD = Double.MAX_VALUE;
           |  for (int $k = 0; $k < $ksub; $k++) {
           |    int $base = ($s * $ksub + $k) * $sub;
           |    double $d = 0.0;
           |    for (int $j = 0; $j < $sub; $j++) {
           |      double $x = (double) $a.$get($s * $sub + $j);
           |      double $diff = $x - $book[$base + $j];
           |      $d += $diff * $diff;
           |    }
           |    if ($d < $bestD) { $bestD = $d; $bestK = $k; }
           |  }
           |  $out[$s] = $bestK;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |""".stripMargin
      }
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Trained-codebook ADC distance — the production twin of
  * [[IntPqDist]]: exact double squared L2 between the full-precision
  * query and the trained codebook's reconstruction of a coded corpus
  * vector. NULL if the code array's length ≠ m.
  */
case class PqAdc(left: Expression, right: Expression, books: Seq[Double], m: Int, ksub: Int)
    extends BinaryExpression {
  require(m >= 1 && ksub >= 1 && books.length % (m * ksub) == 0,
    "books must hold m*ksub entries of dim/m components")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val bookArr: Array[Double] = books.toArray
  private val sub: Int = books.length / (m * ksub)

  override protected def nullSafeEval(q: Any, c: Any): Any = {
    val v = q.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    if (codes.numElements() != m) return null
    val fl = elemIsFloat
    var total = 0.0
    var s = 0
    while (s < m) {
      val base = (s * ksub + codes.getInt(s)) * sub
      var j = 0
      while (j < sub) {
        val x = if (fl) v.getFloat(s * sub + j).toDouble else v.getDouble(s * sub + j)
        val diff = x - bookArr(base + j)
        total += diff * diff
        j += 1
      }
      s += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val bookRef = ctx.addReferenceObj("pqAdcBook", bookArr, "double[]")
    nullSafeCodeGen(
      ctx,
      ev,
      (a, c) => {
        val s = ctx.freshName("s"); val j = ctx.freshName("j")
        val total = ctx.freshName("total"); val base = ctx.freshName("base")
        val x = ctx.freshName("x"); val diff = ctx.freshName("diff")
        val book = ctx.freshName("book")
        s"""
           |if ($c.numElements() != $m) {
           |  ${ev.isNull} = true;
           |} else {
           |  double[] $book = $bookRef;
           |  double $total = 0.0;
           |  for (int $s = 0; $s < $m; $s++) {
           |    int $base = ($s * $ksub + $c.getInt($s)) * $sub;
           |    for (int $j = 0; $j < $sub; $j++) {
           |      double $x = (double) $a.$get($s * $sub + $j);
           |      double $diff = $x - $book[$base + $j];
           |      $total += $diff * $diff;
           |    }
           |  }
           |  ${ev.value} = $total;
           |}
           |""".stripMargin
      }
    )
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
