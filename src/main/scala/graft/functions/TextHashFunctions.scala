package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketch primitives for document dedup at scale (BASELINE.json north star;
  * SURVEY.md §4.4). Both are MAP-SIDE expressions over a token/shingle array:
  * the signature is computed where the document lives, with no explode, no
  * shuffle — the only shuffle in MinHash-LSH dedup is the (band, bucket)
  * group-join on 128-byte signatures, not on document text. That is the
  * property that survives 100 TB.
  *
  * Hashing is xxhash64 (Spark's own XXH64, also used by the built-in
  * `xxhash64`), seeded per hash function — public, deterministic,
  * cross-run stable.
  */
object Xxh64 {
  def hash(s: UTF8String, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
}

/** MinHash signature of a set of shingles: for j in 0..k-1,
  * sig[j] = min over shingles of xxh64(shingle, seed=j). Returns
  * array<long> of length k; NULL input → NULL; empty input → Long.MaxValue
  * rows (documents with no shingles never collide with real ones).
  *
  * Eval-only (CodegenFallback): the per-row cost is the k·|shingles| hash
  * loop itself, which is already tight JVM code; codegen would only inline
  * the loop shell.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(numHashes > 0 && numHashes <= 1024, "numHashes must be in (0, 1024]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        var j = 0
        while (j < numHashes) {
          val h = Xxh64.hash(s, j.toLong)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** LSH band hashes computed directly from shingles: the k = bands·rows
  * MinHash signature is built ONCE inside the expression, then each band of
  * `rows` consecutive signature values is folded to a single 64-bit hash.
  * Returns array<long> of length `bands`.
  *
  * Exists because referencing a separate signature column from per-band
  * expressions invites Catalyst's CollapseProject to inline the signature
  * computation into EVERY band reference — observed as a 30× slowdown
  * (the full 128-hash signature recomputed 32× per document). A single
  * expression evaluated once per row cannot be duplicated that way.
  */
case class MinHashBands(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(bands > 0 && rowsPerBand > 0 && bands * rowsPerBand <= 1024)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = bands * rowsPerBand
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        var j = 0
        while (j < k) {
          val h = Xxh64.hash(s, j.toLong)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0L
      var r = 0
      while (r < rowsPerBand) {
        // fold the band's signature values: xxh64 of each long, chained seed
        h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(sig(b * rowsPerBand + r), h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over a token array: each token contributes ±1 to each of
  * 64 bit-counters according to its xxh64 bits; the sign of each counter is
  * the output bit. Near-duplicate docs → small Hamming distance (compute
  * with built-in `bit_count(a ^ b)` — no custom expression needed there).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = Xxh64.hash(s, 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
