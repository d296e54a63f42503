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

/** MD5-derived SimHash, emitted as its four 16-bit bands
  * (array<int> of length 4, each in [0, 65535]).
  *
  * The production signature ([[SimHash64]]) hashes tokens with xxhash64,
  * which no SQL oracle engine exposes — so its correctness was only
  * spec-visible. This variant derives the per-token bits from `md5(token)`
  * (available verbatim in DuckDB), making the whole signature — and any
  * banding built on it — reproducible cross-engine and therefore
  * driver-oracle-checkable. Semantics mirror [[SimHash64]] exactly: every
  * token OCCURRENCE votes ±1 per bit (no dedup), sign>0 → bit 1.
  *
  * Bit convention (identical SQL formulation): bit b (0..63) is bit
  * `7-(b%8)` of md5 byte `b/8` — i.e. MSB-first over the first 16 hex
  * chars, so bit b of the hex rendering is
  * `(nibble(hexchar[b/4]) >> (3 - b%4)) & 1`. Band j (0..3) packs bits
  * 16j..16j+15 MSB-first into an int.
  *
  * Map-side, no shuffle — same 100 TB posture as the other sketches.
  */
case class SimHashMd5Bands(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val md = SimHashMd5Bands.digest.get()
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        md.reset()
        val h = md.digest(s.getBytes)
        var b = 0
        while (b < 64) {
          if (((h(b >> 3) >> (7 - (b & 7))) & 1) == 1) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    val bands = new Array[Int](4)
    var j = 0
    while (j < 4) {
      var v = 0
      var t = 0
      while (t < 16) {
        if (counts(16 * j + t) > 0) v |= 1 << (15 - t)
        t += 1
      }
      bands(j) = v
      j += 1
    }
    new GenericArrayData(bands)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHashMd5Bands {
  /** MessageDigest is stateful and not thread-safe; expression instances
    * can be shared across tasks in local mode, so keep one per thread.
    */
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
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
