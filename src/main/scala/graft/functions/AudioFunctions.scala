package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Deterministic RIFF/WAVE synthesizer — the audio twin of
  * [[BuildBmp]]: a genuinely valid 16-bit PCM mono WAV file (RIFF header,
  * canonical 16-byte fmt chunk, data chunk) whose sample i is the closed
  * form floorMod(id·7919 + i·2657, 4001) − 2000, i.e. a bounded
  * pseudo-noise signal in [−2000, 2000] with frequent sign changes. Any
  * conformant WAV reader recovers exactly these samples, and an oracle
  * engine recomputes every downstream statistic from (id, i) alone — two
  * independent derivations of one answer, the x29 contract applied to
  * audio.
  */
case class BuildWav(idExpr: Expression, rateExpr: Expression, nExpr: Expression)
    extends TernaryExpression
    with CodegenFallback {

  override def first: Expression = idExpr
  override def second: Expression = rateExpr
  override def third: Expression = nExpr
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(idAny: Any, rateAny: Any, nAny: Any): Any =
    WavBytes(
      idAny.asInstanceOf[Long],
      rateAny.asInstanceOf[Int],
      nAny.asInstanceOf[Int],
      quiet = false)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(idExpr = f, rateExpr = s, nExpr = t)
}

/** The shared RIFF/WAVE synthesis core — the audio sibling of
  * [[BmpBytes]]/[[GifBytes]]: one place owns the byte layout so
  * [[BuildWav]] (the standalone x33 surface) and the multimodal
  * container ([[MediaWarcFunctions]]) cannot drift. `quiet = false`
  * yields BuildWav's historical bytes verbatim (sample i =
  * floorMod(id·7919 + i·2657, 4001) − 2000, pseudo-noise in
  * [−2000, 2000]); `quiet = true` is the SILENCE PLANT — the same
  * congruence taken mod 251 (range [−125, 125], rms ≈ 72), far below
  * any sane energy screen while every header field stays identical, so
  * only a decoder that actually folds the samples can tell the two
  * apart. Both branches are division-free closed forms a SQL oracle
  * replays exactly.
  */
object WavBytes {

  def apply(id: Long, rate: Int, n: Int, quiet: Boolean): Array[Byte] = {
    require(rate > 0 && rate <= 384000, s"bad sample rate $rate")
    require(n > 0 && n <= (1 << 20), s"bad sample count $n")
    val dataSize = n * 2
    val b = new Array[Byte](44 + dataSize)
    def putAscii(o: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { b(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def putLe16(o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def putLe32(o: Int, v: Int): Unit = {
      putLe16(o, v & 0xffff); putLe16(o + 2, (v >>> 16) & 0xffff)
    }
    putAscii(0, "RIFF")
    putLe32(4, 36 + dataSize)
    putAscii(8, "WAVE")
    putAscii(12, "fmt ")
    putLe32(16, 16) // canonical PCM fmt chunk size
    putLe16(20, 1) // audio format: PCM
    putLe16(22, 1) // mono
    putLe32(24, rate)
    putLe32(28, rate * 2) // byte rate
    putLe16(32, 2) // block align
    putLe16(34, 16) // bits per sample
    putAscii(36, "data")
    putLe32(40, dataSize)
    val m = if (quiet) 251L else 4001L
    val half = if (quiet) 125L else 2000L
    var i = 0
    while (i < n) {
      val s = (java.lang.Math.floorMod(id * 7919 + i * 2657L, m) - half).toInt
      putLe16(44 + 2 * i, s & 0xffff)
      i += 1
    }
    b
  }
}

/** REAL PCM sample decode + feature extraction for WAV payloads — the
  * audio "feature-extract" verb with genuine sample-level arithmetic (the
  * header walk alone was already real in [[DecodeMediaMeta]]): walks the
  * RIFF chunks to the fmt and data chunks, then folds every signed 16-bit
  * little-endian sample into raw INTEGER statistics in one pass:
  *
  *   - n_samples, sample_rate — stream shape;
  *   - sum_sq (Σ s²), sum_abs (Σ |s|) — the exact integer numerators of
  *     RMS/mean-amplitude, left raw so any engine recomputing from the
  *     same samples agrees bit-for-bit (derived doubles stay in Column
  *     space, the [[RepetitionCounts]] discipline);
  *   - peak (max |s|), zero_cross (count of i≥1 with sign(sᵢ₋₁)≠sign(sᵢ),
  *     negatives vs non-negatives) — the standard silence/energy/pitch
  *     proxies of audio corpus filtering;
  *   - duration_ms (n·1000/rate, floor) — integer so it oracles exactly.
  *
  * Scope: uncompressed PCM (format tag 1), 16-bit, mono — NULL for
  * anything else (compressed codecs stay behind the disclosed stub), for
  * corrupt/truncated chunks, and for empty data. Never throws: a 100 TB
  * audio scan WILL contain corrupt files. Map-only, one bounded pass.
  *
  * sum_sq fits a long for any physically possible WAV: |s| ≤ 32768 so
  * Σ s² ≤ n·2³⁰, safe through n = 2⁵³ samples.
  */
case class AudioPcmFeatures(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = StructType(
    Seq(
      StructField("n_samples", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("sum_sq", LongType),
      StructField("sum_abs", LongType),
      StructField("peak", IntegerType),
      StructField("zero_cross", IntegerType),
      StructField("duration_ms", LongType)
    )
  )
  override def nullable: Boolean = true

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def ascii(b: Array[Byte], o: Int, s: String): Boolean =
    b.length >= o + s.length && s.indices.forall(i => b(o + i) == s.charAt(i).toByte)

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try {
      if (!(ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE"))) return null
      var off = 12
      var fmtTag, channels, bits, rate = -1
      var dataOff = -1
      var dataSize = -1L
      while (off + 8 <= b.length) {
        val size = le32(b, off + 4).toLong & 0xffffffffL
        if (size > Int.MaxValue - 16) return null // corrupt size field
        if (ascii(b, off, "fmt ") && off + 24 <= b.length) {
          fmtTag = le16(b, off + 8)
          channels = le16(b, off + 10)
          rate = le32(b, off + 12)
          bits = le16(b, off + 22)
        } else if (ascii(b, off, "data")) {
          dataOff = off + 8
          dataSize = size
        }
        off += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
      if (fmtTag != 1 || channels != 1 || bits != 16 || rate <= 0) return null
      if (dataOff < 0 || dataSize < 2 || dataOff + dataSize > b.length) return null
      val n = (dataSize / 2).toInt
      var sumSq = 0L
      var sumAbs = 0L
      var peak = 0
      var zc = 0
      var prevNeg = false
      var i = 0
      while (i < n) {
        val s = le16(b, dataOff + 2 * i).toShort.toInt
        val a = math.abs(s)
        sumSq += s.toLong * s
        sumAbs += a
        if (a > peak) peak = a
        val neg = s < 0
        if (i > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
        i += 1
      }
      InternalRow(n, rate, sumSq, sumAbs, peak, zc, n.toLong * 1000L / rate)
    } catch {
      case _: ArrayIndexOutOfBoundsException | _: ArithmeticException |
          _: NegativeArraySizeException => null
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
