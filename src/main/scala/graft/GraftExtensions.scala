package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Session-extension entry point: registers graft's custom expressions into
  * any session at build time, so pure-SQL users (thriftserver, spark-sql,
  * notebooks) get the functions without touching the Scala API:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  *
  * The same registrations are available per-session via
  * [[graft.functions.GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("cosine_sim"),
        info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float/double arrays"),
        (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    ext.injectFunction(
      (FunctionIdentifier("dot_product"),
        info("dot_product", "dot_product(a, b) - dot product of two float/double arrays"),
        (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    ext.injectFunction(
      (FunctionIdentifier("minhash_sig"),
        info("minhash_sig", "minhash_sig(shingles, k) - k-hash MinHash signature"),
        (es: Seq[Expression]) =>
          MinHashSignature(es(0), es(1).eval(null).asInstanceOf[Int])))
    ext.injectFunction(
      (FunctionIdentifier("simhash64"),
        info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array"),
        (es: Seq[Expression]) => SimHash64(es(0))))
    ext.injectFunction(
      (FunctionIdentifier("minhash_bands"),
        info("minhash_bands", "minhash_bands(shingles, bands, rows) - LSH band hashes"),
        (es: Seq[Expression]) =>
          MinHashBands(
            es(0),
            es(1).eval(null).asInstanceOf[Int],
            es(2).eval(null).asInstanceOf[Int])))
    ext.injectFunction(
      (FunctionIdentifier("byte_histogram"),
        info("byte_histogram", "byte_histogram(bin) - L1-normalized 256-bin byte histogram"),
        (es: Seq[Expression]) => ByteHistogram(es(0))))
    ext.injectFunction(
      (FunctionIdentifier("topk_by_score"),
        info("topk_by_score", "topk_by_score(score, id, k) - exact per-group top-k"),
        (es: Seq[Expression]) =>
          TopKByScore(es(0), es(1), es(2).eval(null).asInstanceOf[Int])
            .toAggregateExpression()))
    ext.injectFunction(
      (FunctionIdentifier("nfc_normalize"),
        info("nfc_normalize", "nfc_normalize(str) - Unicode NFC canonical composition"),
        (es: Seq[Expression]) => NfcNormalize(es(0))))
    ext.injectFunction(
      (FunctionIdentifier("vector_avg"),
        info("vector_avg", "vector_avg(vec) - elementwise mean of float/double arrays (aggregate)"),
        (es: Seq[Expression]) => VectorAvg(es(0)).toAggregateExpression()))
    ext.injectFunction(
      (FunctionIdentifier("misra_gries_tokens"),
        info("misra_gries_tokens",
          "misra_gries_tokens(tokens, k) - per-partition Misra-Gries heavy-hitter candidates (aggregate)"),
        (es: Seq[Expression]) =>
          MisraGriesTokens(es(0), es(1).eval(null).asInstanceOf[Int])
            .toAggregateExpression()))
    ext.injectFunction(
      (FunctionIdentifier("kmv_mins"),
        info("kmv_mins",
          "kmv_mins(hash, k) - KMV distinct sketch: k smallest distinct hashes, ascending (aggregate)"),
        (es: Seq[Expression]) =>
          KmvMins(es(0), es(1).eval(null).asInstanceOf[Int])
            .toAggregateExpression()))
    ext.injectFunction(
      (FunctionIdentifier("count_min_tokens"),
        info("count_min_tokens",
          "count_min_tokens(tokens, depth, width) - count-min sketch counter matrix, row-major (aggregate)"),
        (es: Seq[Expression]) =>
          CountMinTokens(
            es(0),
            es(1).eval(null).asInstanceOf[Int],
            es(2).eval(null).asInstanceOf[Int]).toAggregateExpression()))
    ext.injectFunction(
      (FunctionIdentifier("simhash_md5_bands"),
        info("simhash_md5_bands", "simhash_md5_bands(tokens) - md5-derived SimHash as 4x16-bit bands"),
        (es: Seq[Expression]) => SimHashMd5Bands(es(0))))
    ext.injectFunction(
      (FunctionIdentifier("decode_media_meta"),
        info("decode_media_meta", "decode_media_meta(bin) - container-header decode (wav/bmp/png/gif/jpeg)"),
        (es: Seq[Expression]) => DecodeMediaMeta(es(0))))
    ext.injectFunction(
      (FunctionIdentifier("image_ahash"),
        info("image_ahash", "image_ahash(bin) - 8x8 perceptual average-hash (real BMP/GIF pixel decode)"),
        (es: Seq[Expression]) => ImageAHash(es(0))))
    ext.injectFunction(
      (FunctionIdentifier("build_bmp"),
        info("build_bmp", "build_bmp(id, w, h) - deterministic synthetic 24-bit BMP bytes"),
        (es: Seq[Expression]) => BuildBmp(es(0), es(1), es(2))))
    ext.injectFunction(
      (FunctionIdentifier("build_gif"),
        info("build_gif", "build_gif(id, w, h) - deterministic synthetic GIF89a bytes (valid LZW)"),
        (es: Seq[Expression]) => BuildGif(es(0), es(1), es(2))))
    ext.injectFunction(
      (FunctionIdentifier("build_png"),
        info("build_png", "build_png(id, w, h) - deterministic synthetic 8-bit grayscale PNG bytes"),
        (es: Seq[Expression]) => BuildPng(es(0), es(1), es(2))))
    ext.injectFunction(
      (FunctionIdentifier("build_jpeg"),
        info("build_jpeg", "build_jpeg(id, w, h) - deterministic synthetic baseline grayscale JPEG bytes"),
        (es: Seq[Expression]) => BuildJpeg(es(0), es(1), es(2))))
    ext.injectFunction(
      (FunctionIdentifier("repetition_counts"),
        info("repetition_counts", "repetition_counts(tokens) - (top_run, dup2/3 distinct+total) struct"),
        (es: Seq[Expression]) => RepetitionCounts(es(0))))
    ext.injectFunction(
      (FunctionIdentifier("char_run_entropy_sums"),
        info("char_run_entropy_sums", "char_run_entropy_sums(str) - (sum run*ln(run), n_chars) struct"),
        (es: Seq[Expression]) => CharRunEntropySums(es(0))))
    ext.injectFunction(
      (FunctionIdentifier("build_anim_gif"),
        info("build_anim_gif", "build_anim_gif(id, w, h, frames) - deterministic multi-frame GIF89a bytes"),
        (es: Seq[Expression]) => BuildAnimGif(es(0), es(1), es(2), es(3))))
    ext.injectFunction(
      (FunctionIdentifier("gif_frame_hashes"),
        info("gif_frame_hashes", "gif_frame_hashes(bin) - per-frame 8x8 aHashes of a GIF (full LZW decode)"),
        (es: Seq[Expression]) => GifFrameHashes(es(0))))
    ext.injectFunction(
      (FunctionIdentifier("resize_bmp"),
        info("resize_bmp", "resize_bmp(bin, w, h) - nearest-neighbor BMP resize, re-encoded as 24-bit BMP"),
        (es: Seq[Expression]) => ResizeBmp(es(0), es(1), es(2))))
    ext.injectFunction(
      (FunctionIdentifier("build_wav"),
        info("build_wav", "build_wav(id, rate, n) - deterministic 16-bit PCM mono WAV bytes"),
        (es: Seq[Expression]) => BuildWav(es(0), es(1), es(2))))
    ext.injectFunction(
      (FunctionIdentifier("audio_pcm_features"),
        info("audio_pcm_features", "audio_pcm_features(bin) - raw integer PCM stats (sum_sq/sum_abs/peak/zero_cross)"),
        (es: Seq[Expression]) => AudioPcmFeatures(es(0))))
    ext.injectFunction(
      (FunctionIdentifier("zorder_value"),
        info("zorder_value",
          "zorder_value(a, b, bits) - Morton interleave of two bits-bit ints (a even bits, b odd)"),
        (es: Seq[Expression]) =>
          graft.operators.ZOrder.zExpression(es(0), es(1), es(2).eval(null).asInstanceOf[Int])))
  }
}
