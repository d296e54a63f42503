package graft

import org.apache.spark.sql.functions._
import graft.operators.ImportanceResampling

class ImportanceResamplingSpec extends SparkSpec {
  import spark.implicits._

  // Target docs (id < 2) speak "alpha"-vocabulary; raw docs mix it to
  // different degrees, so the importance order is hand-predictable.
  private lazy val corpus = Seq(
    (0L, "alpha alpha beta"),
    (1L, "alpha gamma"),
    (10L, "alpha alpha alpha"), // raw, most target-like
    (11L, "alpha zeta"), // raw, mixed
    (12L, "zeta zeta zeta zeta"), // raw, off-target vocabulary
    (13L, "omega theta") // raw, vocabulary absent from target
  ).toDF("doc_id", "text")

  private lazy val out = ImportanceResampling
    .scoreAndSelect(corpus, col("doc_id") < 2, "doc_id", "text", nBuckets = 64, keepDen = 2L)
    .collect()
    .map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Int]("n_tok"), r.getAs[Long]("score"), r.getAs[Long]("rank"), r.getAs[Boolean]("selected"))))
    .toMap

  test("only raw documents are scored, with their occurrence counts") {
    assert(out.keySet === Set(10L, 11L, 12L, 13L))
    assert(out(10L)._1 === 3)
    assert(out(12L)._1 === 4)
  }

  test("closed-form scores: smoothed target/raw ratio per occurrence") {
    // Occurrence counts: alpha t=3 r=4, zeta t=0 r=5, omega/theta t=0 r=1
    // (the 6 tokens hash to distinct mod-64 buckets — verified; a
    // collision would change these closed forms).
    // w_alpha = 4e6 div 5 = 800000; w_zeta = 1e6 div 6 = 166666;
    // w_omega = w_theta = 1e6 div 2 = 500000.
    assert(out(10L)._2 === 3L * 800000)
    assert(out(11L)._2 === 800000L + 166666L)
    assert(out(12L)._2 === 4L * 166666)
    assert(out(13L)._2 === 2L * 500000)
    // Rank: 10 (2.4M) > 13 (1.0M) > 11 (0.97M) > 12 (0.67M); keepDen=2
    // keeps the top 2 — the target-like doc AND the rare-vocab doc (rare
    // raw tokens smooth to larger ratios than frequent off-target ones,
    // the DSIR behavior: unseen-in-raw ≈ uninformative, frequent-raw-only
    // = actively down-weighted).
    assert(out(10L)._3 === 1L && out(13L)._3 === 2L)
    assert(out(10L)._4 && out(13L)._4 && !out(11L)._4 && !out(12L)._4)
  }

  test("rank is a permutation of 1..n_raw ordered by (score desc, id asc)") {
    assert(out.values.map(_._3).toSeq.sorted === Seq(1L, 2L, 3L, 4L))
    val byRank = out.toSeq.sortBy(_._2._3).map { case (id, (_, sc, _, _)) => (id, sc) }
    assert(byRank.map(_._2).reverse === byRank.map(_._2).reverse.sorted)
  }

  test("unseen and target-only buckets get the smoothed ratio weight") {
    // A raw doc whose single token appears nowhere else scores exactly
    // (0+1)*scale div (0+1+1)? No: its own occurrence counts in r, so
    // w = (0+1)*scale div (1+1) = scale/2 — pin the closed form.
    val solo = ImportanceResampling
      .scoreAndSelect(
        Seq((0L, "alpha"), (1L, "uniquetoken")).toDF("doc_id", "text"),
        col("doc_id") === 0L, "doc_id", "text", nBuckets = 64, scale = 1000L)
      .collect()
    assert(solo.length === 1)
    assert(solo.head.getAs[Long]("score") === 500L)
  }

  test("bucket ids stay within [0, nBuckets)") {
    val b = corpus
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(ImportanceResampling.bucket(col("tok"), 7).as("b"))
      .as[Long].collect()
    assert(b.forall(x => x >= 0 && x < 7))
  }
}
