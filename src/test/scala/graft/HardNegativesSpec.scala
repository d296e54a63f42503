package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Hard-negative mining (x104): duplicate-cluster exclusion, top-k
  * ordering, and the LSH path's recall against the exact baseline on
  * the real corpus vectors.
  */
class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.GraftFunctions.register(spark)

  // Two tight clusters on distinct axes plus two loners; cosine(a, b)
  // is closed-form, so the expected negatives are hand-derivable.
  private lazy val fixture = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.999f, 0.04f, 0.0f, 0.0f)), // dup of 1
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(0.04f, 0.999f, 0.0f, 0.0f)), // dup of 3
    (5L, Array(0.6f, 0.6f, 0.5f, 0.0f)), // between the clusters
    (6L, Array(0.0f, 0.0f, 0.0f, 1.0f)) // orthogonal loner
  ).toDF("vec_id", "embedding")

  private lazy val mined = Similarity
    .hardNegativesExact(fixture, k = 2, dupThreshold = 0.9)
    .collect()
    .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
      r.getAs[Long]("neighbor_id"))
    .toMap

  test("same-cluster vectors are never negatives; nearest non-dup wins") {
    // clusters at 0.9: {1,2} and {3,4}; 5 and 6 are singletons.
    assert(mined((1L, 1)) === 5L) // NOT 2 (its duplicate); 5 is nearest other
    assert(mined((2L, 1)) === 5L)
    assert(mined((3L, 1)) === 5L)
    // 5's nearest are the cluster members, all valid negatives for it
    assert(Set(mined((5L, 1)), mined((5L, 2))).subsetOf(Set(1L, 2L, 3L, 4L)))
  }

  test("exclusion holds corpus-wide on real vectors: no pair shares a root") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val roots = Dedup.semanticDedup(emb, 0.45)
      .select(col("vec_id"), col("root_id"))
    val joined = Similarity.hardNegativesExact(emb, k = 3, dupThreshold = 0.45)
      .join(roots.select(col("vec_id").as("query_id"), col("root_id").as("qr")), "query_id")
      .join(roots.select(col("vec_id").as("neighbor_id"), col("root_id").as("nr")), "neighbor_id")
    assert(joined.where(col("qr") === col("nr")).count() === 0L)
    assert(joined.count() > 0L)
  }

  test("LSH path: exact precision, measured recall >= 0.85 of the exact top-k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.hardNegativesExact(emb, k = 3, dupThreshold = 0.45)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.hardNegativesLsh(emb, k = 3, dupThreshold = 0.45)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.85, s"recall $recall")
  }
}
