package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.Similarity

/** SQ8 scalar quantization (x40/x41): calibration, code bounds, golden
  * hand-computed codes, exact integer dots, and the no-explode plan shape.
  */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  test("vector_min_max: exact per-dim ranges, null-skip, all-null group") {
    val df = Seq(
      (Some(Array(1.0f, -2.0f)), 1),
      (Some(Array(3.0f, 0.5f)), 1),
      (None, 1),
      (None, 2)
    ).toDF("v", "g")
    val mm = df
      .groupBy($"g")
      .agg(GraftFunctions.vectorMinMax($"v").as("mm"))
      .orderBy($"g")
      .collect()
    val r1 = mm(0).getStruct(1)
    assert(r1.getSeq[Double](0) === Seq(1.0, -2.0))
    assert(r1.getSeq[Double](1) === Seq(3.0, 0.5))
    assert(mm(1).isNullAt(1)) // all-NULL group
  }

  test("sq8Codes golden: hand-computed codes, degenerate dim, bounds") {
    // dim0 range [0, 10]: v=2.5 -> floor(2.5*25.5)=63; dim1 constant -> 0;
    // dim2 range [-1, 1]: v=1 (the max) -> exactly 255, never 256.
    val df = Seq(
      (0L, Array(0.0f, 7.0f, -1.0f)),
      (1L, Array(2.5f, 7.0f, 0.0f)),
      (2L, Array(10.0f, 7.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity
      .sq8Codes(df)
      .orderBy($"vec_id")
      .collect()
      .map(_.getSeq[Int](1))
    assert(got(0) === Seq(0, 0, 0))
    assert(got(1) === Seq(63, 0, 127))
    assert(got(2) === Seq(255, 0, 255))
  }

  test("sq8Codes on real embeddings: all codes in [0,255], per-dim 0 and 255 hit") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val codes = Similarity.sq8Codes(emb).cache()
    try {
      val stats = codes
        .select(explode($"codes").as("c"))
        .agg(min($"c"), max($"c"))
        .collect()(0)
      assert(stats.getInt(0) >= 0 && stats.getInt(1) <= 255)
      // every dimension's max code is 255 (the calibration max itself
      // quantizes to full scale) and min code is 0
      val perDim = codes
        .select(posexplode($"codes").as(Seq("i", "c")))
        .groupBy($"i")
        .agg(min($"c").as("mn"), max($"c").as("mx"))
        .collect()
      assert(perDim.forall(r => r.getInt(1) == 0 && r.getInt(2) == 255))
    } finally codes.unpersist()
  }

  test("sq8Codes is deterministic across shuffle-partition settings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val a = Similarity.sq8Codes(emb).orderBy($"vec_id").collect().toSeq
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Similarity.sq8Codes(emb).orderBy($"vec_id").collect().toSeq
      assert(a === b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("sq8TopK golden: dequantized cosine and rank order on a hand-built set") {
    // ranges over the 4 vectors: dim0 [0,4], dim1 [0,4]; codes floored at
    // scale 255/4, then dequantized back by c*4/255:
    //   q  (id 0): (4, 0) -> codes (255, 0) -> dequant (4.0, 0.0)
    //   c1 (id 10): (4, 4) -> (255, 255) -> (4, 4)       cos = 0.707107
    //   c2 (id 11): (2, 0) -> (127, 0) -> (1.992.., 0)   cos = 1.0 (colinear)
    //   c3 (id 12): (0, 4) -> (0, 255) -> (0, 4)         cos = 0.0
    val df = Seq(
      (0L, Array(4.0f, 0.0f)),
      (10L, Array(4.0f, 4.0f)),
      (11L, Array(2.0f, 0.0f)),
      (12L, Array(0.0f, 4.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity
      .sq8TopK(df, col("vec_id") < 10, k = 3)
      .orderBy($"rank")
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.toSeq === Seq((11L, 1.0, 1), (10L, 0.707107, 2), (12L, 0.0, 3)))
  }

  test("sq8TopK recall vs exact cosine top-5 on real embeddings is high") {
    // 8-bit quantization error is ~0.2% per dim; the dequantized-cosine
    // ranking should recover nearly all of the exact top-5
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity
      .bruteForceTopK(emb.where($"vec_id" < 10), emb.where($"vec_id" >= 10), k = 5)
      .select($"query_id", $"neighbor_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val sq8 = Similarity
      .sq8TopK(emb, col("vec_id") < 10, k = 5)
      .select($"query_id", $"neighbor_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val recall = (exact intersect sq8).size.toDouble / exact.size
    assert(recall >= 0.9, s"sq8 recall $recall vs exact top-5")
  }

  test("plan: sq8Codes quantize pass is map-only — no generator, no exchange") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = Similarity.sq8Codes(emb).queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"dim-explode leaked into the plan:\n$plan")
    assert(!plan.contains("Exchange"), s"quantize pass should not shuffle:\n$plan")
  }

  /** Independent replay of the documented int-PQ closed form. */
  private def refBook(m: Int, ksub: Int, mns: Array[Long], mxs: Array[Long]): Array[Long] = {
    val sub = mns.length / m
    Array.tabulate(m * ksub * sub) { idx =>
      val s = idx / (ksub * sub); val k = (idx / sub) % ksub; val j = idx % sub
      val g = s * sub + j
      mns(g) + graft.operators.DistinctSketch.hash40Scala(s"pq:$s:$k:$j") % (mxs(g) - mns(g) + 1L)
    }
  }

  test("int-PQ codes: exact replay of calibration, codebooks, and argmin with smallest-k ties") {
    val m = 2; val ksub = 4
    val mns = Array(-2000L, -1000L, 0L, -500L)
    val mxs = Array(2000L, 1000L, 1000L, 500L)
    val book = refBook(m, ksub, mns, mxs)
    val vecs = Seq(
      Array(0.25f, -0.5f, 0.75f, -0.1f),
      Array(-1.9f, 0.9f, 0.001f, 0.499f),
      Array(0.0f, 0.0f, 0.0f, 0.0f))
    def refCodes(v: Array[Float]): Seq[Int] = {
      val q = v.map(x => math.floor(x * 1000.0).toLong)
      (0 until m).map { s =>
        (0 until ksub).minBy { k =>
          val base = (s * ksub + k) * 2
          val d = (0 until 2).map { j =>
            val diff = q(s * 2 + j) - book(base + j); diff * diff
          }.sum
          (d, k.toLong) // minBy on (d, k): smallest distance, then smallest k
        }
      }
    }
    val got = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
      .select($"vec_id",
        GraftFunctions.intPqCodes($"embedding", m, ksub, mns.toSeq, mxs.toSeq).as("c"))
      .orderBy($"vec_id").collect().map(_.getSeq[Int](1))
    vecs.indices.foreach(i => assert(got(i) === refCodes(vecs(i)), s"vec $i"))
  }

  test("int-PQ ADC: distance equals the Scala reconstruction sum; wrong-length codes are NULL") {
    val m = 2; val ksub = 4
    val mns = Array(-2000L, -1000L, 0L, -500L)
    val mxs = Array(2000L, 1000L, 1000L, 500L)
    val book = refBook(m, ksub, mns, mxs)
    val q = Array(0.3f, -0.2f, 0.6f, 0.1f)
    val codes = Seq(1, 3)
    val expected = {
      val qq = q.map(x => math.floor(x * 1000.0).toLong)
      (0 until m).map { s =>
        val base = (s * ksub + codes(s)) * 2
        (0 until 2).map { j =>
          val diff = qq(s * 2 + j) - book(base + j); diff * diff
        }.sum
      }.sum
    }
    val df = Seq((q, codes), (q, Seq(1))).toDF("qv", "codes")
    val out = df.select(
      GraftFunctions.intPqDist($"qv", $"codes", m, ksub, mns.toSeq, mxs.toSeq).as("d"))
      .collect()
    assert(out(0).getLong(0) === expected)
    assert(out(1).isNullAt(0), "length-mismatched codes must yield NULL")
  }

  test("trained PQ: Lloyd codebooks — deterministic, empty-cell-preserving, recall over the random books") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.where($"vec_id" >= 10)
    val b1 = Similarity.pqTrain(corpus, m = 32, ksub = 64, iters = 2)
    val b2 = Similarity.pqTrain(corpus, m = 32, ksub = 64, iters = 2)
    assert(b1 === b2, "same seed + corpus must give identical codebooks")
    assert(b1.length === 32 * 64 * 2)
    // a 490-vector corpus cannot fill 64 codes in every subspace —
    // wrapped init entries must survive as-is rather than becoming NaN
    assert(b1.forall(x => !x.isNaN && !x.isInfinite))
    val queries = emb.where($"vec_id" < 10)
    def edges(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = edges(Similarity.bruteForceTopK(queries, corpus, k = 5))
    val trained = edges(Similarity.pqTopKTrained(queries, corpus, k = 5))
    val recall = (exact intersect trained).size.toDouble / exact.size
    assert(recall >= 0.6, s"trained-PQ recall $recall vs exact top-5")
  }

  test("x118 config recall floor: integer-Lloyd trained PQ >= 0.8 of exact top-5") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where($"vec_id" < 10)
    val corpus = emb.where($"vec_id" >= 10)
    def edges(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = edges(Similarity.bruteForceTopK(queries, corpus, k = 5))
    val trained = edges(
      Similarity.intPqTopKTrained(queries, corpus, k = 5, m = 64, ksub = 32, iters = 4))
    val recall = (exact intersect trained).size.toDouble / exact.size
    // measured 0.80 at the registered (m=64, ksub=32, iters=4) config —
    // the r10 verdict's floor, and +0.16 over x117's untrained books;
    // deterministic (hash40 seeds, integer Lloyd), so the floor is exact
    assert(recall >= 0.8, s"trained int-PQ recall $recall vs exact top-5")
  }

  test("x119 IVFADC: probed-list containment, determinism, recall floors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where($"vec_id" < 10)
    val corpus = emb.where($"vec_id" >= 10)
    def edges(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = edges(Similarity.bruteForceTopK(queries, corpus, k = 5))

    // registered config: nlist=8, nprobe=4 — half the lists probed.
    // Measured (deterministic): 0.64 here at sf0.001, 0.76 at sf0.01;
    // recall tracks nprobe/nlist on this unclustered synthetic corpus
    // (0.46/0.64/0.76/0.80 at nprobe 2/4/6/8), the honest IVF trade.
    val ivf = Similarity.intIvfPqTopKTrained(
      queries, corpus, k = 5, nlist = 8, nprobe = 4, m = 64, ksub = 32, iters = 4)
    val got = ivf.collect()
    assert(got.length === 50, "10 queries × k=5 — probed lists hold >= 5 candidates each")
    val again = edges(Similarity.intIvfPqTopKTrained(
      queries, corpus, k = 5, nlist = 8, nprobe = 4, m = 64, ksub = 32, iters = 4))
    assert(edges(ivf) === again, "hash40 seeds + integer Lloyd ⇒ bit-deterministic")
    val recallHalf = (exact intersect edges(ivf)).size.toDouble / exact.size
    assert(recallHalf >= 0.4, s"IVFADC nprobe=4/8 recall $recallHalf vs exact top-5")

    // nprobe = nlist removes the pruning: residual-PQ ADC over the whole
    // corpus, which must at least match x118's plain-PQ floor (residual
    // energy <= raw energy per cell). Measured 0.80 here, 0.86 at sf0.01
    // — residual codes BEAT x118's plain PQ (0.80) once pruning is off.
    val full = edges(Similarity.intIvfPqTopKTrained(
      queries, corpus, k = 5, nlist = 8, nprobe = 8, m = 64, ksub = 32, iters = 4))
    val recallFull = (exact intersect full).size.toDouble / exact.size
    assert(recallFull >= 0.8, s"IVFADC nprobe=nlist recall $recallFull vs exact top-5")
  }

  test("x117 config recall floor: calibrated int-PQ ADC >= 0.5 of exact top-5") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where($"vec_id" < 10)
    val corpus = emb.where($"vec_id" >= 10)
    def edges(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = edges(Similarity.bruteForceTopK(queries, corpus, k = 5))
    val pq = edges(Similarity.intPqTopK(queries, corpus, k = 5))
    val recall = (exact intersect pq).size.toDouble / exact.size
    // measured 0.64 at m=32, ksub=64 (0.02 UNcalibrated — the
    // calibration is load-bearing); floor leaves noise margin
    assert(recall >= 0.5, s"int-PQ recall $recall vs exact top-5")
  }
}
