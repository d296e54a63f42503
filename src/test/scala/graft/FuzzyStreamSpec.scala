package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Fuzzy
import graft.streaming.FuzzyStream
import graft.streaming.FuzzyStream.Str

/** The fifteenth batch/stream twin: after every micro-batch, the
  * maintainer's MONOTONE pair set must equal [[Fuzzy.editDistance1Pairs]]
  * over every string delivered so far — including pairs whose two members
  * arrive in DIFFERENT batches (the case the new×(old∪new) mine exists
  * for) and the orientation trap: a new string must pair with an old one
  * whether it sorts before or after it.
  */
class FuzzyStreamSpec extends SparkSpec {
  import spark.implicits._

  // real tokens from the corpus plus crafted cross-batch neighbors
  private lazy val vocab: Seq[String] = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(explode(split(lower(col("text")), "\\s+")).as("s"))
    .where(length(col("s")) >= 4)
    .distinct()
    .orderBy(col("s"))
    .limit(30)
    .collect()
    .map(_.getString(0))
    .toSeq

  private def strsDF(ss: Seq[String]): DataFrame = ss.toDF("s")

  private def pairSet(df: DataFrame): Set[(String, String, Long)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  private def batchPairs(ss: Seq[String]): Set[(String, String, Long)] =
    pairSet(Fuzzy.editDistance1Pairs(strsDF(ss), "s"))

  test("pairs ≡ batch editDistance1Pairs after every micro-batch, cross-batch pairs both orientations") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Str]
    val m = new FuzzyStream.Maintainer(spark)
    val query = FuzzyStream.start(input.toDS(), m)
    try {
      // batch 1: vocab slice plus anchors for later cross-batch pairs
      val b1 = vocab.take(10) ++ Seq("margin", "zzzap")
      input.addData(b1.map(Str): _*)
      query.processAllAvailable()
      var prefix = b1
      assert(pairSet(m.pairs) === batchPairs(prefix))

      // batch 2: neighbors of batch-1 strings, on BOTH sides of the sort
      // order — "margin"/"margins" (new sorts after old) and
      // "zzzap"/"azzap"... careful: "azzap" sorts BEFORE "zzzap"
      val b2 = Seq("margins", "azzap") ++ vocab.slice(10, 20)
      input.addData(b2.map(Str): _*)
      query.processAllAvailable()
      prefix ++= b2
      val after2 = pairSet(m.pairs)
      assert(after2 === batchPairs(prefix))
      assert(after2.contains(("margin", "margins", 1L)), "new-after-old pair missed")
      assert(after2.contains(("azzap", "zzzap", 1L)), "new-before-old pair missed")

      // batch 3: remaining vocab — monotonicity: nothing ever retracts
      val b3 = vocab.slice(20, 30)
      input.addData(b3.map(Str): _*)
      query.processAllAvailable()
      prefix ++= b3
      val after3 = pairSet(m.pairs)
      assert(after3 === batchPairs(prefix))
      assert(after2.subsetOf(after3), "emission must be monotone")
    } finally query.stop()
  }

  test("replayed batch is a no-op (anti-join empties the delta)") {
    val ss = vocab.take(8) ++ Seq("margin", "margins")
    val m = new FuzzyStream.Maintainer(spark)
    m.update(strsDF(ss))
    val once = pairSet(m.pairs)
    val nStrings = m.strings.count()
    val nVariants = m.variants.count()
    m.update(strsDF(ss)) // same batch re-delivered after a crash
    assert(pairSet(m.pairs) === once)
    assert(m.strings.count() === nStrings)
    assert(m.variants.count() === nVariants)
    assert(once === batchPairs(ss))
  }

  test("stateDir restart + compaction: resume over compact+delta ≡ full batch mine") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzy_state").toString
    val m1 = new FuzzyStream.Maintainer(spark, stateDir = Some(dir), compactEvery = 2)
    m1.update(strsDF(vocab.take(8) :+ "margin"), epochId = 0L)  // delta
    m1.update(strsDF(vocab.slice(8, 14) :+ "margins"), epochId = 1L) // compact
    m1.update(strsDF(vocab.slice(14, 20)), epochId = 2L) // delta
    assert(!new java.io.File(dir, "commits/0").exists, "epoch 0 should be GC'd")
    assert(new java.io.File(dir, "compacts/1").exists, "epoch 1 should be a compact")

    val m2 = new FuzzyStream.Maintainer(spark, stateDir = Some(dir), compactEvery = 2)
    assert(m2.resumed)
    val expect = batchPairs(vocab.take(20) ++ Seq("margin", "margins"))
    assert(pairSet(m2.pairs) === expect)
    assert(pairSet(m2.pairs).contains(("margin", "margins", 1L)))
    // replay of the last batch is a no-op; the fold continues after it
    m2.update(strsDF(vocab.slice(14, 20)), epochId = 2L)
    assert(pairSet(m2.pairs) === expect)
    m2.update(strsDF(vocab.slice(20, 30)), epochId = 3L)
    assert(pairSet(m2.pairs) === batchPairs(vocab.take(30) ++ Seq("margin", "margins")))
  }

  test("mid-write crash (frames without marker) falls back and the replay re-folds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzy_crash").toString
    val m1 = new FuzzyStream.Maintainer(spark, stateDir = Some(dir))
    val b0 = vocab.take(8) :+ "margin"
    val b1 = vocab.slice(8, 16) :+ "margins"
    m1.update(strsDF(b0), epochId = 0L)
    val afterB0 = pairSet(m1.pairs)
    m1.update(strsDF(b1), epochId = 1L)
    assert(new java.io.File(dir, "commits/1").delete(), "marker should exist")

    val m2 = new FuzzyStream.Maintainer(spark, stateDir = Some(dir))
    assert(m2.resumed)
    assert(pairSet(m2.pairs) === afterB0, "loader did not fall back to epoch 0")
    m2.update(strsDF(b1), epochId = 1L)
    assert(pairSet(m2.pairs) === batchPairs(b0 ++ b1))
  }

  test("save failure leaves in-memory state un-advanced; the retry commits the batch") {
    // the r12 ADVICE hole: if store.save throws AFTER `state` was already
    // reassigned, the replayed batch anti-joins to an EMPTY delta and the
    // batch is permanently lost. The fix saves FIRST — pin it by forcing
    // save to throw (a regular file squatting where the commit-marker
    // directory must go) and replaying the same epoch.
    val dirF = java.nio.file.Files.createTempDirectory("graft_fuzzy_savefail")
    val dir = dirF.toString
    val m = new FuzzyStream.Maintainer(spark, stateDir = Some(dir))
    val b0 = vocab.take(8) ++ Seq("margin", "margins")
    val squatter = new java.io.File(dir, "commits")
    assert(squatter.createNewFile(), "squatter file should be creatable")
    intercept[Exception] { m.update(strsDF(b0), epochId = 0L) }
    assert(pairSet(m.pairs).isEmpty,
      "in-memory state advanced past a failed save — the replay would lose the batch")
    assert(squatter.delete())
    // the foreachBatch replay: same epoch, same batch — must now commit
    m.update(strsDF(b0), epochId = 0L)
    assert(pairSet(m.pairs) === batchPairs(b0))
    val m2 = new FuzzyStream.Maintainer(spark, stateDir = Some(dir))
    assert(m2.resumed && pairSet(m2.pairs) === batchPairs(b0),
      "retried batch did not reach durable state")
  }

  test("checkpoint without stateDir is refused") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Str]
    val m = new FuzzyStream.Maintainer(spark)
    val cp = java.nio.file.Files.createTempDirectory("graft_fuzzy_cp").toString
    val e = intercept[IllegalArgumentException] {
      FuzzyStream.start(input.toDS(), m, checkpoint = Some(cp))
    }
    assert(e.getMessage.contains("stateDir"))
  }
}
