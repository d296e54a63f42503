package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.LinearModel
import graft.streaming.PerceptronStream
import graft.streaming.PerceptronStream.Example

/** The seventeenth batch/stream twin — the learned-model family's
  * streaming member: after every micro-batch, `train()` over the
  * maintained example set must equal batch
  * [[LinearModel.trainPerceptron]] over every example delivered so far,
  * weight-for-weight AND round-curve-for-round-curve (the view-forced
  * emission: one new example can flip a round-1 score sign and move
  * every later-round weight, so the only correct surface is training
  * against current state). Includes the structural case that makes
  * incremental training non-trivial: a batch whose examples flip
  * previously-correct documents to misclassified (the update set of
  * every subsequent round changes, not just the new rows' contribution).
  */
class PerceptronStreamSpec extends SparkSpec {
  import spark.implicits._

  // real corpus text with the planted even-odd labels (x128's contract)
  private lazy val allExamples: Seq[(Long, String, Long)] =
    spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")
      .limit(48)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.getLong(0) % 2 == 0) 1L else -1L))
      .toSeq

  private val Dim = 64
  private val Rounds = 2

  private def batchTrain(ex: Seq[(Long, String, Long)]): (Seq[Long], Seq[Long]) = {
    val (w, mis) = LinearModel.trainPerceptron(
      ex.toDF("doc_id", "text", "y"), "text", "y", dim = Dim, rounds = Rounds)
    (w.toSeq, mis)
  }

  private def streamTrain(m: PerceptronStream.Maintainer): (Seq[Long], Seq[Long]) = {
    val (w, mis) = m.train(dim = Dim, rounds = Rounds)
    (w.toSeq, mis)
  }

  test("train() ≡ batch trainPerceptron after every micro-batch (update-set shifts)") {
    assert(allExamples.size === 48, "need the full planted corpus slice")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Example]
    val m = new PerceptronStream.Maintainer(spark)
    val query = PerceptronStream.start(input.toDS(), m)
    try {
      val b1 = allExamples.take(16)
      input.addData(b1.map { case (i, t, y) => Example(i, t, y) }: _*)
      query.processAllAvailable()
      var prefix = b1
      assert(streamTrain(m) === batchTrain(prefix))

      // batch 2: more examples — round-1 deltas change, so the round-2
      // misclassified set over the OLD examples shifts too (the
      // view-forced case: old weights are invalidated, not appended to)
      val b2 = allExamples.slice(16, 32)
      input.addData(b2.map { case (i, t, y) => Example(i, t, y) }: _*)
      query.processAllAvailable()
      prefix ++= b2
      assert(streamTrain(m) === batchTrain(prefix))

      val b3 = allExamples.slice(32, 48)
      input.addData(b3.map { case (i, t, y) => Example(i, t, y) }: _*)
      query.processAllAvailable()
      prefix ++= b3
      assert(streamTrain(m) === batchTrain(prefix))
    } finally query.stop()
  }

  test("replayed batch is a no-op (distinct fold), overlapping batches collapse") {
    val m = new PerceptronStream.Maintainer(spark)
    val b = allExamples.take(20)
    m.update(b.toDF("doc_id", "text", "y"))
    val once = streamTrain(m)
    val stateOnce = m.state.count()
    m.update(b.toDF("doc_id", "text", "y")) // crash re-delivery
    assert(streamTrain(m) === once)
    assert(m.state.count() === stateOnce)
    // a batch OVERLAPPING committed examples adds only the new ones
    m.update(allExamples.slice(10, 30).toDF("doc_id", "text", "y"))
    assert(streamTrain(m) === batchTrain(allExamples.take(30)))
  }

  test("stateDir restart + replay + continuation across a fresh Maintainer") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pt_state").toString
    val m1 = new PerceptronStream.Maintainer(spark, stateDir = Some(dir))
    assert(!m1.resumed)
    m1.update(allExamples.take(16).toDF("doc_id", "text", "y"), epochId = 0L)
    m1.update(allExamples.slice(16, 32).toDF("doc_id", "text", "y"), epochId = 1L)
    val before = streamTrain(m1)

    val m2 = new PerceptronStream.Maintainer(spark, stateDir = Some(dir))
    assert(m2.resumed)
    assert(streamTrain(m2) === before)
    m2.update(allExamples.slice(16, 32).toDF("doc_id", "text", "y"), epochId = 1L) // replay no-op
    assert(streamTrain(m2) === before)
    m2.update(allExamples.slice(32, 48).toDF("doc_id", "text", "y"), epochId = 2L)
    assert(streamTrain(m2) === batchTrain(allExamples))
  }

  test("delta epochs compact: GC'd chain, restart over compact+delta ≡ full build") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pt_compact").toString
    val m1 = new PerceptronStream.Maintainer(spark, stateDir = Some(dir), compactEvery = 2)
    m1.update(allExamples.take(16).toDF("doc_id", "text", "y"), epochId = 0L)      // delta
    m1.update(allExamples.slice(16, 32).toDF("doc_id", "text", "y"), epochId = 1L) // compact
    m1.update(allExamples.slice(32, 48).toDF("doc_id", "text", "y"), epochId = 2L) // delta
    assert(!new java.io.File(dir, "commits/0").exists, "epoch 0 should be GC'd")
    assert(new java.io.File(dir, "compacts/1").exists)
    val m2 = new PerceptronStream.Maintainer(spark, stateDir = Some(dir), compactEvery = 2)
    assert(m2.resumed)
    assert(streamTrain(m2) === batchTrain(allExamples))
  }

  test("checkpoint without stateDir is refused") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Example]
    val m = new PerceptronStream.Maintainer(spark)
    val cp = java.nio.file.Files.createTempDirectory("graft_pt_cp").toString
    val e = intercept[IllegalArgumentException] {
      PerceptronStream.start(input.toDS(), m, checkpoint = Some(cp))
    }
    assert(e.getMessage.contains("stateDir"))
  }
}
