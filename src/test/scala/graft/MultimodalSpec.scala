package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  test("synthetic media is deterministic with binary payloads of expected size") {
    def render(df: org.apache.spark.sql.DataFrame) =
      df.select(col("media_id"), col("kind"), hex(col("payload")).as("p"), col("meta"))
        .collect().sortBy(_.getLong(0)).map(_.toString).toSeq
    assert(render(Multimodal.synthetic(spark, 30)) === render(Multimodal.synthetic(spark, 30)))
    val payload = Multimodal.synthetic(spark, 1).collect()(0).getAs[Array[Byte]]("payload")
    assert(payload.length === 256) // sha2-256 hex ×8 → 256 bytes
  }

  test("byte histogram is an L1-normalized 256-bin array") {
    val out = Multimodal
      .featurize(Multimodal.synthetic(spark, 10))
      .select(col("media_id"), col("feature"))
      .collect()
    out.foreach { r =>
      val f = r.getSeq[Float](1)
      assert(f.length === 256)
      assert(math.abs(f.map(_.toDouble).sum - 1.0) < 1e-4)
    }
  }

  test("frame sampling slices payload deterministically") {
    val frames = Multimodal
      .synthetic(spark, 3)
      .select(Multimodal.sampleFrames(col("payload"), frameBytes = 16, stride = 4).as("fr"))
      .collect()
      .map(_.getSeq[Array[Byte]](0))
    assert(frames.forall(_.nonEmpty))
    assert(frames.forall(_.forall(_.length === 16)))
  }

  test("featurize stays map-only (no shuffle in the plan)") {
    val plan = Multimodal
      .featurize(Multimodal.synthetic(spark, 10))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
