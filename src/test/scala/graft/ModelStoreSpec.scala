package graft

import graft.operators.{LinearModel, ModelStore}
import graft.operators.LinearModel.HashedLinearModel

/** The at-rest model artifact: save → load must be coefficient-lossless
  * (the x124 round-trip discipline applied to weights), retrains must
  * replace the table, and a corrupted/partial table must fail fast
  * rather than score with silent zeros.
  */
class ModelStoreSpec extends SparkSpec {

  private def table(n: String) = s"graft_modelstore_spec_$n"

  /** Hand-written (non-ModelStore) saveAsTable needs the same
    * cross-process pre-clean ModelStore.save itself does: a previous
    * test JVM's managed table leaves its warehouse directory behind
    * while the catalog entry dies with the session, and saveAsTable
    * then throws LOCATION_ALREADY_EXISTS even in overwrite mode.
    */
  private def writeRaw(rows: Seq[(Long, Long, Long)], t: String): Unit = {
    import spark.implicits._
    graft.operators.Colocate.clearManagedLocation(spark, t)
    rows.toDF("c", "b", "w").write.mode("overwrite")
      .format("parquet").saveAsTable(t)
  }

  test("save → load round-trips every coefficient (binary and 4-class)") {
    Seq(
      LinearModel.planted("q", classes = 2, dim = 64),
      LinearModel.planted("m", classes = 4, dim = 32),
      HashedLinearModel(3, Array(
        Array(Long.MaxValue, 0L, Long.MinValue),
        Array(-1L, 1L, 42L))) // extreme longs survive the parquet hop
    ).zipWithIndex.foreach { case (m, i) =>
      ModelStore.save(spark, table(s"rt$i"), m)
      val back = ModelStore.load(spark, table(s"rt$i"))
      assert(back.classes === m.classes && back.dim === m.dim)
      assert(back.weights.map(_.toSeq).toSeq === m.weights.map(_.toSeq).toSeq)
    }
  }

  test("overwrite: a retrain replaces the artifact") {
    val t = table("ow")
    ModelStore.save(spark, t, LinearModel.planted("q", 2, 16))
    val retrained = LinearModel.planted("r", 2, 16)
    ModelStore.save(spark, t, retrained)
    assert(ModelStore.load(spark, t).weights.map(_.toSeq).toSeq ===
      retrained.weights.map(_.toSeq).toSeq)
  }

  test("a partial or duplicated table fails fast instead of zero-filling") {
    import spark.implicits._
    // one cell missing from the 2×4 grid
    val partial = for {
      c <- 0L to 1L; b <- 0L to 3L; if !(c == 1L && b == 2L)
    } yield (c, b, c * 10 + b)
    writeRaw(partial, table("part"))
    val e1 = intercept[IllegalArgumentException](ModelStore.load(spark, table("part")))
    assert(e1.getMessage.contains("not dense"))
    // right row count but a duplicated cell shadowing a missing one
    val dup = partial :+ (0L, 0L, 99L)
    writeRaw(dup, table("dup"))
    val e2 = intercept[IllegalArgumentException](ModelStore.load(spark, table("dup")))
    assert(e2.getMessage.contains("duplicate"))
    // empty
    writeRaw(Seq.empty, table("empty"))
    val e3 = intercept[IllegalArgumentException](ModelStore.load(spark, table("empty")))
    assert(e3.getMessage.contains("empty"))
  }
}
