package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.streaming.DeltaEpochStore

/** Direct crash-matrix rows for the delta store that the twin specs only
  * exercise indirectly: the stale-checkpoint refusal, the GC-crash
  * tolerance (a commit marker outliving its deleted frames), and the
  * replay no-op at the store layer itself.
  */
class DeltaEpochStoreSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("k", LongType)))
  private val frames = Seq("f" -> schema)

  private def df(xs: Long*) = xs.toDF("k")

  private def loaded(store: DeltaEpochStore): Set[Long] =
    store.load().get("f").distinct().collect().map(_.getLong(0)).toSet

  test("deltas accumulate, compaction subsumes, loader unions compact + later deltas") {
    val dir = java.nio.file.Files.createTempDirectory("graft_des").toString
    val s = new DeltaEpochStore(spark, dir, frames, compactEvery = 3)
    assert(s.load().isEmpty && s.latestCommitted === -1L)
    s.save(0L, Map("f" -> df(1)), Map("f" -> df(1)))          // delta
    s.save(1L, Map("f" -> df(2)), Map("f" -> df(1, 2)))       // delta
    assert(loaded(s) === Set(1L, 2L))
    s.save(2L, Map("f" -> df(3)), Map("f" -> df(1, 2, 3)))    // compact (2-(-1) >= 3)
    assert(new java.io.File(dir, "compacts/2").exists)
    assert(!new java.io.File(dir, "commits/0").exists, "pre-compact epochs GC'd")
    s.save(3L, Map("f" -> df(4)), Map("f" -> df(1, 2, 3, 4))) // delta on top
    assert(loaded(s) === Set(1L, 2L, 3L, 4L))
  }

  test("replay (same epoch id) is a save no-op; going backward throws") {
    val dir = java.nio.file.Files.createTempDirectory("graft_des_replay").toString
    val s = new DeltaEpochStore(spark, dir, frames, compactEvery = 8)
    s.save(0L, Map("f" -> df(1)), Map("f" -> df(1)))
    s.save(1L, Map("f" -> df(2)), Map("f" -> df(1, 2)))
    s.save(1L, Map("f" -> df(99)), Map("f" -> df(99))) // replayed: must not write
    assert(loaded(s) === Set(1L, 2L))
    val e = intercept[IllegalStateException] {
      s.save(0L, Map("f" -> df(7)), Map("f" -> df(7))) // fresh checkpoint vs old state
    }
    assert(e.getMessage.contains("behind"))
  }

  test("forward gap (old checkpoint vs wiped stateDir) throws, consecutive succeeds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_des_gap").toString
    val s = new DeltaEpochStore(spark, dir, frames, compactEvery = 8)
    // empty stateDir + a checkpoint already at epoch 5: the batches for
    // epochs 0-4 were committed to the checkpoint but never folded here
    val e0 = intercept[IllegalStateException] {
      s.save(5L, Map("f" -> df(1)), Map("f" -> df(1)))
    }
    assert(e0.getMessage.contains("skips past"))
    s.save(0L, Map("f" -> df(1)), Map("f" -> df(1)))
    val e1 = intercept[IllegalStateException] {
      s.save(2L, Map("f" -> df(3)), Map("f" -> df(1, 3))) // skips epoch 1
    }
    assert(e1.getMessage.contains("skips past"))
    s.save(1L, Map("f" -> df(2)), Map("f" -> df(1, 2)))   // consecutive: fine
    assert(loaded(s) === Set(1L, 2L))
    // negative epoch ids (non-streaming callers) still auto-assign prev+1
    s.save(-1L, Map("f" -> df(3)), Map("f" -> df(1, 2, 3)))
    assert(loaded(s) === Set(1L, 2L, 3L))
  }

  test("marker outliving its deleted frames (GC crash) is skipped, not fatal") {
    val dir = java.nio.file.Files.createTempDirectory("graft_des_gc").toString
    val s = new DeltaEpochStore(spark, dir, frames, compactEvery = 100)
    s.save(0L, Map("f" -> df(1)), Map("f" -> df(1)))
    s.save(1L, Map("f" -> df(2)), Map("f" -> df(1, 2)))
    // simulate a GC crash: epoch 0's frames are gone, its marker remains
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
    }
    rm(new java.io.File(dir, "f/epoch=0"))
    assert(new java.io.File(dir, "commits/0").exists)
    // the loader must skip the frame-less epoch instead of failing
    assert(loaded(s) === Set(2L))
    assert(s.latestCommitted === 1L)
  }

  test("100-epoch soak: bounded chain, GC deletes, every-10th-epoch restart resumes exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_des_soak").toString
    val K = 5
    var s = new DeltaEpochStore(spark, dir, frames, compactEvery = K)
    def commitsOnDisk: Seq[Long] = {
      val d = new java.io.File(dir, "commits")
      if (!d.exists) Seq.empty
      else d.listFiles.flatMap(f => f.getName.toLongOption).toSeq.sorted // skip .crc shadows
    }
    var maxChain = 0
    for (e <- 0L until 100L) {
      if (e > 0 && e % 10 == 0) {
        // restart: a fresh store over the same dir resumes exactly
        s = new DeltaEpochStore(spark, dir, frames, compactEvery = K)
        assert(s.latestCommitted === e - 1, s"restart at epoch $e lost the frontier")
        assert(loaded(s) === (0L until e).toSet, s"restart at epoch $e lost rows")
      }
      s.save(e, Map("f" -> df(e)), Map("f" -> spark.range(e + 1).toDF("k")))
      maxChain = math.max(maxChain, commitsOnDisk.size)
      // storage bound: GC after each compact keeps ≤ K live epochs
      assert(commitsOnDisk.size <= K,
        s"epoch $e: ${commitsOnDisk.size} live epochs — GC is not deleting")
    }
    // the chain actually cycled (compaction + GC ran many times) and the
    // full state survived 100 epochs of delta/compact/GC/restart churn
    assert(maxChain === K)
    assert(commitsOnDisk.forall(_ >= 95L), s"stale epochs survived GC: $commitsOnDisk")
    val fresh = new DeltaEpochStore(spark, dir, frames, compactEvery = K)
    assert(fresh.latestCommitted === 99L)
    assert(loaded(fresh) === (0L until 100L).toSet)
    // frame dirs for GC'd epochs are gone too (data, not just markers)
    assert(!new java.io.File(dir, "f/epoch=0").exists)
    assert(!new java.io.File(dir, "f/epoch=50").exists)
  }

  test("un-markered partial epoch is invisible and overwritten by the replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft_des_partial").toString
    val s = new DeltaEpochStore(spark, dir, frames, compactEvery = 100)
    s.save(0L, Map("f" -> df(1)), Map("f" -> df(1)))
    // simulate a mid-write crash: epoch-1 frames on disk, no marker
    df(999).write.mode("overwrite").parquet(s"$dir/f/epoch=1")
    assert(loaded(s) === Set(1L), "partial epoch leaked into the load")
    // the replay overwrites the partial dir in place
    s.save(1L, Map("f" -> df(2)), Map("f" -> df(1, 2)))
    assert(loaded(s) === Set(1L, 2L))
  }
}
