package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Epoch-versioned multi-frame state persistence for `foreachBatch`
  * maintainers — the [[ComponentsStream]] scheme generalized to N named
  * frames so [[NearDupStream]]'s five-frame index can restart exactly.
  *
  * Layout: `dir/<frame>/epoch=<id>` parquet per frame, plus ONE
  * append-only commit marker `dir/commits/<id>` written after EVERY
  * frame of the epoch is on disk. The crash matrix (same argument as
  * ComponentsStream, which Spark's offset log makes exact because
  * offsets commit only after foreachBatch returns, and every maintainer
  * fold here is idempotent):
  *
  *   - marker written, offsets not: the batch replays into state that
  *     already folded it — a no-op by fold idempotence;
  *   - crash mid-epoch (some frames written, no marker): the loader
  *     falls back to the previous committed epoch and the replay
  *     re-folds what was lost;
  *   - GC keeps {latest, previous} epochs, so the fallback target always
  *     exists.
  *
  * A maintainer owns one store; `load()` returns the latest committed
  * epoch's frames (localCheckpoint'd) or None on a fresh dir.
  */
final class EpochStore(
    spark: SparkSession,
    dir: String,
    frames: Seq[(String, StructType)]
) {

  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest epoch with a commit marker AND every frame dir extant; -1 if none. */
  def latestCommitted: Long = {
    val commits = new Path(dir, "commits")
    val f = fs(commits)
    if (!f.exists(commits)) -1L
    else
      f.listStatus(commits).toSeq
        .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
        .sorted(Ordering[Long].reverse)
        .find(e => frames.forall { case (name, _) =>
          f.exists(new Path(dir, s"$name/epoch=$e"))
        })
        .getOrElse(-1L)
  }

  /** The latest committed epoch's frames, or None on a fresh dir. */
  def load(): Option[Map[String, DataFrame]] = {
    val e = latestCommitted
    if (e < 0) None
    else Some(frames.map { case (name, schema) =>
      name -> spark.read.schema(schema).parquet(s"$dir/$name/epoch=$e").localCheckpoint(true)
    }.toMap)
  }

  /** Empty frames matching the declared schemas (the fresh-start state). */
  def emptyFrames: Map[String, DataFrame] =
    frames.map { case (name, schema) =>
      name -> spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    }.toMap

  /** Persist epoch `epochId`: every frame first, marker second, GC of
    * epochs older than the previous committed one last.
    */
  def save(epochId: Long, state: Map[String, DataFrame]): Unit = {
    val prev = latestCommitted
    frames.foreach { case (name, _) =>
      state(name).write.mode("overwrite").parquet(s"$dir/$name/epoch=$epochId")
    }
    val marker = new Path(dir, s"commits/$epochId")
    val f = fs(marker)
    f.mkdirs(marker.getParent)
    f.create(marker, true).close()
    if (prev >= 0) {
      val commits = new Path(dir, "commits")
      f.listStatus(commits).toSeq
        .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
        .filter(e => e < prev)
        .foreach { e =>
          frames.foreach { case (name, _) =>
            f.delete(new Path(dir, s"$name/epoch=$e"), true)
          }
          f.delete(new Path(dir, s"commits/$e"), false)
        }
    }
  }
}
