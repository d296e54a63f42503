package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusDiff

class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  test("all four statuses, by digest comparison only") {
    val v1 = Seq(
      (1L, "kept exactly"),
      (2L, "will change"),
      (3L, "will be removed")
    ).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, "kept exactly"),
      (2L, "will change INDEED"),
      (4L, "brand new")
    ).toDF("doc_id", "text")
    val got = CorpusDiff.diff(v1, v2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.isNullAt(2), r.isNullAt(3)))
      .sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, "unchanged", false, false),
      (2L, "changed", false, false),
      (3L, "removed", false, true),
      (4L, "added", true, false)))
  }

  test("identical versions diff to all-unchanged; disjoint versions to added+removed only") {
    val v = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(CorpusDiff.diff(v, v).where(col("status") =!= "unchanged").count() === 0L)
    val w = Seq((3L, "c")).toDF("doc_id", "text")
    val statuses = CorpusDiff.diff(v, w).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(statuses === Set((1L, "removed"), (2L, "removed"), (3L, "added")))
  }

  test("whitespace-level edits count as changed (byte-exact digests), any partitioning") {
    val v1 = Seq((1L, "a b"), (2L, "x")).toDF("doc_id", "text").repartition(7)
    val v2 = Seq((1L, "a  b"), (2L, "x")).toDF("doc_id", "text").repartition(3)
    val got = CorpusDiff.diff(v1, v2).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "changed"), (2L, "unchanged")))
  }
}
