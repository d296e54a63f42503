package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-release diff — the content-addressed "what changed between
  * corpus v1 and v2" audit every versioned training-set release ships
  * with (the manifest-diff idea behind data version control tools, done
  * Spark-native): per document id, `added` / `removed` / `changed` /
  * `unchanged` by comparing text digests, never texts.
  *
  * Scale shape: both sides project to (id, md5) MAP-SIDE — 16-byte
  * digests shuffle, documents never do — then ONE id-keyed full-outer
  * join decides the status. At 100 TB this is the cheapest possible
  * exact diff: two scans, one narrow exchange; storing the (id, md5)
  * manifest per release amortizes even the scans.
  */
object CorpusDiff {

  /** One row per id present in either version:
    * (id, status, old_md5 NULL when added, new_md5 NULL when removed).
    */
  def diff(
      v1: DataFrame,
      v2: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val a = v1.select(col(idCol), md5(col(textCol)).as("old_md5"))
    val b = v2.select(col(idCol), md5(col(textCol)).as("new_md5"))
    a.join(b, Seq(idCol), "full_outer")
      .select(
        col(idCol),
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("removed"))
          .when(col("old_md5") === col("new_md5"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_md5"),
        col("new_md5"))
  }
}
