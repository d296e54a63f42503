package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.Colocate

/** Bucketed co-located join: same-bucket-count tables joined on the bucket
  * key must plan WITHOUT a shuffle exchange on either side — the write-time
  * shuffle is amortized over every later join.
  */
class ColocateSpec extends SparkSpec {

  test("bucketed join on the bucket key plans with zero exchanges") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumnRenamed("vec_id", "doc_id")
    try {
      Colocate.writeBucketed(docs, "graft_docs_b", "doc_id", buckets = 4)
      Colocate.writeBucketed(emb, "graft_emb_b", "doc_id", buckets = 4)

      val joined = Colocate.bucketedJoin(spark, "graft_docs_b", "graft_emb_b", "doc_id")
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty, s"expected exchange-free bucketed join, got:\n${joined.queryExecution.executedPlan}")

      // and it is still a correct join
      val n = joined.count()
      assert(n === emb.count()) // every embedding has a document
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_docs_b")
      spark.sql("DROP TABLE IF EXISTS graft_emb_b")
    }
  }

  test("an EXTERNAL same-name table never gets the default location deleted") {
    val table = "graft_ext_guard"
    val extData = java.nio.file.Files.createTempDirectory("graft_ext_data")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    try {
      // an EXTERNAL table of that name, data living elsewhere
      docs.limit(5).write.mode("overwrite").parquet(extData.toString)
      spark.sql(
        s"CREATE TABLE `$table` (doc_id BIGINT, text STRING) USING parquet " +
          s"LOCATION '${extData.toString}'")
      // …and an UNRELATED directory squatting at the managed default path
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(table)))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(loc)
      val sentinel = new org.apache.hadoop.fs.Path(loc, "unrelated_sentinel")
      fs.create(sentinel, true).close()
      // writeBucketed must NOT destroy the squatter (saveAsTable will then
      // refuse the occupied location — failing is correct; deleting is not)
      intercept[Exception] {
        Colocate.writeBucketed(docs, table, "doc_id", buckets = 2)
      }
      assert(fs.exists(sentinel), "unrelated directory at the default path was destroyed")
      fs.delete(loc, true)
      // with the squatter gone the same call (table entry now dropped ⇒
      // orphan rule applies) succeeds
      Colocate.writeBucketed(docs, table, "doc_id", buckets = 2)
      assert(spark.table(table).count() === docs.count())
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
      }
      rm(extData.toFile)
    }
  }
}
