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
}
