package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located (bucketed) joins — the 100 TB technique for joining two big
  * fact tables repeatedly on the same key WITHOUT a per-query shuffle
  * (SURVEY.md §2.7 noted the reference has no joins at this scale; the
  * training-data extensions do: documents ⋈ embeddings by doc id,
  * snapshots ⋈ snapshots by symbol across days).
  *
  * Writing both sides bucketed by the join key (same bucket count) lets
  * Spark's FileSourceStrategy plan a SortMergeJoin whose children are
  * bucket-aligned scans: NO Exchange on either side — the shuffle is paid
  * once at write time and amortized over every subsequent join, the exact
  * trade a pipeline that re-joins the same corpus daily wants. The spec
  * pins the no-Exchange plan shape.
  *
  * This is deliberately the built-in bucketing path (`bucketBy` +
  * `saveAsTable`), not a custom partitioner: Catalyst knows the output
  * partitioning of a bucketed scan and removes the exchanges itself.
  */
object Colocate {

  /** Write `df` as a parquet table bucketed (and sorted) by `key` —
    * `buckets` should be sized so one bucket of the LARGER table fits an
    * executor's memory comfortably (rule of thumb: total size / 128-256 MB).
    *
    * Idempotent across PROCESSES, not just sessions: with the in-memory
    * catalog, a managed table's warehouse directory outlives the JVM that
    * created it while its catalog entry does not — and `saveAsTable`
    * refuses a fresh table whose location already exists
    * (LOCATION_ALREADY_EXISTS) even in overwrite mode. Drop any catalog
    * entry first, then clear the orphaned location.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // resolve the managed location through the catalog, not by string
    // concatenation: defaultTablePath is CURRENT-DATABASE-aware
    // (<warehouse>/<db>.db/<table> outside default), where a hand-built
    // <warehouse>/<table> path would both miss the real orphan and
    // recursively delete an unrelated default-database directory
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Inner-join two same-bucketed tables on `key`. With equal bucket
    * counts this plans as an exchange-free SortMergeJoin (bucket-aligned
    * scans on both sides).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
