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
    clearManagedLocation(spark, table)
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Drop `table` and clear its DEFAULT managed location so a following
    * `saveAsTable` cannot hit LOCATION_ALREADY_EXISTS. Idempotent across
    * PROCESSES, not just sessions: with the in-memory catalog, a managed
    * table's warehouse directory outlives the JVM that created it while
    * its catalog entry does not — and `saveAsTable` refuses a fresh
    * table whose location already exists even in overwrite mode.
    *
    * The location is resolved through the catalog, not by string
    * concatenation: defaultTablePath is CURRENT-DATABASE-aware
    * (<warehouse>/<db>.db/<table> outside default), where a hand-built
    * <warehouse>/<table> path would both miss the real orphan and
    * recursively delete an unrelated default-database directory.
    *
    * The default location is cleared ONLY when it is genuinely ours to
    * clear: either the existing catalog entry is a MANAGED table whose
    * data lives AT that default path, or there is no catalog entry at
    * all (the cross-process orphan case: a prior JVM's managed table
    * whose in-memory entry died with the session). An EXTERNAL table of
    * the same name keeps its data elsewhere — the directory at the
    * default path may then be someone else's, and deleting it would
    * destroy unrelated data. NOTE: concurrent writers in SEPARATE
    * processes sharing a warehouse must be externally serialized — the
    * CAS locks guarding callers (x124/x134) are in-process only.
    */
  def clearManagedLocation(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    val catalog = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val loc = org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(
      new org.apache.hadoop.fs.Path(catalog.defaultTablePath(ident)))
    val oursToClear = if (catalog.tableExists(ident)) {
      val meta = catalog.getTableMetadata(ident)
      meta.tableType == org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED &&
        org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(
          new org.apache.hadoop.fs.Path(meta.location)) == loc
    } else true
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (oursToClear && fs.exists(loc)) fs.delete(loc, true)
  }

  /** Inner-join two same-bucketed tables on `key`. With equal bucket
    * counts this plans as an exchange-free SortMergeJoin (bucket-aligned
    * scans on both sides).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
