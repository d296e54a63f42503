package graft.operators

import org.apache.spark.sql.SparkSession

import graft.operators.LinearModel.HashedLinearModel

/** At-rest persistence for trained [[LinearModel.HashedLinearModel]]
  * weights — the model-registry piece of the learned-model story: x128
  * trains in one job, x129/x131 serve in another, and in production
  * those are different PROCESSES separated by days (train on this
  * week's labels, score every delivery until the next retrain). The
  * x124 at-rest-artifact discipline applied to weights: "persisted in
  * memory" is a per-session cache, not an artifact; the durable form is
  * a catalog table.
  *
  * The schema is the long form (class, bucket, weight) — one row per
  * coefficient, classes × dim rows total. The model is BOUNDED DRIVER
  * STATE by the engine-wide codebook contract (the same bound that lets
  * the weights ride as plan literals), so `load` collecting classes ×
  * dim longs is the contract's read side, not a scale hazard; the dense
  * requirement on load catches a truncated or foreign table before it
  * silently scores everything with missing-as-zero coefficients.
  *
  * A plain managed table (no bucketing): the artifact is broadcast-scale
  * by construction, and its consumers inline it as literals — there is
  * no join for a bucket to co-locate.
  */
object ModelStore {

  /** Persist `model` as managed table `table` (overwrite — retrains
    * replace the artifact). Pre-cleans via
    * [[Colocate.clearManagedLocation]]: a prior PROCESS's managed table
    * leaves its warehouse directory behind while its in-memory catalog
    * entry dies with the JVM, and `saveAsTable` then refuses the fresh
    * write with LOCATION_ALREADY_EXISTS even in overwrite mode (the
    * x124 cross-process lesson, which this store originally missed).
    */
  def save(spark: SparkSession, table: String, model: HashedLinearModel): Unit = {
    import spark.implicits._
    Colocate.clearManagedLocation(spark, table)
    val rows = for {
      c <- 0 until model.classes
      b <- 0 until model.dim
    } yield (c.toLong, b.toLong, model.weights(c)(b))
    rows
      .toDF("c", "b", "w")
      .repartition(1) // classes × dim longs: one tiny file IS the artifact
      .write
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Re-open a [[save]]d artifact. Fails fast unless the table is a
    * DENSE classes × dim grid (every (c, b) exactly once): a partial
    * table would otherwise score with silent zeros where weights are
    * missing.
    */
  def load(spark: SparkSession, table: String): HashedLinearModel = {
    val rows = spark.table(table).select("c", "b", "w").collect()
    require(rows.nonEmpty, s"model table $table is empty")
    val classes = rows.iterator.map(_.getLong(0)).max.toInt + 1
    val dim = rows.iterator.map(_.getLong(1)).max.toInt + 1
    require(rows.length == classes * dim,
      s"model table $table is not dense: ${rows.length} rows for " +
        s"$classes classes x $dim buckets")
    val w = Array.ofDim[Long](classes, dim)
    val seen = Array.ofDim[Boolean](classes, dim)
    rows.foreach { r =>
      val (c, b) = (r.getLong(0).toInt, r.getLong(1).toInt)
      require(!seen(c)(b), s"duplicate coefficient ($c, $b) in $table")
      seen(c)(b) = true
      w(c)(b) = r.getLong(2)
    }
    HashedLinearModel(dim, w)
  }
}
