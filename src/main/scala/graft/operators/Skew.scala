package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for joins whose key distribution is too skewed for
  * a plain hash join and whose build side is too big to broadcast.
  *
  * AQE's skew-join splitting (on in GraftSession) handles MOST skew at
  * runtime by splitting oversized sort-merge partitions; salting is the
  * explicit fallback for the pathological tail — one key carrying an
  * arbitrarily large fraction of the data (every LSH hot bucket, every
  * "null-like" join key) — because it bounds the per-task share of a hot
  * key BY CONSTRUCTION instead of after stats detection:
  *
  *   skewed side:  salt ∈ [0, S) sprayed per ROW (hash of the full row +
  *                 position) — a hot key's rows spread across S partitions;
  *   other side:   each row replicated S times (one per salt value);
  *   join on (keys…, salt), drop the salt — row-for-row identical to the
  *   unsalted join (spec-pinned), at the cost of S× the other side's
  *   shuffle volume. Size S to the worst hot-key ratio, not to the table.
  */
object Skew {

  /** Join `skewed` with `other` on `keys`, spreading each hot key over
    * `salt` partitions. Result is row-identical to
    * `skewed.join(other, keys, joinType)` for inner/left joins.
    */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      salt: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    // per-row deterministic spray: hash every column plus a partition-local
    // position so identical rows still spread
    val sprayed = skewed.withColumn(
      "__salt",
      pmod(
        xxhash64(struct(skewed.columns.map(col).toSeq: _*), spark_partition_id(), monotonically_increasing_id()),
        lit(salt)
      ).cast("int")
    )
    val replicated = other.withColumn(
      "__salt",
      explode(array((0 until salt).map(lit): _*))
    )
    sprayed
      .join(replicated, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
