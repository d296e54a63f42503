package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact per-group `ntile` without a per-group global sort — the
  * [[GlobalRank]] idea applied at group granularity, for the CCNet
  * head/middle/tail bucketing (x103) where one language dominates the
  * corpus and `Window.partitionBy(lang)` would funnel most of 100 TB
  * through single tasks.
  *
  * Decomposition (all exact, all deterministic):
  *
  *   1. the per-(group, score) CLASS table — one hash aggregation;
  *      bounded by distinct score values (integer ppm ⇒ ≤ 10⁶ per
  *      group), not by rows;
  *   2. class start offsets — a running sum over the class table,
  *      windowed per group: the window input is the CLASS table, so the
  *      biggest per-group partition is "distinct scores", a six-order
  *      cut from "documents in the head language";
  *   3. within-class position — `row_number` partitioned by (group,
  *      score): the fine key, whose skew is bounded by the largest TIE
  *      class, not the largest group;
  *   4. rank = start + position; the tile comes from closed-form ntile
  *      arithmetic over (rank, group size) — SQL-standard semantics
  *      (first `n mod t` tiles get the extra row), bit-identical to
  *      `ntile()` in Spark and DuckDB for any total order.
  */
object GroupNtile {

  /** `df` plus `rank` (1-based within `groupCol` under (`scoreCol` DESC,
    * `tieCol` ASC)) and `tile` (1..`tiles`, SQL ntile semantics).
    * `scoreCol` must be group-comparable (its values form the tie
    * classes); `tieCol` must make the order total within a class.
    */
  def withGroupNtile(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      tieCol: String,
      tiles: Int
  ): DataFrame = {
    require(tiles >= 1, s"tiles must be >= 1, got $tiles")
    val cls = df
      .groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("graft_nt_c"))
    val perGroup = Window.partitionBy(col(groupCol))
    val starts = cls
      .withColumn(
        "graft_nt_start",
        coalesce(
          sum(col("graft_nt_c")).over(
            perGroup
              .orderBy(col(scoreCol).desc)
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("graft_nt_n", sum(col("graft_nt_c")).over(perGroup))
      .drop("graft_nt_c")
    val pos = df.withColumn(
      "graft_nt_rn",
      row_number().over(
        Window.partitionBy(col(groupCol), col(scoreCol)).orderBy(col(tieCol))))
    // SQL ntile: the first `rem` tiles hold q+1 rows, the rest q; a
    // group smaller than `tiles` degenerates to tile = rank (q = 0 —
    // the greatest(q, 1) guard keeps the second branch's division
    // defined, though rank <= (q+1)*rem always routes those rows to
    // branch one). All `div` — Column./ is fractional and has no place
    // near a driver-hashed integer.
    //
    // The class join is NULL-SAFE (<=>): groupBy puts NULL groups/scores
    // in their own class and the definitional window form ranks them
    // (desc ⇒ nulls last), so an equi-join here would silently drop
    // exactly those rows a caller with nullable scores expects ranked.
    val startsR = starts
      .withColumnRenamed(groupCol, "graft_nt_g")
      .withColumnRenamed(scoreCol, "graft_nt_s")
    pos
      .join(
        startsR,
        col(groupCol) <=> col("graft_nt_g") && col(scoreCol) <=> col("graft_nt_s"))
      .drop("graft_nt_g", "graft_nt_s")
      .withColumn(
        "rank",
        (col("graft_nt_start") + col("graft_nt_rn")).cast(LongType))
      .withColumn("graft_nt_q", expr(s"graft_nt_n div ${tiles}L"))
      .withColumn("graft_nt_rem", col("graft_nt_n") % tiles.toLong)
      .withColumn(
        "tile",
        expr(
          """CAST(CASE
            |  WHEN rank <= (graft_nt_q + 1) * graft_nt_rem
            |    THEN (rank - 1) div (graft_nt_q + 1)
            |  ELSE graft_nt_rem
            |    + (rank - 1 - (graft_nt_q + 1) * graft_nt_rem)
            |      div greatest(graft_nt_q, 1L)
            |END + 1 AS BIGINT)""".stripMargin))
      .drop("graft_nt_start", "graft_nt_n", "graft_nt_rn", "graft_nt_q", "graft_nt_rem")
  }
}
