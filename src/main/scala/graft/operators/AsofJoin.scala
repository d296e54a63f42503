package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: attach to every left row the LATEST right row of
  * the same key with `right.ts <= left.ts` (the time-series "state at
  * event time" join Spark has no built-in operator for).
  *
  * Formulation — union + running `last(ignoreNulls)` window, the scalable
  * composition of existing operators (preferred over a custom SparkPlan,
  * per the build rules, because built-ins fully express the semantics):
  *   1. tag right rows side=0, left rows side=1, wrap each side's columns
  *      in a struct so both sides union to one schema;
  *   2. ONE shuffle, keyed by the join key, ordering each partition by
  *      (ts, side) — right-before-left at equal ts gives `<=` semantics
  *      (matching DuckDB `ASOF JOIN ... ON l.ts >= r.ts`, which this
  *      operator is oracled against);
  *   3. running `last(right_struct, ignoreNulls)` over rows-unbounded-
  *      preceding carries the latest state forward to each left row.
  *
  * Why not a range-condition join: Spark plans `l.ts >= r.ts` as a
  * broadcast-nested-loop producing |L|·|R| comparisons per key before a
  * rank filter. The union+window form is O((|L|+|R|) log) per key — it is
  * the shape that survives a 100× scale-up. Skewed keys degrade to one
  * fat partition like any keyed window; pre-split hot keys with [[Skew]]
  * if a single key's row count breaks the task budget.
  *
  * Determinism contract: the right side must have at most ONE row per
  * (key, ts) — with duplicates, "the latest right row" is ill-defined and
  * the sort order among them (hence the matched payload) is
  * partition-dependent. Pre-dedupe with `Snapshot.keepLastBy` when the
  * state stream can repeat a timestamp.
  */
object AsofJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String
  ): DataFrame = {
    val rightPayload = right.columns.filterNot(keyCols.contains).toSeq
    require(
      left.columns.toSet.intersect(rightPayload.toSet).isEmpty,
      s"rename right columns colliding with left: ${left.columns.toSet.intersect(rightPayload.toSet)}"
    )

    def structType(df: DataFrame, cols: Seq[String]) =
      df.select(struct(cols.map(col): _*)).schema.head.dataType

    val lType = structType(left, left.columns.toSeq)
    val rType = structType(right, rightPayload)

    val keyed: Seq[Column] = keyCols.map(col)
    val lTagged = left.select(
      keyed ++ Seq(
        col(leftTs).as("__ts"),
        lit(1).as("__side"),
        struct(left.columns.toSeq.map(col): _*).as("__l"),
        lit(null).cast(rType).as("__r")
      ): _*
    )
    val rTagged = right.select(
      keyed ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        lit(null).cast(lType).as("__l"),
        struct(rightPayload.map(col): _*).as("__r")
      ): _*
    )

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged
      .unionByName(rTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__l.*"), col("__m.*"))
  }

  /** Forward as-of join: the EARLIEST right row with `right.ts >= left.ts`
    * per key. Implemented by time negation over [[backward]] — negating
    * both timestamps turns "latest ≤" into "earliest ≥" exactly (ties
    * included), so the two directions share one code path and one set of
    * scale properties. Numeric (epoch) timestamps only.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String
  ): DataFrame = {
    val out = backward(
      left.withColumn(leftTs, -col(leftTs)),
      right.withColumn(rightTs, -col(rightTs)),
      keyCols,
      leftTs,
      rightTs
    )
    out
      .withColumn(leftTs, -col(leftTs))
      .withColumn(rightTs, -col(rightTs))
  }
}
