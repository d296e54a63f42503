package graft.operators

import java.time.LocalDate
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Expiry-selection policies (SURVEY.md §2.3).
  *
  * Input: a DataFrame with a single `expiry: date` column (any multiplicity —
  * we distinct it here). Output: the ≤3 (hourly) or ≤2 (weekly) target dates.
  *
  * Scale note: distinct option expiries are bounded by the listing calendar
  * (dozens), not by data volume, so the final `.collect()` of ≤3 rows is
  * safe at any scale; all heavy lifting (distinct over billions of rows)
  * stays distributed.
  */
object ExpiryPolicy {

  private def distinctActive(expiries: DataFrame, today: LocalDate): DataFrame =
    expiries
      .select(col("expiry"))
      .where(col("expiry").isNotNull)
      .distinct()
      .where(col("expiry") >= lit(java.sql.Date.valueOf(today)))

  /** E0/E1/E2: first 3 distinct future expiries ascending; if none is ≥
    * today, fall back to the single latest past expiry
    * (reference get_current_and_next_expiry, main.py:43-80, fallback 64-65).
    */
  def nearestExpiries(expiries: DataFrame, today: LocalDate, n: Int = 3): Seq[LocalDate] = {
    val active = distinctActive(expiries, today)
      .orderBy(col("expiry").asc)
      .limit(n)
      .collect()
      .map(_.getDate(0).toLocalDate)
      .toSeq
    if (active.nonEmpty) active
    else
      expiries
        .select(col("expiry"))
        .where(col("expiry").isNotNull)
        .agg(max(col("expiry")).as("m"))
        .collect()
        .headOption
        .filter(!_.isNullAt(0))
        .map(_.getDate(0).toLocalDate)
        .toSeq
  }

  /** Spark `dayofweek`: 1=Sunday … 6=Friday. */
  private val isFriday: Column = dayofweek(col("expiry")) === 6

  /** W1/W2 Friday policy (reference get_current_and_next_friday_expiry,
    * deltaweekly.py:43-111):
    *   - active = distinct expiries ≥ today, ascending;
    *   - W1 = first Friday with ≥2 active expiries strictly before it
    *     (dw:70-81); fallback = first Friday at all (dw:84-86);
    *   - W2 = first Friday strictly after W1 (dw:89-94), may be absent.
    *
    * The "count strictly before" rule is a cumulative count window over the
    * distinct actives (SURVEY.md §2.3). The window is unpartitioned, which is
    * fine: it runs on the already-distinct expiry set (bounded, tiny).
    */
  def fridayExpiries(expiries: DataFrame, today: LocalDate): Seq[LocalDate] = {
    val w = Window.orderBy(col("expiry"))
    val active = distinctActive(expiries, today)
      .withColumn("n_before", row_number().over(w) - 1)
    val fridays = active
      .where(isFriday)
      .orderBy(col("expiry"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getInt(1)))
      .toSeq
    if (fridays.isEmpty) return Seq.empty
    val w1 = fridays.find(_._2 >= 2).map(_._1).getOrElse(fridays.head._1)
    val w2 = fridays.map(_._1).find(_.isAfter(w1))
    Seq(w1) ++ w2
  }
}
