package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for corpus curation: detect and redact emails, URLs, and
  * phone-like digit runs before text reaches a training set.
  *
  * Pure map-side regexp work (codegen'd built-ins, no shuffle, no state).
  * The patterns are deliberately conservative RE2-compatible classes so the
  * same pattern strings run identically on Spark (Java regex) and on
  * RE2-based engines (the DuckDB oracle, re2 scanners in ingest tooling) —
  * no lookarounds, no backreferences.
  *
  * Counts are staged to match the redaction order (emails on the raw text,
  * URLs on the email-redacted text, phones after both), so
  * `n_* == number of <TAG> markers inserted` always holds.
  */
object Scrub {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlRe = "https?://[A-Za-z0-9./_-]+"
  val phoneRe = "\\+[0-9][0-9 ]{6,}[0-9]"

  /** Text with all three PII classes replaced by typed markers. */
  def redactPii(text: Column): Column = {
    val t1 = regexp_replace(text, emailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, urlRe, "<URL>")
    regexp_replace(t2, phoneRe, "<PHONE>")
  }

  /** Docs annotated with per-class hit counts and the redacted text
    * (`text_redacted`). Counts are long, matching BIGINT counters in SQL
    * engines.
    */
  def withPiiRedaction(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t1 = regexp_replace(col(textCol), emailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, urlRe, "<URL>")
    docs
      .withColumn("n_emails", regexp_count(col(textCol), lit(emailRe)).cast("long"))
      .withColumn("n_urls", regexp_count(t1, lit(urlRe)).cast("long"))
      .withColumn("n_phones", regexp_count(t2, lit(phoneRe)).cast("long"))
      .withColumn("text_redacted", regexp_replace(t2, phoneRe, "<PHONE>"))
  }
}
