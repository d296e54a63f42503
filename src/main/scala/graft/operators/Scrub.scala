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

  /** `+` then digit groups of ≥2, at least two groups (optionally
    * space-separated). Group structure — not a flat `[0-9 ]{6,}` class —
    * so the match cannot extend across a space onto an unrelated trailing
    * single digit ("+12 345 6789 5 minutes" redacts only the number), and
    * a lone short run like "+123" never matches. Greedy-match result is
    * also the longest match, so leftmost-first (Java) and leftmost-longest
    * (RE2/POSIX) engines agree.
    */
  val phoneRe = "\\+[0-9]+(?: ?[0-9]{2,}){2,}"

  // one definition of the staged chain — redactPii and withPiiRedaction
  // MUST share it or the counts ≡ markers invariant silently breaks
  private def redactEmails(text: Column): Column = regexp_replace(text, emailRe, "<EMAIL>")
  private def redactUrls(t1: Column): Column = regexp_replace(t1, urlRe, "<URL>")
  private def redactPhones(t2: Column): Column = regexp_replace(t2, phoneRe, "<PHONE>")

  /** Text with all three PII classes replaced by typed markers. */
  def redactPii(text: Column): Column =
    redactPhones(redactUrls(redactEmails(text)))

  /** Docs annotated with per-class hit counts and the redacted text
    * (`text_redacted`). Counts are long, matching BIGINT counters in SQL
    * engines.
    */
  def withPiiRedaction(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t1 = redactEmails(col(textCol))
    val t2 = redactUrls(t1)
    docs
      .withColumn("n_emails", regexp_count(col(textCol), lit(emailRe)).cast("long"))
      .withColumn("n_urls", regexp_count(t1, lit(urlRe)).cast("long"))
      .withColumn("n_phones", regexp_count(t2, lit(phoneRe)).cast("long"))
      .withColumn("text_redacted", redactPhones(t2))
  }
}
