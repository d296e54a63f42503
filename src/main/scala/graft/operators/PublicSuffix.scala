package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Public-suffix (eTLD+1 / registrable-domain) extraction — the URL
  * machinery between host normalization (x95) and domain rollups
  * (x106): "example.co.uk" and "sub.example.co.uk" must aggregate to
  * the same REGISTRABLE domain, and naive "last two labels" is wrong
  * for exactly the hosts that matter (co.uk, github.io, the `*.ck`
  * wildcard family). Implements the publicsuffix.org algorithm over an
  * embedded rule list: all three PSL rule kinds —
  *
  *   - plain rules ("co.uk"): match their exact label suffix;
  *   - wildcard rules ("*.ck"): match any single label + the literal
  *     tail;
  *   - exception rules ("!www.ck"): match exactly and override any
  *     wildcard — their public suffix drops the leftmost label;
  *
  * prevailing rule = exception first, else most labels; no match falls
  * back to the PSL's implicit `*` (the last label is public).
  * Registrable domain = public suffix + one label, NULL when the host
  * IS a public suffix (the PSL contract).
  *
  * Spark-first shape: per host, generate the ≤ maxRuleLabels candidate
  * suffixes AND their single-label-wildcarded forms (pure array
  * builtins: split / slice / concat_ws / transform), explode, ONE
  * broadcast join against the rule table (|rules| rows), one hash-agg
  * argmax `min(struct(exc?0:1, −p))` per host, LEFT-join back for the
  * default. Map-side everything; the rule table is the only broadcast
  * state. The production swap-in is the full ~9k-rule PSL snapshot in
  * the same table — nothing in the plan changes.
  */
object PublicSuffix {

  /** The embedded demonstration rule list (every PSL kind present).
    * SHARED with the x109 oracle builder so both sides match by
    * construction.
    */
  val defaultRules: Seq[String] = Seq(
    "com", "org", "net", "io", "uk", "co.uk", "ac.uk",
    "au", "com.au", "github.io", "ck", "*.ck", "!www.ck")

  /** (match key, is_exception, is_wildcard, public-suffix label count)
    * for a PSL rule string — the normalization both engines share.
    */
  def ruleRow(rule: String): (String, Boolean, Boolean, Int) = {
    val exc = rule.startsWith("!")
    val key = if (exc) rule.substring(1) else rule
    val wild = key.startsWith("*.")
    val labels = key.split('.').length
    // an exception rule's public suffix drops its leftmost label
    (key, exc, wild, if (exc) labels - 1 else labels)
  }

  /** `df` plus `public_suffix` and `registrable` columns derived from
    * `hostCol`. Hosts must be normalized lowercase (x95's output).
    *
    * Output-column OWNERSHIP: this operator writes `public_suffix` and
    * `registrable` — a caller column of either name would be silently
    * replaced by `withColumn`, so their absence is required. A NULL host
    * yields NULL in both derived columns (not the `concat_ws`-over-NULL
    * empty string).
    */
  def withRegistrableDomain(
      df: DataFrame,
      hostCol: String,
      rules: Seq[String] = defaultRules
  ): DataFrame = {
    val s = df.sparkSession
    val parsed = rules.map(ruleRow)
    val maxL = parsed.map { case (k, _, _, _) => k.split('.').length }.max
    val ruleDf = s
      .createDataFrame(parsed.toIndexedSeq)
      .toDF("rule_key", "is_exc", "is_wild", "p_labels")

    val labels = split(col(hostCol), "\\.")
    val n = size(labels)
    // candidate literal suffixes per length i ∈ [1, min(n, maxL)]; the
    // wildcarded form (leftmost label → '*') derives from each suffix
    val exploded = df
      .select(col(hostCol).as("graft_psl_host"))
      .distinct()
      .select(
        col("graft_psl_host"),
        explode(
          transform(
            sequence(lit(1), least(size(split(col("graft_psl_host"), "\\.")), lit(maxL))),
            i =>
              concat_ws(".", slice(split(col("graft_psl_host"), "\\."), -i, i))))
          .as("suffix"))
      .withColumn(
        "wild",
        when(size(split(col("suffix"), "\\.")) >= 2,
          concat(lit("*."),
            expr("concat_ws('.', slice(split(suffix, '\\\\.'), 2, size(split(suffix, '\\\\.')) - 1))"))))
      // two EQUI-join keys per suffix (literal / wildcarded) instead of
      // an OR-condition join — keeps the rule lookup a BroadcastHashJoin,
      // never a nested loop (hosts can't contain '*', so the keys are
      // disjoint by construction)
      .select(
        col("graft_psl_host"),
        explode(array(
          struct(col("suffix").as("key"), lit(false).as("kw")),
          struct(col("wild").as("key"), lit(true).as("kw")))).as("c"))
      .where(col("c.key").isNotNull)
      .select(col("graft_psl_host"), col("c.key").as("key"), col("c.kw").as("kw"))
    val matches = exploded
      .join(
        broadcast(ruleDf),
        col("rule_key") === col("key") && col("is_wild") === col("kw"))
      .groupBy(col("graft_psl_host"))
      .agg(min(struct(
        when(col("is_exc"), 0).otherwise(1).as("exc_rank"),
        (-col("p_labels")).as("np"))).as("best"))
      .select(
        col("graft_psl_host").as(hostCol),
        (-col("best.np")).as("graft_psl_p"))

    // derived columns are guarded on a non-null host: concat_ws over a
    // null slice would otherwise render a NULL host as public_suffix ""
    df.join(matches, Seq(hostCol), "left")
      .withColumn("graft_psl_p2", coalesce(col("graft_psl_p"), lit(1)))
      .withColumn(
        "public_suffix",
        when(col(hostCol).isNotNull,
          concat_ws(".", slice(labels, -col("graft_psl_p2"), col("graft_psl_p2")))))
      .withColumn(
        "registrable",
        when(col(hostCol).isNotNull && n > col("graft_psl_p2"),
          concat_ws(".",
            slice(labels, -(col("graft_psl_p2") + 1), col("graft_psl_p2") + 1))))
      .drop("graft_psl_p", "graft_psl_p2")
  }
}
