package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) matching by symmetric-deletion blocking — the
  * SymSpell family (Garbe's symmetric delete algorithm; the same blocking
  * FastSS / Mor-Fraenkel neighborhood generation uses).
  *
  * Why blocking at all: a naive edit-distance join is all-pairs — O(n²)
  * levenshtein calls, a non-starter at corpus scale. For max distance 1,
  * the deletion neighborhood D(s) = { s } ∪ { s with one char deleted }
  * gives a PROVABLY COMPLETE equi-join key:
  *
  *   lev(s, t) ≤ 1  ⇒  D(s) ∩ D(t) ≠ ∅
  *
  *   - substitution at position i: deleting position i from both sides
  *     yields the same string — shared variant.
  *   - insertion (t = s + one char): deleting the inserted char from t
  *     yields s, which is s's identity variant.
  *   - equal strings share the identity variant.
  *
  * So exploding |s|+1 variants per string and equi-joining on the variant
  * finds EVERY candidate pair; a final exact `levenshtein` filter removes
  * the false positives (distinct strings whose deletions collide, e.g.
  * "ab" / "ba" via "a"... no: "ab"→{ab,b,a}, "ba"→{ba,a,b} — share "a",
  * lev=2 — exactly the false-positive class the verify step kills).
  *
  * Scale design (100 TB posture):
  *   - Map-side variant generation (a codegen'd `transform` over a
  *     `sequence`, no UDF), ONE shuffle keyed by variant, candidate
  *     dedup, then an exact verify on the candidates only. Candidate
  *     count per string is length-bounded; nothing is all-pairs.
  *   - Hot-variant hazard: very short strings produce high-collision
  *     variants (every 2-char string shares 1-char deletion variants
  *     with ~alphabet-size others). `minLen` drops strings below a
  *     length floor before blocking — the standard SymSpell guard; at
  *     web scale pair the floor with a frequency cap on the variant
  *     (the same df≤maxDf prune [[Dedup]] applies to shingles).
  *   - Self-join pair explosion within one variant bucket is quadratic
  *     in the bucket, which is why the candidate key is the FULL
  *     deletion variant (high selectivity) rather than a prefix/length
  *     band (low selectivity).
  */
object Fuzzy {

  /** The distinct value domain of `strCol` under the `minLen` floor —
    * one column `s`. Shared by the batch miners and the streaming index
    * maintainer so both see identical domains.
    */
  def valueDomain(df: DataFrame, strCol: String, minLen: Int = 2): DataFrame =
    df
      .select(col(strCol).cast("string").as("s"))
      .where(col("s").isNotNull && length(col("s")) >= minLen)
      .distinct()

  /** D(s) exploded: (v, s) for every member of the ≤1-deletion
    * neighborhood — index 0 = identity, index j ≥ 1 = s with char j
    * (1-based) deleted. Codegen'd higher-order function — no UDF. This
    * is the INDEX FRAME of the SymSpell posture: map-only per string,
    * computed once at ingest ([[graft.streaming.FuzzyStream]]) or once
    * per batch run ([[editDistance1Pairs]]).
    */
  def deletionVariants1(vals: DataFrame): DataFrame =
    vals.select(
      col("s"),
      explode(
        expr(
          "transform(sequence(0, length(s)), " +
            "j -> if(j = 0, s, concat(substr(s, 1, j - 1), substr(s, j + 1))))"
        )
      ).as("v")
    )

  /** The verify-and-shape tail shared by every candidate source at any
    * distance: unordered pairs, per-pair dedup (a pair can share several
    * variants), exact levenshtein ≤ `maxDist` — ONE definition so the
    * d=1 and d=2 surfaces (and the streaming maintainer) cannot diverge
    * on the domain-filter or verify semantics.
    */
  private[graft] def verifiedPairs(cand: DataFrame, maxDist: Int): DataFrame =
    cand
      .where(col("a_val") < col("b_val"))
      .select(col("a_val"), col("b_val"))
      .distinct()
      .withColumn("dist", levenshtein(col("a_val"), col("b_val")).cast("long"))
      .where(col("dist") <= maxDist) // exact verify kills deletion-collision FPs

  /** d ≤ 1 alias of [[verifiedPairs]] (the streaming maintainer's entry). */
  private[graft] def verifiedPairs1(cand: DataFrame): DataFrame =
    verifiedPairs(cand, 1)

  /** All unordered pairs of distinct values of `strCol` at edit distance
    * ≤ 1. Input rows are deduplicated on the string first, so the output
    * is over the value domain: (a_val < b_val, dist ∈ {1}) — distance-0
    * pairs are identical strings and are collapsed by the distinct, so
    * every emitted pair has dist exactly 1.
    *
    * Returns columns: a_val, b_val, dist (long).
    */
  def editDistance1Pairs(
      df: DataFrame,
      strCol: String,
      minLen: Int = 2
  ): DataFrame = {
    val variants = deletionVariants1(valueDomain(df, strCol, minLen))
    val a = variants.select(col("v"), col("s").as("a_val"))
    val b = variants.select(col("v"), col("s").as("b_val"))
    verifiedPairs1(a.join(b, Seq("v")))
  }

  /** All unordered pairs of distinct values of `strCol` at edit distance
    * ≤ 2 — the distance real typo/OCR dedup needs (single-key slips are
    * d=1; transpositions, doubled OCR strokes and fat-finger pairs are
    * d=2). Same symmetric-deletion blocking, two deletions deep:
    *
    *   lev(s, t) ≤ d  ⇒  D_d(s) ∩ D_d(t) ≠ ∅
    *
    * (Mor & Fraenkel 1982; Garbe's SymSpell): fix an optimal alignment of
    * cost ≤ d — it marks ≤ d positions in s (substituted or deleted) and
    * ≤ d positions in t (substituted or inserted); deleting the marked
    * positions from each side leaves the SAME common subsequence, a
    * member of both deletion neighborhoods. So the equi-join on the
    * ≤2-deletion variant set finds every candidate, and the exact
    * `levenshtein` verify removes collisions (two deletions collide far
    * more often than one — e.g. any two strings sharing a length-(L−2)
    * subsequence — which is exactly why the verify is mandatory, not
    * optional, at d=2).
    *
    * Candidate growth vs d=1 (documented per the r11 verdict): |D_2(s)| ≤
    * 1 + L + C(L,2) variants per string (quadratic in length, still
    * corpus-linear overall), and bucket collision rates rise, so the
    * `minLen` floor matters more — at web scale pair it with a
    * variant-frequency cap exactly as [[editDistance1Pairs]]'s scaladoc
    * prescribes. Everything stays ONE shuffle keyed by the variant; no
    * all-pairs surface anywhere.
    *
    * Returns columns: a_val, b_val, dist (long, ∈ {1, 2}).
    */
  def editDistance2Pairs(
      df: DataFrame,
      strCol: String,
      minLen: Int = 2
  ): DataFrame = {
    val vals = valueDomain(df, strCol, minLen)
    // D_2(s) = {s} ∪ {one char deleted} ∪ {two chars deleted, i < j}.
    // All codegen'd higher-order functions; array_distinct collapses
    // coinciding variants (deleting either of a doubled char) so a pair
    // is not multiplied before the post-join distinct.
    val del1 =
      "transform(sequence(1, length(s)), " +
        "i -> concat(substr(s, 1, i - 1), substr(s, i + 1)))"
    // guard: sequence(a, b) with a > b is DESCENDING in Spark, so the
    // two-deletion comprehension must be fenced off for length-1 strings
    val del2 =
      "if(length(s) >= 2, " +
        "flatten(transform(sequence(1, length(s) - 1), " +
        "i -> transform(sequence(i + 1, length(s)), " +
        "j -> concat(substr(s, 1, i - 1), substr(s, i + 1, j - i - 1), substr(s, j + 1))))), " +
        "array())"
    val variants = vals.select(
      col("s"),
      explode(expr(s"array_distinct(concat(array(s), $del1, $del2))")).as("v")
    )
    val a = variants.select(col("v"), col("s").as("a_val"))
    val b = variants.select(col("v"), col("s").as("b_val"))
    verifiedPairs(a.join(b, Seq("v")), 2)
  }
}
