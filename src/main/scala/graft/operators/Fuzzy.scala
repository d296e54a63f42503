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
    val vals = df
      .select(col(strCol).cast("string").as("s"))
      .where(col("s").isNotNull && length(col("s")) >= minLen)
      .distinct()
    // D(s): index 0 = identity, index j ≥ 1 = s with char j (1-based)
    // deleted. Codegen'd higher-order function — no UDF.
    val variants = vals.select(
      col("s"),
      explode(
        expr(
          "transform(sequence(0, length(s)), " +
            "j -> if(j = 0, s, concat(substr(s, 1, j - 1), substr(s, j + 1))))"
        )
      ).as("v")
    )
    val a = variants.select(col("v"), col("s").as("a_val"))
    val b = variants.select(col("v"), col("s").as("b_val"))
    a.join(b, Seq("v"))
      .where(col("a_val") < col("b_val"))
      .select(col("a_val"), col("b_val"))
      .distinct() // a pair can share several variants
      .withColumn("dist", levenshtein(col("a_val"), col("b_val")).cast("long"))
      .where(col("dist") <= 1) // exact verify kills deletion-collision FPs
  }
}
