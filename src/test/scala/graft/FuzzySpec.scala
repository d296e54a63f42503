package graft

import org.apache.spark.sql.functions._
import graft.operators.Fuzzy

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def pairs(strs: Seq[String], minLen: Int = 2): Set[(String, String, Long)] =
    Fuzzy
      .editDistance1Pairs(strs.toDF("s"), "s", minLen = minLen)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet

  test("finds substitution, insertion, and deletion neighbors; isolates the rest") {
    val out = pairs(Seq("cat", "cut", "cart", "ct", "dog"))
    assert(out === Set(
      ("cat", "cut", 1L),  // substitution a→u
      ("cart", "cat", 1L), // insertion of r
      ("cat", "ct", 1L),   // deletion of a
      ("ct", "cut", 1L)    // deletion of u
    )) // cart↔cut and cart↔ct are distance 2; dog is isolated
  }

  test("deletion-collision false positives are killed by the exact verify") {
    // D(ab) ∩ D(ba) = {a, b} but lev(ab, ba) = 2 — the blocking proposes
    // the pair, the levenshtein filter must drop it
    val out = pairs(Seq("ab", "ba"))
    assert(out.isEmpty)
  }

  test("duplicate input rows collapse: output is over the value domain") {
    val out = pairs(Seq("cat", "cat", "cat", "cut"))
    assert(out === Set(("cat", "cut", 1L)))
  }

  test("blocking ≡ brute force on the sf0.001 document vocabulary") {
    val dir = "/root/testdata/sf0.001"
    val toks = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(explode(split(lower(col("text")), "\\s+")).as("s"))
      .where(length(col("s")) >= 2)
      .distinct()
      .persist()
    val brute = toks
      .as("a")
      .join(toks.as("b"), col("a.s") < col("b.s"))
      .where(levenshtein(col("a.s"), col("b.s")) <= 1)
      .select(col("a.s"), col("b.s"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    val blocked = Fuzzy
      .editDistance1Pairs(toks, "s")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    toks.unpersist()
    assert(blocked === brute)
  }

  test("minLen floor drops short strings before blocking") {
    val out = pairs(Seq("a", "b", "ab"), minLen = 2)
    assert(out.isEmpty) // "a"/"b" filtered; "ab" has no neighbor left
  }

  // ---- d ≤ 2 (two-deletion SymSpell blocking) -------------------------

  private def pairs2(strs: Seq[String], minLen: Int = 2): Set[(String, String, Long)] =
    Fuzzy
      .editDistance2Pairs(strs.toDF("s"), "s", minLen = minLen)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet

  test("d=2: catches every two-edit shape — sub+sub, ins+ins, del+sub, transposition") {
    val strs = Seq("cat", "cot", "cog", "carts", "ca", "act", "dish")
    val out = pairs2(strs)
    // each two-edit shape is found with the exact distance
    assert(out.contains(("cat", "cog", 2L)))   // substitution + substitution
    assert(out.contains(("carts", "cat", 2L))) // insertion + insertion
    assert(out.contains(("ca", "cot", 2L)))    // deletion + substitution
    assert(out.contains(("act", "cat", 2L)))   // adjacent transposition (2 in plain lev)
    assert(out.contains(("cat", "cot", 1L)))   // d=1 pairs still emitted
    // dish is isolated; and the whole set matches the brute force square
    assert(!out.exists(p => p._1 == "dish" || p._2 == "dish"))
    val brute = (for {
      a <- strs; b <- strs if a < b
      d = org.apache.commons.text.similarity.LevenshteinDistance.getDefaultInstance
        .apply(a, b).toLong
      if d <= 2
    } yield (a, b, d)).toSet
    assert(out === brute)
  }

  test("d=2: exact verify kills two-deletion collisions above threshold") {
    // "abcd" and "cdab" share the 2-deletion variant "cd" (and "ab")
    // but lev = 4 — blocking proposes, verify must kill
    val out = pairs2(Seq("abcd", "cdab"))
    assert(out.isEmpty)
  }

  test("d=2 blocking ≡ brute force on the sf0.001 document vocabulary") {
    val dir = "/root/testdata/sf0.001"
    val toks = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(explode(split(lower(col("text")), "\\s+")).as("s"))
      .where(length(col("s")) >= 2)
      .distinct()
      .persist()
    val brute = toks
      .as("a")
      .join(toks.as("b"), col("a.s") < col("b.s"))
      .where(levenshtein(col("a.s"), col("b.s")) <= 2)
      .select(col("a.s"), col("b.s"), levenshtein(col("a.s"), col("b.s")).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val blocked = Fuzzy
      .editDistance2Pairs(toks, "s")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    toks.unpersist()
    assert(blocked === brute)
  }

  test("d=2: single-char strings survive the variant comprehension guard") {
    // length-1 strings must not trip sequence(1, 0)'s DESCENDING surprise
    val out = pairs2(Seq("ab", "ax", "xy"), minLen = 2)
    assert(out.contains(("ab", "ax", 1L)))
    assert(out.contains(("ab", "xy", 2L)))
    assert(out.contains(("ax", "xy", 2L)))
  }
}
