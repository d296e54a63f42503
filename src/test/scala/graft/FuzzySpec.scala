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
}
