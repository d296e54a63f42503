package graft

import graft.operators.DomainStats

/** DomainStats.rollup (x106): counts, integer-div mean, plurality
  * language with lexicographic ties, and the strict block boundary.
  */
class DomainStatsSpec extends SparkSpec {
  import spark.implicits._

  test("rollup: plurality tie-break, integer mean, strict boundary") {
    val docs = Seq(
      // h1: 2×en, 2×es (tie → 'en' lexicographically), avg = 108/4 = 27 → blocked
      ("h1", "en", 30L), ("h1", "en", 20L), ("h1", "es", 30L), ("h1", "es", 28L),
      // h2: avg exactly 54 → NOT blocked (strict <)
      ("h2", "de", 54L), ("h2", "de", 54L),
      // h3: avg 161 div 3 = 53 → blocked
      ("h3", "fr", 53L), ("h3", "fr", 54L), ("h3", "und", 54L)
    ).toDF("host", "lang", "n_tok")
    val out = DomainStats.rollup(docs, blockBelowAvgTok = 54L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("h1").getAs[Long]("n_docs") === 4L)
    assert(out("h1").getAs[Long]("avg_tok") === 27L)
    assert(out("h1").getAs[String]("top_lang") === "en")
    assert(out("h1").getAs[Boolean]("blocked"))
    assert(out("h2").getAs[Long]("avg_tok") === 54L)
    assert(!out("h2").getAs[Boolean]("blocked"))
    assert(out("h3").getAs[Long]("avg_tok") === 53L)
    assert(out("h3").getAs[String]("top_lang") === "fr")
    assert(out("h3").getAs[Boolean]("blocked"))
  }
}
