package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** foldConfusables / wordListHits (x108): leet folding, collapse rules,
  * and hit multiplicity.
  */
class WordListFilterSpec extends SparkSpec {
  import spark.implicits._

  private def fold(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextAnalysis.foldConfusables(col("t"))).as[String].collect()(0)

  test("leet substitutions fold inside tokens") {
    assert(fold("c4$ino") === "casino")
    assert(fold("PR1ZE!!") === "prize")
    assert(fold("l0ttery 7ickets") === "lottery tickets")
    assert(fold("fr33 5tuff @ home") === "free stuff a home")
  }

  test("non-leet digits and symbols split tokens; whitespace collapses") {
    assert(fold("win2day") === "win day") // 2 is not a confusable
    assert(fold("  a\t\nb  ") === "a b")
    assert(fold("ca.si.no") === "ca si no") // separators are NOT folded away
    assert(fold("") === "")
  }

  test("hits preserve multiplicity and survive obfuscation") {
    val words = Seq("casino", "prize")
    val out = Seq(Tuple1("a PR1ZE and a pr1ze at the c4$ino near the casino"))
      .toDF("t")
      .select(TextAnalysis.wordListHits(col("t"), words).as("h"))
      .collect()(0).getSeq[String](0)
    assert(out.sorted === Seq("casino", "casino", "prize", "prize"))
  }
}
