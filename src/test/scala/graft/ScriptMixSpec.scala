package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.functions.GraftFunctions

/** ScriptCounts (x110): codepoint classes, surrogate handling, and the
  * class boundaries.
  */
class ScriptMixSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def counts(s: String): (Int, Int, Int, Int, Int, Int) = {
    val r = Seq(Tuple1(s)).toDF("t")
      .select(GraftFunctions.scriptCounts(col("t")).as("c"))
      .collect()(0).getStruct(0)
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))
  }

  test("hand counts across all six classes") {
    assert(counts("ab привет 你好 12 .,") === ((2, 6, 2, 2, 4, 2)))
    assert(counts("") === ((0, 0, 0, 0, 0, 0)))
    assert(counts("日本語のテスト") === ((0, 0, 7, 0, 0, 0))) // kanji + kana
  }

  test("extended Latin and non-BMP count as other; surrogate pairs once") {
    assert(counts("é") === ((0, 0, 0, 0, 0, 1))) // extended latin → other
    // U+1F600 (emoji, non-BMP): ONE codepoint of other, not two units
    assert(counts("a😀b") === ((2, 0, 0, 0, 0, 1)))
  }

  test("boundaries: U+0400/U+04FF in, U+03FF/U+0500 out; CJK block edges") {
    assert(counts("Ѐӿ") === ((0, 2, 0, 0, 0, 0)))
    assert(counts("ϿԀ") === ((0, 0, 0, 0, 0, 2)))
    assert(counts("一鿿぀ヿ") === ((0, 0, 4, 0, 0, 0)))
    assert(counts("䷿ꀀ") === ((0, 0, 0, 0, 0, 2)))
  }

  test("null in, null out") {
    val out = Seq(Tuple1(null: String)).toDF("t")
      .select(GraftFunctions.scriptCounts(col("t"))).collect()
    assert(out(0).isNullAt(0))
  }
}
