package graft

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, NfcNormalize}

class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  private def norm(ss: Seq[String]) = {
    GraftFunctions.register(spark)
    ss.toDF("t")
      .select(GraftFunctions.nfcNormalize($"t").as("n"))
      .collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
  }

  test("decomposed sequences compose to canonical NFC forms") {
    // e + U+0301 -> é (U+00E9); u + U+0308 -> ü (U+00FC)
    val out = norm(Seq("café", "über", "café"))
    assert(out(0) === "café")
    assert(out(1) === "über")
    assert(out(2) === "café") // already-NFC input unchanged
  }

  test("ASCII fast path: identity, and codepoint counts shrink only for decomposed input") {
    GraftFunctions.register(spark)
    val rows = Seq(("ascii only 123", 14), ("café", 4))
      .toDF("t", "n_expected")
      .select(
        length($"t").as("before"),
        length(GraftFunctions.nfcNormalize($"t")).as("after"),
        $"n_expected"
      )
      .collect()
    assert(rows(0).getInt(0) === 14 && rows(0).getInt(1) === 14)
    assert(rows(1).getInt(0) === 5 && rows(1).getInt(1) === 4) // 5 codepoints -> 4
  }

  test("null propagates; expression is codegen'd (not CodegenFallback)") {
    assert(norm(Seq(null)).head === null)
    assert(
      !NfcNormalize(org.apache.spark.sql.catalyst.expressions.Literal("x"))
        .isInstanceOf[CodegenFallback]
    )
  }
}
