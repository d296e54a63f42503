package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Curation, QualityFilter, TextAnalysis}

/** Property pin for Curation's SCREEN-FIRST EQUIVALENCE proof: the
  * registered x120 plan screens (quality/lang) BEFORE the md5 dedup
  * window, while the reference order is dedup-first — claimed identical
  * because the screens are text-functions and an md5 class shares its
  * text. This spec executes BOTH formulations over random corpora with
  * engineered md5-class collisions spanning sources and doc-id orders
  * (the case where a wrong proof would shift survivors between sources
  * and flip cap quotas) and requires set equality.
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  /** The dedup-FIRST reference formulation: min-id survivor per md5 over
    * ALL docs, then the screens, then the same per-source cap.
    */
  private def dedupFirst(
      docs: org.apache.spark.sql.DataFrame,
      cap: Int
  ): org.apache.spark.sql.DataFrame = {
    val surv = docs
      .withColumn(
        "rn_dup",
        row_number().over(Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .where(col("rn_dup") === 1)
      .drop("rn_dup")
    val gated = QualityFilter
      .gopherFlags(surv)
      .where(col("keep"))
      .select(
        col("doc_id"), col("source"),
        md5(col("text")).as("text_md5"),
        TextAnalysis.langId(TextAnalysis.tokens(col("text"))).as("lang_pred"),
        TextAnalysis.bpeishTokenCount(col("text")).cast("long").as("n_tokens"))
      .where(col("lang_pred") =!= "und")
    gated
      .withColumn(
        "rn_cap",
        row_number().over(
          Window.partitionBy(col("source")).orderBy(col("text_md5"), col("doc_id"))))
      .where(col("rn_cap") <= cap)
      .select(col("source"), col("doc_id"), col("lang_pred"), col("n_tokens"))
  }

  // text generator biased so SOME docs pass the Gopher gate (30-90
  // tokens, mean length in [3.0, 5.2], >= 2 distinct en stopwords) and
  // some fail each rule
  private val passingText: Gen[String] = for {
    n <- Gen.choose(30, 60)
    words <- Gen.listOfN(n - 4, Gen.oneOf("data", "word", "green", "stack", "pile", "list"))
  } yield ("the and of to " + words.mkString(" "))
  private val failingText: Gen[String] = Gen.oneOf(
    Gen.const("too short"), // count rule
    Gen.listOfN(40, Gen.const("verylongtokenthatbreaksmeanlen")).map(_.mkString(" ")),
    Gen.listOfN(40, Gen.const("zz")).map(w => "the and " + w.mkString(" "))) // mean-len low
  private val corpusGen: Gen[List[(Long, String, String)]] = for {
    n <- Gen.choose(10, 30)
    base <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 10000L)
      src <- Gen.oneOf("a", "b", "c")
      t <- Gen.frequency(3 -> passingText, 1 -> failingText)
    } yield (id, src, t))
    // engineered md5-class collisions: duplicate texts under fresh ids
    // and DIFFERENT sources, both above and below the original id
    dups <- Gen.someOf(base).map(_.take(6).zipWithIndex.map {
      case ((id, _, t), i) =>
        (if (i % 2 == 0) id / 2 else 20000L + id, if (i % 2 == 0) "d" else "e", t)
    })
  } yield (base ++ dups).distinctBy(_._1) // doc ids unique

  test("screen-first x120 formulation ≡ dedup-first reference on random corpora") {
    val params = Gen.Parameters.default
    for (i <- 1 to 8) {
      val corpus = corpusGen(params, Seed(1000L + i)).get
      val df = corpus.toDF("doc_id", "source", "text")
      for (cap <- Seq(1, 3, 100)) {
        val fast = Curation.curate(df, cap).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
        val ref = dedupFirst(df, cap).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
        assert(fast === ref, s"formulations diverged at seed ${1000 + i}, cap $cap")
      }
    }
  }
}
