package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{DistinctSketch, LinearModel, TextAnalysis}
import graft.operators.LinearModel.HashedLinearModel

/** The learned-model inference operator: hand-computed scores on a tiny
  * explicit model (the spec half of the x126 contract — the oracle half
  * replays the planted model closed-form in DuckDB), the planted-weight
  * formula, the argmax tie rule, the map-only plan shape, and the
  * curation wiring's screen-order equivalence.
  */
class LinearModelSpec extends SparkSpec {
  import spark.implicits._

  // a fully explicit 2-class, dim-4 model: w(c)(b) chosen so every bucket
  // discriminates and ties are constructible
  private val w0 = Array(10L, -3L, 7L, 100L)
  private val w1 = Array(2L, 5L, -1L, 100L)
  private val tiny = HashedLinearModel(4, Array(w0, w1))

  private def b(feat: String): Int =
    (DistinctSketch.hash40Scala("ft:" + feat) % 4L).toInt

  test("hand-computed dots, pred, margin on crafted docs") {
    val docs = Seq((1L, "a b a"), (2L, "a"), (3L, "")).toDF("doc_id", "text")
    val got = LinearModel
      .classify(docs, "text", tiny)
      .select("doc_id", "n_feats", "dot0", "dot1", "pred", "margin")
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap

    // doc 1: features are every OCCURRENCE of [a, b, a] ++ ["a b", "b a"]
    val f1 = Seq("a", "b", "a", "a b", "b a")
    val d10 = f1.map(f => w0(b(f))).sum
    val d11 = f1.map(f => w1(b(f))).sum
    assert(got(1L).getLong(1) === 5L)
    assert(got(1L).getLong(2) === d10)
    assert(got(1L).getLong(3) === d11)
    assert(got(1L).getLong(4) === (if (d11 > d10) 1L else 0L))
    assert(got(1L).getDouble(5) === (d11 - d10).toDouble / (1000.0 * 5.0))

    // doc 2: single token — unigram only, no bigrams
    assert(got(2L).getLong(1) === 1L)
    assert(got(2L).getLong(2) === w0(b("a")))
    assert(got(2L).getLong(3) === w1(b("a")))

    // doc 3: empty text tokenizes to [""] (split-of-trim convention) —
    // one feature, never a crash, never a NULL
    assert(got(3L).getLong(1) === 1L)
    assert(got(3L).getLong(2) === w0(b("")))
  }

  test("argmax ties go to the smallest class index") {
    // bucket 3 has w0 = w1 = 100: any doc hashing only to bucket 3 ties.
    // Find a token whose unigram lands in bucket 3 (search a small space).
    val tok = (0 until 1000).map(i => s"t$i").find(t => b(t) == 3).get
    val got = LinearModel
      .classify(Seq((1L, tok)).toDF("doc_id", "text"), "text", tiny)
      .select("dot0", "dot1", "pred")
      .head()
    assert(got.getLong(0) === 100L && got.getLong(1) === 100L)
    assert(got.getLong(2) === 0L, "tie must keep the smallest class")
  }

  test("three-class argmax: strict-> keep rule across all positions") {
    // dim 1: every feature lands in bucket 0, so dots are n_feats * w(c)(0)
    val m3 = HashedLinearModel(1, Array(Array(5L), Array(9L), Array(9L)))
    val got = LinearModel
      .classify(Seq((1L, "x y")).toDF("doc_id", "text"), "text", m3)
      .select("dot0", "dot1", "dot2", "pred")
      .head()
    assert(got.getLong(0) === 15L && got.getLong(1) === 27L && got.getLong(2) === 27L)
    assert(got.getLong(3) === 1L, "first of the tied maxima wins")
  }

  test("binary expression path ≡ the HOF algebra on real corpus text") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .limit(60)
    val m = LinearModel.planted("q", 2, 512)
    val fast = LinearModel
      .classify(docs, "text", m)
      .select("doc_id", "n_feats", "dot0", "dot1")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val hof = LinearModel
      .classifyHof(docs, "text", m)
      .select("doc_id", "n_feats", "dot0", "dot1")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(fast === hof)
    // whitespace-edge cases through both paths: leading tab (trim strips
    // 0x20 only → leading empty token), multi-space runs, trailing spaces
    val tricky = Seq((1L, "\ta b\n"), (2L, "  x   y  "), (3L, " ")).toDF("doc_id", "text")
    val f2 = LinearModel.classify(tricky, "text", m)
      .select("doc_id", "n_feats", "dot0", "dot1").collect().map(_.toSeq).toSet
    val h2 = LinearModel.classifyHof(tricky, "text", m)
      .select("doc_id", "n_feats", "dot0", "dot1").collect().map(_.toSeq).toSet
    assert(f2 === h2)
  }

  test("multi-class expression path ≡ the HOF algebra on real corpus text (C = 4)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .limit(60)
    val m = LinearModel.planted("m", 4, 256)
    def dots(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] = df
      .select("doc_id", "n_feats", "dot0", "dot1", "dot2", "dot3")
      .collect()
      .map(r => r.getLong(0) -> (1 to 5).map(r.getLong))
      .toMap
    val fast = dots(LinearModel.classify(docs, "text", m))
    val hof = dots(LinearModel.classifyHof(docs, "text", m))
    assert(fast.size === 60)
    assert(fast === hof)
    // pred re-derived independently: smallest index among the maxima
    val preds = LinearModel.classify(docs, "text", m)
      .select("doc_id", "pred").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    fast.foreach { case (id, ns) =>
      val ds = ns.drop(1)
      assert(preds(id) === ds.indexOf(ds.max).toLong, s"doc $id dots=$ds")
    }
    // whitespace edges through both paths (trim strips 0x20 only; split
    // keeps trailing empties; single-token docs contribute unigrams only)
    val tricky = Seq((1L, "\ta b\n"), (2L, "  x   y  "), (3L, " "), (4L, "solo"))
      .toDF("doc_id", "text")
    assert(dots(LinearModel.classify(tricky, "text", m)) ===
      dots(LinearModel.classifyHof(tricky, "text", m)))
  }

  test("multi-class classify stays map-only: zero exchanges at C = 4") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val plan = LinearModel
      .classify(docs, "text", LinearModel.planted("m", 4, 256))
      .queryExecution.executedPlan
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty, s"full-corpus scorer must not exchange:\n$plan")
  }

  test("planted weights replay the hash40 closed form, bounded range") {
    val m = LinearModel.planted("q", classes = 2, dim = 512)
    assert(m.classes === 2 && m.dim === 512)
    for (c <- 0 until 2; bb <- Seq(0, 1, 17, 511)) {
      val expect = DistinctSketch.hash40Scala(s"ftw:q:$c:$bb") % 2001L - 1000L
      assert(m.weights(c)(bb) === expect)
    }
    assert(m.weights.flatten.forall(x => x >= -1000L && x <= 1000L))
  }

  test("classify is map-only: zero exchanges, weights ride as literals") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val plan = LinearModel
      .classify(docs, "text", LinearModel.planted("q", 2, 512))
      .queryExecution.executedPlan
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty, s"full-corpus scorer must not exchange:\n$plan")
  }

  test("sigmoidScore: 0.5 at zero margin, monotone, bounded") {
    val got = Seq(-2.0, 0.0, 2.0)
      .toDF("m")
      .select(LinearModel.sigmoidScore(col("m")).as("s"))
      .collect()
      .map(_.getDouble(0))
    assert(got(1) === 0.5)
    assert(math.abs(got(2) - 1.0 / (1.0 + math.exp(-2.0))) < 1e-15)
    assert(got(0) < got(1) && got(1) < got(2))
    assert(got.forall(s => s > 0.0 && s < 1.0))
  }

  test("perceptron: hand-computed two-doc training (bootstrap round, then converged)") {
    // two single-token docs whose buckets differ under dim 8
    val (ta, tb) = (0 until 1000)
      .map(i => s"t$i")
      .combinations(2)
      .map(p => (p(0), p(1)))
      .find { case (a, b0) =>
        val dim = 8
        (DistinctSketch.hash40Scala("ft:" + a) % dim) != (DistinctSketch.hash40Scala("ft:" + b0) % dim)
      }
      .get
    val dim = 8
    val ba = (DistinctSketch.hash40Scala("ft:" + ta) % dim).toInt
    val bb = (DistinctSketch.hash40Scala("ft:" + tb) % dim).toInt
    val docs = Seq((0L, ta, 1L), (1L, tb, -1L)).toDF("doc_id", "text", "y")
    val (w, mis) = LinearModel.trainPerceptron(docs, "text", "y", dim, rounds = 3)
    // round 1: w=0 scores 0, y*0 <= 0 → BOTH misclassified → w[ba]=+1,
    // w[bb]=-1; rounds 2-3: both correct, weights frozen
    assert(mis === Seq(2L, 0L, 0L))
    val expected = Array.fill(dim)(0L)
    expected(ba) = 1L; expected(bb) = -1L
    assert(w.toSeq === expected.toSeq)
  }

  test("perceptron: separable planted corpus converges and the trained model scores it perfectly") {
    // +1 docs carry goodtok, −1 docs carry badtok, shared noise words
    val docs = (0 until 120).map { i =>
      val marker = if (i % 2 == 0) "goodtok goodtok" else "badtok badtok"
      (i.toLong, s"common filler $marker words w${i % 7} noise", if (i % 2 == 0) 1L else -1L)
    }.toDF("doc_id", "text", "y")
    val (w, mis) = LinearModel.trainPerceptron(docs, "text", "y", dim = 512, rounds = 5)
    assert(mis.head === 120L, "round 1 must bootstrap on every doc")
    assert(mis.last === 0L, s"separable data did not converge: $mis")
    // inference under the trained weights (the x129 shape) is perfect
    val model = LinearModel.HashedLinearModel(512, Array(Array.fill(512)(0L), w))
    val wrong = LinearModel
      .classify(docs, "text", model)
      .where(col("y") * col("dot1") <= 0L)
      .count()
    assert(wrong === 0L)
  }

  test("perceptron training is partitioning-invariant (integer batch updates)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .withColumn("y", when(col("doc_id") % 2 === 0, 1L).otherwise(-1L))
    val (w1, m1) = LinearModel.trainPerceptron(docs.repartition(3), "text", "y", 512, 3)
    val (w2, m2) = LinearModel.trainPerceptron(docs.repartition(17), "text", "y", 512, 3)
    assert(w1.toSeq === w2.toSeq)
    assert(m1 === m2)
  }

  test("NULL-labeled rows are ignored by training (round-1 unfiltered delta stays total)") {
    // regression for the round-1 join-skip: a NULL-label doc whose token
    // hashes to a bucket no labeled doc touches used to fall out via the
    // mis anti-membership; the unfiltered round-1 sum would turn that
    // bucket's delta NULL and NPE on collect
    val labeled = Seq((1L, "alpha beta", 1L), (2L, "gamma delta", -1L))
      .toDF("doc_id", "text", "y")
    val withNull = Seq((1L, "alpha beta", Some(1L)), (2L, "gamma delta", Some(-1L)),
      (3L, "uniquetokenxyz", Option.empty[Long]))
      .toDF("doc_id", "text", "y")
    val (wClean, misClean) = LinearModel.trainPerceptron(labeled, "text", "y", dim = 16, rounds = 2)
    val (wNull, misNull) = LinearModel.trainPerceptron(withNull, "text", "y", dim = 16, rounds = 2)
    assert(wNull.toSeq === wClean.toSeq, "NULL-labeled row leaked into the weights")
    assert(misNull === misClean, "NULL-labeled row leaked into the mis counts")
  }

  test("one-vs-all training ≡ per-class binary training (shared counts change nothing)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .limit(40)
      .withColumn("cls", col("doc_id") % 3L)
    val ova = LinearModel.trainPerceptronOva(
      docs, "text", "cls", numClasses = 3, dim = 32, rounds = 2)
    assert(ova.size === 3)
    (0 until 3).foreach { c =>
      val (wBin, misBin) = LinearModel.trainPerceptron(
        docs.withColumn("y", when(col("cls") === c.toLong, 1L).otherwise(-1L)),
        "text", "y", dim = 32, rounds = 2)
      assert(ova(c)._1.toSeq === wBin.toSeq, s"class $c weights")
      assert(ova(c)._2 === misBin, s"class $c per-round mis curve")
    }
    // the trained head plugs straight into the multi-class scorer
    val model = HashedLinearModel(32, ova.map(_._1).toArray)
    val scored = LinearModel.classify(docs, "text", model)
    assert(scored.where(col("pred").isin(0L, 1L, 2L)).count() === 40)
  }

  test("dense training primitives ≡ the sparse Column algebra on real corpus text") {
    // the r15 dense-trainer rewrite: FtBucketCounts must count exactly
    // what explode(features→bucket) + groupBy counted, LongVecDotLit
    // must score exactly what sum(cnt · w[b]) scored, and
    // LongVecSignedSum must sum exactly what groupBy(b).sum(y·cnt)
    // summed — on real text, not crafted tokens
    val dim = 64
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .limit(50)
      .withColumn("y", when(col("doc_id") % 2 === 0, 1L).otherwise(-1L))

    // sparse truth: (doc, b, cnt) via the documented Column algebra
    val sparse = docs
      .select(
        col("doc_id"), col("y"),
        explode(
          transform(
            LinearModel.features(TextAnalysis.tokens(col("text"))),
            f => LinearModel.bucket(f, dim))).as("b"))
      .groupBy(col("doc_id"), col("y"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
    val sparseByDoc = sparse.groupBy(_.getLong(0)).map { case (id, rows) =>
      id -> rows.map(r => r.getLong(2).toInt -> r.getLong(3)).toMap
    }

    // dense: the bucket-count vectors
    val fcv = LinearModel.bucketCountVectors(docs, "text", dim, "doc_id", col("y"))
    val dense = fcv.collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    assert(dense.keySet === sparseByDoc.keySet)
    dense.foreach { case (id, cv) =>
      val m = sparseByDoc(id)
      (0 until dim).foreach { b =>
        assert(cv(b) === m.getOrElse(b, 0L), s"doc $id bucket $b")
      }
    }

    // scoring under arbitrary (negative, zero, large) weights
    val w = Array.tabulate(dim)(b => (b * 37L) % 11L - 5L)
    val scoredDense = fcv
      .select(col("doc_id"), LinearModel.scoreWith(col("graft_cv"), w).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sparseByDoc.foreach { case (id, m) =>
      val expect = m.map { case (b, cnt) => cnt * w(b) }.sum
      assert(scoredDense(id) === expect, s"doc $id dense score")
    }

    // signed delta sum over the whole frame ≡ sparse groupBy(b).sum(y·cnt)
    val dwDense = fcv
      .agg(
        org.apache.spark.sql.GraftSqlBridge.column(
          graft.functions.LongVecSignedSum(
            org.apache.spark.sql.GraftSqlBridge.expression(col("graft_cv")),
            org.apache.spark.sql.GraftSqlBridge.expression(col("y")),
            dim).toAggregateExpression()))
      .head().getSeq[Long](0)
    val dwSparse = Array.fill(dim)(0L)
    sparse.foreach(r => dwSparse(r.getLong(2).toInt) += r.getLong(1) * r.getLong(3))
    assert(dwDense.toSeq === dwSparse.toSeq)
  }

  test("curateWithModel ≡ dedup-first composition (screen-order equivalence)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val m = LinearModel.planted("q", 2, 512)
    val got = LinearModel.curateWithModel(docs, m, keepClass = 1L, cap = 10)

    // the independent composition in the OTHER order: min-id md5 dedup
    // first, model screen + language screen after (the oracle's shape)
    val dedup = docs
      .withColumn(
        "rn",
        row_number().over(Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .where(col("rn") === 1)
      .drop("rn")
    val expected = LinearModel
      .classify(dedup, "text", m)
      .where(col("pred") === 1L)
      .select(
        col("doc_id"), col("source"),
        md5(col("text")).as("text_md5"),
        TextAnalysis.langId(TextAnalysis.tokens(col("text"))).as("lang_pred"),
        TextAnalysis.bpeishTokenCount(col("text")).cast("long").as("n_tokens"))
      .where(col("lang_pred") =!= "und")
      .withColumn(
        "rn_cap",
        row_number().over(
          Window.partitionBy(col("source")).orderBy(col("text_md5"), col("doc_id"))))
      .where(col("rn_cap") <= 10)
      .select(col("source"), col("doc_id"), col("lang_pred"), col("n_tokens"))

    def rows(df: org.apache.spark.sql.DataFrame): Set[Row] =
      df.collect().toSet
    assert(got.count() > 0, "planted screen should keep a nonempty selection")
    assert(rows(got) === rows(expected))
  }
}
