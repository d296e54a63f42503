package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.{Cluster, Dedup}

/** Cross-family invariants over seeded random corpora — properties that
  * tie the dedup relations to each other rather than to per-operator
  * references:
  *
  *   1. containment DOMINATES Jaccard: C(A,B) = |∩|/|A| ≥ |∩|/|∪| =
  *      J(A,B), so every Jaccard pair at threshold t must appear (both
  *      orientations) in the containment output at the same t;
  *   2. exact duplicates are fixed points of every family: md5 classes,
  *      Jaccard 1.0 pairs, containment 1.0 both ways;
  *   3. the indexed-ingest artifact is consistent with the pair miner:
  *      a delivery doc classified `near` must have a ≥ t Jaccard pair
  *      with some index doc in the x06 miner's union output, and vice
  *      versa for non-exact docs;
  *   4. semanticDedup partitions the corpus: every vec keeps or points
  *      at a keeper, keepers are exactly the component minima.
  */
class DedupFamilyPropertySpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  /** Seeded corpus: base docs from a small vocabulary plus planted exact
    * copies and prefix excerpts, so all relation classes occur.
    */
  private def corpus(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 40).map(i => s"w$i")
    val base = (0L until n.toLong).map { id =>
      val len = 6 + rnd.nextInt(20)
      id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val copies = base.take(n / 5).map { case (id, t) => (id + 1000L) -> t }
    val excerpts = base.filter(_._2.split(" ").length >= 12).take(n / 5).map {
      case (id, t) => (id + 2000L) -> t.split(" ").take(8).mkString(" ")
    }
    base ++ copies ++ excerpts
  }

  test("containment dominates Jaccard: every Jaccard pair appears in both containment orientations") {
    for (seed <- Seq(11, 23)) {
      val docs = corpus(seed, 30).toDF("doc_id", "text")
      val jac = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val cont = Dedup.containmentPairs(docs, n = 3, threshold = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(jac.nonEmpty, s"seed $seed produced no Jaccard pairs — weaken the corpus")
      jac.foreach { case (a, b) =>
        assert(cont((a, b)) && cont((b, a)), s"jaccard pair ($a,$b) missing from containment")
      }
    }
  }

  test("exact duplicates are fixed points of every family") {
    val docs = corpus(7, 25).toDF("doc_id", "text")
    val classes = Dedup.exact(docs).where(col("n_copies") > 1)
      .collect().map(_.getLong(1)).toSet // keep_id per duplicated class
    assert(classes.nonEmpty)
    val jac1 = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every duplicated keeper participates in a jac-1.0 pair with its copy
    classes.foreach { keep =>
      assert(jac1.exists(p => (p._1 == keep || p._2 == keep) && p._3 == 1.0),
        s"keeper $keep missing its jac-1.0 copy pair")
    }
    val cont1 = Dedup.containmentPairs(docs, n = 3, threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    classes.foreach { keep =>
      val copy = keep + 1000L
      assert(cont1((keep, copy)) && cont1((copy, keep)),
        s"exact class $keep/$copy not mutually containing at 1.0")
    }
  }

  test("indexed ingest agrees with the pair miner on near classification") {
    val all = corpus(42, 40)
    val index = all.filter(_._1 < 1000L)
    val delivery = all.filterNot(_._1 < 1000L) // copies + excerpts
    val idxDf = index.toDF("doc_id", "text")
    val delDf = delivery.toDF("doc_id", "text")
    val built = Dedup.buildNearDupIndex(idxDf, n = 3, threshold = 0.5)
    val classified = Dedup.incrementalClassifyIndexed(delDf, built)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // ground truth from the union pair miner: cross-side pairs only
    val union = (index ++ delivery).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(union, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idxIds = index.map(_._1).toSet
    val exactTexts = index.map(_._2).toSet
    delivery.foreach { case (id, text) =>
      val status = classified(id)
      if (exactTexts(text)) assert(status == "exact", s"$id should be exact")
      else {
        val hasCross = pairs.exists { case (a, b) =>
          (a == id && idxIds(b)) || (b == id && idxIds(a))
        }
        assert(status == (if (hasCross) "near" else "novel"),
          s"$id: status $status vs miner cross-pair=$hasCross")
      }
    }
  }

  test("exact copies and prefix excerpts are full-length spans of maximalSharedSpans") {
    val all = corpus(13, 30)
    val docs = all.toDF("doc_id", "text")
    val byId = all.toMap
    val spans = graft.operators.SubstringDedup
      .maximalSharedSpans(docs, l = 4)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // every exact copy pair (id, id+1000) carries the WHOLE doc as a span
    all.collect { case (id, t) if byId.contains(id + 1000L) && byId(id + 1000L) == t => id }
      .foreach { id =>
        val len = byId(id).trim.split("\\s+").length.toLong
        assert(spans.getOrElse((id, id + 1000L), Set.empty).contains((0L, 0L, len)),
          s"copy pair $id missing its full-length span")
      }
    // every prefix excerpt (id, id+2000) carries its full 8-token prefix at (0, 0)
    all.collect { case (id, _) if byId.contains(id + 2000L) => id }
      .foreach { id =>
        val got = spans.getOrElse((id, id + 2000L), Set.empty)
        assert(got.exists { case (a, b, s) => a == 0L && b == 0L && s >= 8L },
          s"excerpt pair $id missing its prefix span: $got")
      }
  }

  test("int-LSH near-dup pairs are a SUBSET of the exact relation on every seed") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for (th <- Seq(0.40, 0.45)) {
      val exact = Dedup.embeddingNearDupPairsExact(emb, th)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val banded = Dedup.embeddingNearDupPairsIntLsh(emb, th)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded.subsetOf(exact), s"th=$th: false positives ${banded diff exact}")
    }
  }

  test("semanticDedupIntLsh partitions the corpus; keepers are its own component minima") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Dedup.semanticDedupIntLsh(emb, threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byRoot = out.groupBy(_._2)
    byRoot.foreach { case (root, members) =>
      assert(members.map(_._1).min === root, s"root $root is not its component minimum")
      assert(members.count(_._3) === 1 && members.find(_._3).get._1 === root)
    }
    // partition: every embedding row appears exactly once
    assert(out.map(_._1).distinct.length === out.length)
    assert(out.length === emb.count())
  }

  test("semanticDedup partitions the corpus; keepers are the component minima") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Dedup.semanticDedup(emb, threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length === emb.count())
    val roots = out.map(_._2).toSet
    // every root is itself kept, and keep ⟺ id == root
    out.foreach { case (id, root, keep) =>
      assert(keep === (id == root))
      assert(root <= id)
    }
    assert(out.filter(_._3).map(_._1).toSet === roots)
    // roots match connectedComponents minima over the same pair set
    val comps = Cluster
      .connectedComponents(Dedup.embeddingNearDupPairs(emb, 0.45))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, root, _) =>
      assert(comps.getOrElse(id, id) === root)
    }
  }
}
