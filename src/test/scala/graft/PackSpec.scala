package graft

import org.apache.spark.sql.functions._

import graft.operators.Pack

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("next-fit hand example: single group, known bin walk") {
    // capacity 8, id order: 3,4 -> bin0(7); 5,2 -> bin1(7); 9 -> bin2 alone
    // (oversize); 1 -> bin3
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 5L), (4L, 2L), (5L, 9L), (6L, 1L))
      .toDF("doc_id", "n_tokens")
    val out = Pack
      .nextFit(docs, "doc_id", "n_tokens", capacity = 8, numGroups = 1)
      .orderBy($"doc")
      .select($"doc", $"bin", $"bin_fill", $"oversize")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq === Seq(
      (1L, 0L, 7L, false),
      (2L, 0L, 7L, false),
      (3L, 1L, 7L, false),
      (4L, 1L, 7L, false),
      (5L, 2L, 9L, true),
      (6L, 3L, 1L, false)
    ))
  }

  test("fold matches a plain-Scala next-fit walk exactly, per group, on random sizes") {
    val n = 1500
    val docs = spark
      .range(n)
      .select(
        col("id").as("doc_id"),
        (pmod(col("id") * 2654435761L, lit(300L)) + 1L).as("n_tokens")
      )
    val got = Pack
      .nextFit(docs, "doc_id", "n_tokens", capacity = 200, numGroups = 4)
      .select($"grp", $"doc", $"toks", $"bin")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // reference walk: same grouping rule (xxhash64 % 4, read back from the
    // operator's own grp column so only the PACKING logic is re-derived)
    val expected = got
      .groupBy(_._1)
      .toSeq
      .flatMap { case (g, rows) =>
        var bin = 0L; var fill = 0L
        rows.sortBy(_._2).toSeq.map { case (_, doc, toks, _) =>
          if (fill + toks > 200 && fill > 0) { bin += 1; fill = toks }
          else fill += toks
          (g, doc) -> bin
        }
      }
      .toMap
    got.foreach { case (g, doc, _, b) =>
      assert(expected((g, doc)) === b, s"doc $doc in group $g: fold=$b walk=${expected((g, doc))}")
    }
  }

  test("nextFit2D hand example: a bin closes when EITHER resource would " +
    "overflow; oversize in either dimension is flagged") {
    // capTok 10, capBytes 100. id order:
    //  1 (3t, 40b), 2 (4t, 50b) -> bin0 (7t, 90b)
    //  3 (2t, 20b): 9t fits but 90+20>100 bytes -> bin1 (BYTE-driven close)
    //  4 (5t, 30b) -> bin1 (7t, 50b)
    //  5 (2t, 60b): 9t fits but 50+60>100 bytes -> bin2
    //  6 (11t, 10b): oversize by tokens -> bin3 alone, flagged
    //  7 (1t, 200b): oversize by bytes -> bin4 alone, flagged
    val docs = Seq(
      (1L, 3L, 40L), (2L, 4L, 50L), (3L, 2L, 20L), (4L, 5L, 30L),
      (5L, 2L, 60L), (6L, 11L, 10L), (7L, 1L, 200L))
      .toDF("doc_id", "n_tokens", "n_bytes")
    val out = Pack
      .nextFit2D(docs, "doc_id", "n_tokens", "n_bytes",
        capTokens = 10, capBytes = 100, numGroups = 1)
      .orderBy($"doc")
      .select($"doc", $"bin", $"bin_toks", $"bin_bytes", $"oversize")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq === Seq(
      (1L, 0L, 7L, 90L, false),
      (2L, 0L, 7L, 90L, false),
      (3L, 1L, 7L, 50L, false),
      (4L, 1L, 7L, 50L, false),
      (5L, 2L, 2L, 60L, false),
      (6L, 3L, 11L, 10L, true),
      (7L, 4L, 1L, 200L, true)
    ))
  }

  test("nextFit2D fold matches a plain-Scala two-resource walk on random sizes") {
    val n = 1200
    val docs = spark
      .range(n)
      .select(
        col("id").as("doc_id"),
        (pmod(col("id") * 2654435761L, lit(120L)) + 1L).as("n_tokens"),
        (pmod(col("id") * 40503L, lit(900L)) + 1L).as("n_bytes"))
    val got = Pack
      .nextFit2D(docs, "doc_id", "n_tokens", "n_bytes",
        capTokens = 200, capBytes = 1500, numGroups = 4)
      .select($"grp", $"doc", $"toks", $"bytes", $"bin")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val expected = got
      .groupBy(_._1)
      .toSeq
      .flatMap { case (g, rows) =>
        var bin = 0L; var ft = 0L; var fb = 0L
        rows.sortBy(_._2).toSeq.map { case (_, doc, toks, bytes, _) =>
          if ((ft + toks > 200 || fb + bytes > 1500) && ft + fb > 0) {
            bin += 1; ft = toks; fb = bytes
          } else { ft += toks; fb += bytes }
          (g, doc) -> bin
        }
      }
      .toMap
    got.foreach { case (g, doc, _, _, b) =>
      assert(expected((g, doc)) === b, s"doc $doc in group $g")
    }
  }

  test("properties on random sizes: exactly-once, capacity respected, bins contiguous, deterministic") {
    val n = 2000
    val docs = spark
      .range(n)
      .select(
        col("id").as("doc_id"),
        // deterministic pseudo-random sizes in [1, 600], a few oversize >512
        (pmod(col("id") * col("id") * 2654435761L, lit(600L)) + 1L).as("n_tokens")
      )
    val packed = Pack.nextFit(docs, "doc_id", "n_tokens", capacity = 512, numGroups = 8)
    val rows = packed.collect()

    // every doc exactly once
    assert(rows.map(_.getAs[Long]("doc")).toSet.size === n)
    assert(rows.length === n)

    // no bin over capacity unless it is a lone oversize doc
    val byBin = rows.groupBy(r => (r.getAs[Long]("grp"), r.getAs[Long]("bin")))
    byBin.foreach { case ((g, b), ds) =>
      val fill = ds.map(_.getAs[Long]("toks")).sum
      assert(fill === ds.head.getAs[Long]("bin_fill"), s"bin_fill mismatch g=$g b=$b")
      if (fill > 512)
        assert(ds.length === 1 && ds.head.getAs[Boolean]("oversize"), s"overfull shared bin g=$g b=$b")
    }

    // within a group: doc order -> non-decreasing bin ids, starting at 0, no gaps
    rows.groupBy(_.getAs[Long]("grp")).foreach { case (g, ds) =>
      val sorted = ds.sortBy(_.getAs[Long]("doc"))
      val bins = sorted.map(_.getAs[Long]("bin"))
      assert(bins.head === 0L, s"group $g first bin not 0")
      bins.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(1) - w(0) >= 0 && w(1) - w(0) <= 1, s"group $g bin jump $w")
      }
    }

    // deterministic: a second run assigns identically
    val again = Pack.nextFit(docs, "doc_id", "n_tokens", capacity = 512, numGroups = 8)
      .select($"doc", $"grp", $"bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val first = rows.map(r => (r.getAs[Long]("doc"), r.getAs[Long]("grp"), r.getAs[Long]("bin"))).toSet
    assert(again === first)
  }
}
