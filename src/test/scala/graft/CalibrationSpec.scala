package graft

import org.apache.spark.sql.functions._

import graft.operators.Calibration

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("isotonic minimax equals hand-run PAVA on the textbook case") {
    // equal-mass bins with rates 0.2, 0.4, 0.3, 0.8: PAVA pools the
    // (0.4, 0.3) violation to 0.35 and leaves the rest
    val fit = Calibration.isotonicFitPpm(
      Seq((2L, 10L), (4L, 10L), (3L, 10L), (8L, 10L)))
    assert(fit === Seq(200000L, 350000L, 350000L, 800000L))
  }

  test("an already-monotone diagram is a fixed point") {
    val fit = Calibration.isotonicFitPpm(
      Seq((1L, 10L), (3L, 10L), (5L, 10L), (9L, 10L)))
    assert(fit === Seq(100000L, 300000L, 500000L, 900000L))
  }

  test("a fully-reversed diagram pools to one global rate") {
    val fit = Calibration.isotonicFitPpm(
      Seq((9L, 10L), (5L, 10L), (3L, 10L), (1L, 10L)))
    // pooled: 18/40 = 0.45
    assert(fit.distinct === Seq(450000L))
  }

  test("the fit is monotone non-decreasing on adversarial stats") {
    // deterministic pseudo-random bin stats, including zero-doc bins
    for (seed <- 0 until 20) {
      val stats = (0 until 10).map { i =>
        val h = (seed * 31 + i) * 2654435761L
        val docs = math.abs(h % 50L)
        val pos = if (docs == 0) 0L else math.abs((h >> 8) % (docs + 1))
        (pos, docs)
      }
      val fit = Calibration.isotonicFitPpm(stats)
      fit.sliding(2).foreach {
        case Seq(a, b) => assert(a <= b, s"seed $seed not monotone: $fit")
        case _         =>
      }
    }
  }

  test("reliabilityBins: equal-mass deciles, exact rates, ragged tail") {
    // 23 rows: scores 0..22, label +1 iff score >= 13 — bins split
    // 23 rows over 10 bins (sizes 3/2/2/3/2/2/3/2/2/2 by the
    // (rank-1)*10 div n rule)
    val scored = (0 until 23)
      .map(i => (i.toLong, i.toLong, if (i >= 13) 1L else -1L))
      .toDF("doc_id", "score", "y")
    val out = Calibration.reliabilityBins(scored, bins = 10)
      .orderBy("bin").collect()
    assert(out.map(_.getLong(1)).sum === 23L)
    assert(out.length === 10)
    // bins partition the score order: max_score of bin b < min_score of b+1
    out.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(5) < b.getLong(4))
      case _           =>
    }
    // rates: every row in the top bins is positive, bottom bins negative
    assert(out.head.getLong(3) === 0L)
    assert(out.last.getLong(3) === 1000000L)
    // exact ppm arithmetic per bin
    out.foreach { r =>
      assert(r.getLong(3) === r.getLong(2) * 1000000L / r.getLong(1))
    }
  }

  test("calibratedScreen: keep set is a bin suffix; flags consistent with the fit") {
    val scored = (0 until 400).map { i =>
      val y = if ((i * 2654435761L >> 7) % 100L < 10 + i / 5) 1L else -1L
      (i.toLong, (i * 13 % 397).toLong, y)
    }.toDF("doc_id", "score", "y")
    val out = Calibration.calibratedScreen(scored, bins = 10, minIsoPpm = 500000L)
      .collect()
    // per-bin iso rate must be a single value, and kept ⇔ iso ≥ threshold
    val byBin = out.groupBy(_.getLong(3)).map { case (b, rows) =>
      val isos = rows.map(_.getLong(4)).distinct
      assert(isos.length === 1, s"bin $b has ${isos.length} iso values")
      rows.foreach(r => assert(r.getBoolean(5) === (r.getLong(4) >= 500000L)))
      b -> isos.head
    }
    // the isotonic fit is monotone in bin, so the kept bins form a SUFFIX
    val keptBins = byBin.filter(_._2 >= 500000L).keys.toSeq.sorted
    if (keptBins.nonEmpty)
      assert(keptBins === (keptBins.min to 9L), s"kept bins not a suffix: $keptBins")
    // every doc appears exactly once
    assert(out.map(_.getLong(0)).distinct.length === 400)
  }

  test("isotonicCalibration end-to-end: monotone map over the real scorer") {
    // a synthetic scored frame with a noisy-but-rising signal: the raw
    // diagram has local violations, the fit must be monotone and within
    // the raw rates' envelope
    val scored = (0 until 500).map { i =>
      val flip = (i * 2654435761L >> 5) % 100L
      val y = if (flip < 20 + (i / 5)) 1L else -1L
      (i.toLong, (i % 250).toLong * 7 % 199, y) // scrambled scores
    }.toDF("doc_id", "score", "y")
    val out = Calibration.isotonicCalibration(scored, bins = 10)
      .orderBy("bin").collect()
    val iso = out.map(_.getLong(4))
    iso.sliding(2).foreach {
      case Array(a, b) => assert(a <= b, s"not monotone: ${iso.toSeq}")
      case _           =>
    }
    val raw = out.map(_.getLong(3))
    assert(iso.head >= raw.min && iso.last <= raw.max)
  }
}
