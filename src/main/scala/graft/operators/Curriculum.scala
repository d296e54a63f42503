package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Curriculum ordering with source interleaving — the training-order
  * verb (Bengio et al. 2009 curriculum learning; every production
  * pretraining run fixes a deterministic example order that walks
  * easy→hard while round-robining sources so no batch window is
  * single-source). Given per-document (source, difficulty), emit each
  * document's exact global training position under the order
  * "difficulty rank within source, then source" — i.e. round 1 takes
  * every source's easiest doc in source order, round 2 the second
  * easiest, and a source that runs out simply drops from later rounds.
  *
  * Exactness: position is closed-form from (src_rank, source, the
  * per-source size table) —
  * `pos = Σ_s' min(src_rank−1, n_s') + |{s' < source : n_s' ≥
  * src_rank}| + 1` — which equals `row_number() OVER (ORDER BY
  * src_rank, source)` because each (rank, source) cell holds exactly
  * one row. The oracle replays the window form; the engine never runs
  * a global window.
  *
  * Scale posture: the per-source rank is [[GroupNtile]]'s class-table
  * decomposition (no per-source global sort — sources are few and
  * huge, the exact situation GroupNtile exists for), and the position
  * is then MAP-ONLY: the per-source size table is `nSources` rows of
  * driver state (the BPE bounded-scalar contract) inlined as literals.
  * No shuffle after the rank.
  */
object Curriculum {

  /** `df` plus `src_rank` (1-based within `sourceCol` by
    * (`difficultyCol` ASC, `tieCol` ASC)) and `pos` (1-based global
    * training position). `difficultyCol` must be integral (it is
    * negated into GroupNtile's descending score).
    *
    * BOUND (enforced): at most [[maxSources]] distinct sources. The
    * closed-form `pos` folds one `when` term per source into a single
    * Column expression — O(#sources) codegen, the right trade for the
    * documented dozens-of-languages/domains use case, but at thousands
    * of sources it would blow past the JIT method limit (the SURVEY
    * §8.3 lesson). A caller with more sources wants the broadcast-join
    * formulation (join the size table, aggregate the two terms), not a
    * bigger expression — the require names that alternative rather
    * than letting codegen fall over mid-plan.
    */
  val maxSources = 512

  def interleaveBySource(
      df: DataFrame,
      sourceCol: String,
      difficultyCol: String,
      tieCol: String
  ): DataFrame = {
    val ranked = GroupNtile
      .withGroupNtile(
        df.withColumn("graft_cur_neg", -col(difficultyCol).cast(LongType)),
        groupCol = sourceCol,
        scoreCol = "graft_cur_neg",
        tieCol = tieCol,
        tiles = 1)
      .withColumnRenamed("rank", "src_rank")
      .drop("tile", "graft_cur_neg")
    val sizes = ranked
      .groupBy(col(sourceCol))
      .count()
      .collect()
      .map(r => (r.get(0).toString, r.getLong(1)))
      .sortBy(_._1)
    require(
      sizes.length <= maxSources,
      s"interleaveBySource saw ${sizes.length} sources (max $maxSources): " +
        "the closed-form position folds one expression term per source; " +
        "rewrite via a broadcast join against the size table for more")
    val pos = sizes
      .map { case (s, n) =>
        least(col("src_rank") - 1L, lit(n)).cast(LongType) +
          when(lit(s) < col(sourceCol) && lit(n) >= col("src_rank"), 1L)
            .otherwise(0L)
      }
      .reduceOption(_ + _)
      .getOrElse(lit(0L)) + 1L
    ranked.withColumn("pos", pos.cast(LongType))
  }
}
