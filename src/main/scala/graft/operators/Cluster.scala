package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph clustering over near-duplicate pair sets (the step after pair
  * mining in a corpus-dedup pipeline: pairs → components → one canonical
  * doc kept per component).
  *
  * Scale design (100 TB posture):
  *   - Pregel-style min-label propagation, the same algorithm GraphX's
  *     `connectedComponents` runs: each iteration is ONE shuffle of
  *     (id, comp) keyed by id, plus an edge join — no all-pairs work.
  *     Iteration count is the graph diameter; near-dup graphs are
  *     overwhelmingly tiny star/clique clusters (diameter ≤ 3-4), so
  *     convergence is a handful of rounds even at corpus scale. For
  *     adversarially long chains, large-star/small-star (Kiveris et al.,
  *     "Connected Components in MapReduce and Beyond") drops rounds to
  *     O(log n); not needed for the dedup workload this serves.
  *   - Each iteration's result is `localCheckpoint`ed: truncating lineage
  *     is mandatory in iterative DataFrame jobs — without it the plan
  *     doubles per round and the optimizer re-plans the whole history.
  *   - Edges are persisted once (MEMORY_AND_DISK, spills instead of
  *     OOMing) and unpersisted on exit; label frames are checkpointed so
  *     superseded iterations are dropped by the ContextCleaner.
  */
object Cluster {

  /** Connected components of the undirected graph given by pair rows.
    *
    * Returns one row per distinct vertex: (id, comp) where `comp` is the
    * minimum vertex id reachable from `id` (a canonical, deterministic
    * component label — also exactly the "keep this doc" choice a dedup
    * pipeline makes).
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "a_id",
      bCol: String = "b_id",
      maxIters: Int = 50
  ): DataFrame = {
    // both edge directions from ONE scan of the pairs subtree (a union of
    // two selects would evaluate the — typically expensive — pair-mining
    // plan twice on first materialization). localCheckpoint — not
    // persist() — because persist caches DATA but keeps the PLAN: every
    // round's join would re-analyze and re-optimize the whole pair-mining
    // subtree (hundreds of nodes for the LSH miners), which at 3-5 rounds
    // × 2 plans each dominated x14's driver time and kept HotSpot
    // deopt-recompiling the Catalyst rule lambdas every rep (round-8
    // verdict wrong #2: 1.6-3.7 s/rep JIT with ZERO janino recompiles —
    // the churn was plan ANALYSIS, not generated code). The checkpoint
    // truncates lineage to one LogicalRDD leaf, the same discipline the
    // label frames already follow; blocks are MEMORY_AND_DISK and the
    // ContextCleaner frees them when the frame is dropped.
    val bidir = pairs
      .select(
        explode(
          array(
            struct(col(aCol).as("src"), col(bCol).as("dst")),
            struct(col(bCol).as("src"), col(aCol).as("dst"))
          )
        ).as("e")
      )
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .localCheckpoint(true)

    var labels = bidir
      .select(col("src").as("id"))
      .distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)

    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      // push every vertex's current label across its edges, then take the
      // min of (own label, all incoming labels) per vertex. Own rows are
      // tagged so the SAME aggregation also recovers the previous label
      // (every vertex has exactly one own row; pushed ids ⊆ vertices):
      // the convergence check is then a narrow filter-count over the
      // checkpointed result instead of a second shuffle join per round.
      // The checkpoint is LAZY and the count materializes it — one job
      // per round (compute + persist + count together), not two.
      val pushed = bidir
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("comp"), lit(false).as("own"))
      val updated = labels
        .select(col("id"), col("comp"), lit(true).as("own"))
        .union(pushed)
        .groupBy("id")
        .agg(
          min("comp").as("comp"),
          max(when(col("own"), col("comp"))).as("prev"))
        .localCheckpoint(false)
      val changed = updated.where(col("comp") =!= col("prev")).count()
      labels = updated.select(col("id"), col("comp"))
      converged = changed == 0
      iters += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters iterations " +
          "(graph diameter exceeds maxIters); raise maxIters — returning " +
          "partially-propagated labels would split real components")
    labels
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the O(log n)-round alternative to
    * [[connectedComponents]]'s min-label propagation, whose round count is
    * the graph DIAMETER. Near-dup graphs are shallow, so label propagation
    * is usually fine; this operator exists for the adversarial shapes
    * (long chains: linked citation/redirect graphs, transitively-merged
    * entity resolution) where diameter ∝ n and label propagation would
    * need thousands of shuffles.
    *
    * Per round, two phases over the directed edge list:
    *   - large-star: group both edge directions by `u`; with
    *     m = min(N(u) ∪ {u}), re-point every STRICTLY LARGER neighbor
    *     v > u at m. Connectivity-preserving, strictly decreases the sum
    *     of neighbor heights.
    *   - small-star: orient every edge large→small, group by the large
    *     end `u`; with m = min(N(u) ∪ {u}) re-point u and all its (small)
    *     neighbors except m at m.
    * Each phase is ONE `groupBy(u)` shuffle plus a join back on the same
    * key (the exchange is reused — the join side arrives pre-partitioned).
    * Convergence = the edge list is a star forest: no parent node also
    * appears as a child, checked with a left-semi probe (sound — depth-1
    * big→small edges with min roots ARE the component labels; no
    * hash-signature heuristic that could terminate early on collision).
    * Roots at convergence are the component minima, so the output contract
    * is identical to [[connectedComponents]]: (id, comp) with
    * comp = min reachable id — the two implementations are interchangeable
    * and spec-pinned equal. Works on any ordered id type (longs, strings).
    *
    * Same lineage discipline as the label-prop loop: `localCheckpoint`
    * per round, else the plan doubles each iteration.
    */
  def connectedComponentsStar(
      pairs: DataFrame,
      aCol: String = "a_id",
      bCol: String = "b_id",
      maxIters: Int = 30
  ): DataFrame = {
    // ONE evaluation of the (typically expensive) pair-mining subtree,
    // lineage-truncated to a leaf: both the node universe and the initial
    // edge list derive from the checkpointed projection, so no loop round
    // (and no final join) ever re-analyzes the mining plan — the
    // connectedComponents discipline.
    val base = pairs
      .select(col(aCol).as("u"), col(bCol).as("v"))
      .localCheckpoint(true)

    val nodes = base
      .select(explode(array(col("u"), col("v"))).as("id"))
      .distinct()

    var edges = base
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(true)

    var converged = edges.isEmpty
    var iters = 0
    while (!converged && iters < maxIters) {
      // large-star: m = min over the full neighborhood (both directions);
      // every neighbor larger than the group key re-points at m
      val bidir = edges
        .select(
          explode(
            array(
              struct(col("u").as("s"), col("v").as("d")),
              struct(col("v").as("s"), col("u").as("d"))
            )
          ).as("e")
        )
        .select(col("e.s").as("s"), col("e.d").as("d"))
      val lsMin = bidir
        .groupBy("s")
        .agg(min(col("d")).as("mind"))
        .select(col("s"), least(col("mind"), col("s")).as("m"))
      val afterLarge = bidir
        .join(lsMin, "s")
        .where(col("d") > col("s"))
        .select(col("d").as("u"), col("m").as("v"))
        .distinct()
        .localCheckpoint(true)

      // small-star: edges are big→small; with m = min(small neighbors),
      // the group key AND every other small neighbor re-point at m
      val ssMin = afterLarge.groupBy("u").agg(min(col("v")).as("m"))
      val afterSmall = afterLarge
        .join(ssMin, "u")
        .where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(ssMin.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(true)

      edges = afterSmall
      // star test: a parent (v side) that also appears as a child (u side)
      // means depth ≥ 2 somewhere → keep contracting
      converged = edges
        .join(edges.select(col("u").as("v")).distinct(), Seq("v"), "left_semi")
        .isEmpty
      iters += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIters rounds; " +
          "raise maxIters — returning a partially-contracted forest would " +
          "split real components")
    val labeled = edges.select(col("u").as("id"), col("v").as("comp"))
    nodes
      .join(labeled, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** End-to-end near-dup clustering: mine n-gram Jaccard pairs, cluster
    * them, and label every clustered doc with its component root and
    * whether it is the canonical (kept) member.
    */
  def nearDupClusters(
      docs: DataFrame,
      n: Int,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame =
    connectedComponents(Dedup.ngramJaccardPairs(docs, n, threshold, idCol = idCol, textCol = textCol))
      .select(
        col("id").as(idCol),
        col("comp").as("comp_id"),
        (col("id") === col("comp")).as("is_canonical")
      )

  /** The curation step AFTER clustering: per near-dup cluster keep the
    * best-scored member (score desc, id asc tie-break), with singletons —
    * docs in no edge — forming their own cluster. This is corpus dedup's
    * final act: one representative survives, the rest are dropped.
    *
    * 100 TB shape: one broadcast-able LEFT join (the component table is one
    * narrow row per CLUSTERED doc, a small fraction of the corpus) and one
    * hash aggregation whose per-group state is a single (score, -id) struct
    * — `max(struct(score, -id))` gives argmax-with-tie-break via Spark's
    * lexicographic struct ordering WITHOUT a per-cluster sort or window
    * (map-side partial max, no WindowExec buffering whole clusters). The
    * id is negated (exact on longs) rather than the score (whose negation
    * would manufacture -0.0 bit-pattern hazards in the hash contract).
    *
    * `scored`: (id, score); `comps`: (id, comp) as produced by
    * [[connectedComponents]]. Output: (comp_id, keep_id, score, n_members).
    */
  def canonical(scored: DataFrame, comps: DataFrame): DataFrame =
    scored
      .join(comps, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("comp"), col("id")).as("comp_id"),
        col("score"))
      .groupBy("comp_id")
      .agg(
        count(lit(1)).as("n_members"),
        max(struct(col("score"), (-col("id")).as("neg_id"))).as("best"))
      .select(
        col("comp_id"),
        (-col("best.neg_id")).as("keep_id"),
        col("best.score").as("score"),
        col("n_members"))

  /** Synchronous label propagation (Raghavan-Albert-Kumara 2007) —
    * DENSITY communities, the verb connectivity clustering cannot
    * express: [[connectedComponents]] merges everything reachable, LPA
    * splits a connected graph into internally-dense groups (domain/topic
    * clusters over a similarity graph; two topical clusters joined by one
    * stray near-dup edge stay separate communities but are one
    * component). Each node starts labeled by itself; every round each
    * node adopts the label held by the PLURALITY of its neighbors, ties
    * broken by the smallest label — the fully deterministic synchronous
    * variant, so the contract is exact ("labels after `rounds` rounds")
    * and an oracle can replay it round by round. Synchronous LPA can
    * 2-cycle on bipartite structures rather than converge; the fixed
    * round count IS the contract, per the original paper's caveat.
    *
    * Scale shape: per round ONE edge join keyed by node + two hash aggs
    * with map-side partials ((node, label) plurality count, then the
    * min-struct argmax — never a window), per-round localCheckpoint,
    * edges symmetrized once and persisted. Node universe = edge
    * endpoints, same as [[connectedComponents]].
    */
  def labelPropagation(
      pairs: DataFrame,
      rounds: Int,
      aCol: String = "a_id",
      bCol: String = "b_id"
  ): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    val bidir = pairs
      .select(
        explode(
          array(
            struct(col(aCol).as("src"), col(bCol).as("dst")),
            struct(col(bCol).as("src"), col(aCol).as("dst"))
          )).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      // lineage-truncated, not persist()ed: see connectedComponents — a
      // persisted frame keeps the mining plan and every round re-plans it
      .localCheckpoint(true)
    var labels = bidir
      .select(col("src").as("id"))
      .distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var r = 0
    while (r < rounds) {
      // plurality label among neighbors; (count desc, label asc) argmax
      // via min(struct(-cnt, label)) — smallest negated count is the
      // plurality, then the smallest label wins the tie
      labels = bidir
        .join(labels, bidir("src") === labels("id"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(min(struct((-col("cnt")).as("neg"), col("label").as("l"))).as("best"))
        .select(col("dst").as("id"), col("best.l").as("label"))
        .localCheckpoint()
      r += 1
    }
    labels
  }
}
