package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data assembly: place documents into
  * fixed token-capacity bins ("context windows") so batches waste as little
  * padding as possible.
  *
  * Exact greedy packing is inherently sequential (bin N's fill decides
  * where doc N+1 goes), so a single global pack would serialize the corpus
  * through one task. The distributed design packs WITHIN bounded groups:
  *
  *   1. each doc gets a deterministic group = xxhash64(id) mod `numGroups`
  *      (content-independent, so re-runs and retries regroup identically);
  *   2. within a group, docs are packed in (id) order by the classic
  *      next-fit rule — accumulate until the bin would overflow, then open
  *      a new bin. One groupBy + one per-group sorted fold; group size is
  *      corpus/numGroups, so `numGroups` scales with the cluster and no
  *      task ever sees more than its slice.
  *
  * Packing quality loss vs a global pack is at most one under-filled bin
  * per group (the last one) — negligible when groups hold thousands of
  * docs; cross-group parallelism is what makes the op exist at 100 TB.
  * Size `numGroups` so groups stay in the low thousands of docs: the fold
  * appends to its accumulator array per element (O(g²) copying within a
  * group), so 1k-doc groups cost ~1M struct copies — microseconds — while
  * 100k-doc groups would not. More groups is also more parallelism; the
  * two pressures agree.
  *
  * Oversized docs (token count > capacity) get a bin of their own and are
  * flagged `oversize` (callers typically split or drop them upstream).
  *
  * Output: one row per doc — (group, bin, doc id, tokens, bin_fill) where
  * `bin` is the 0-based bin index within the group and `bin_fill` the
  * bin's total tokens after packing (same value repeated for every doc in
  * the bin).
  */
object Pack {

  /** Next-fit pack of `df` into bins of `capacity` tokens.
    *
    * @param df        input with an id column and a token-count column
    * @param idCol     unique doc id (packing order within a group)
    * @param tokensCol per-doc token count (int/long)
    * @param capacity  bin capacity in tokens
    * @param numGroups independent packing groups (set ≈ cluster parallelism)
    * @param groupExpr override for the group assignment (default
    *                  xxhash64(id) mod numGroups — content-independent and
    *                  uniform even over clustered id ranges)
    */
  def nextFit(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      capacity: Long,
      numGroups: Int = 256,
      groupExpr: Option[Column] = None
  ): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(numGroups > 0, "numGroups must be positive")

    val grouped = df.select(
      groupExpr
        .getOrElse(pmod(xxhash64(col(idCol)), lit(numGroups.toLong)))
        .cast("long")
        .as("grp"),
      col(idCol).as("doc"),
      col(tokensCol).cast("long").as("toks")
    )

    // Per-group sorted fold: collect (doc, toks) sorted by doc, then a
    // single aggregate() walk assigns next-fit bin ids. The fold state is
    // (current bin, current fill, emitted assignments); emitting into the
    // accumulator keeps everything in one expression — no UDF, no explode
    // of intermediate state, codegen-friendly.
    val packed = grouped
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(struct(col("doc"), col("toks")))).as("docs"))
      .select(
        col("grp"),
        aggregate(
          col("docs"),
          struct(
            lit(0L).as("bin"),
            lit(0L).as("fill"),
            array().cast("array<struct<doc:long,toks:long,bin:long>>").as("out")
          ),
          (acc, d) => {
            val toks = d.getField("toks")
            val overflow = acc.getField("fill") + toks > capacity
            val bin = when(
              overflow && acc.getField("fill") > 0,
              acc.getField("bin") + 1
            ).otherwise(acc.getField("bin"))
            val fill = when(
              overflow && acc.getField("fill") > 0,
              toks
            ).otherwise(acc.getField("fill") + toks)
            struct(
              bin.as("bin"),
              fill.as("fill"),
              concat(
                acc.getField("out"),
                array(struct(d.getField("doc").as("doc"), toks.as("toks"), bin.as("bin")))
              ).as("out")
            )
          },
          acc => acc.getField("out")
        ).as("assigned")
      )
      .select(col("grp"), explode(col("assigned")).as("a"))
      .select(
        col("grp"),
        col("a.bin").as("bin"),
        col("a.doc").as("doc"),
        col("a.toks").as("toks")
      )

    val wBin = Window.partitionBy(col("grp"), col("bin"))
    packed
      .withColumn("bin_fill", sum(col("toks")).over(wBin))
      .withColumn("oversize", col("toks") > capacity)
  }

  /** TWO-RESOURCE next-fit pack — the multimodal-shard constraint: a
    * training shard is bounded by its context-window TOKEN budget and by
    * its on-disk BYTE budget (payload bytes dominate once documents
    * carry media), and a packer that watches only one of them ships
    * shards that blow the other. Same distributed design as [[nextFit]]
    * (deterministic bounded groups, one per-group sorted `aggregate`
    * fold, no UDF), with a two-field fill: a bin closes when EITHER
    * resource would overflow. A doc oversized in EITHER dimension gets a
    * bin of its own and is flagged.
    *
    * Output: one row per doc — (grp, bin, doc, toks, bytes, bin_toks,
    * bin_bytes, oversize).
    */
  def nextFit2D(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      bytesCol: String,
      capTokens: Long,
      capBytes: Long,
      numGroups: Int = 256,
      groupExpr: Option[Column] = None
  ): DataFrame = {
    require(capTokens > 0 && capBytes > 0, "capacities must be positive")
    require(numGroups > 0, "numGroups must be positive")

    val grouped = df.select(
      groupExpr
        .getOrElse(pmod(xxhash64(col(idCol)), lit(numGroups.toLong)))
        .cast("long")
        .as("grp"),
      col(idCol).as("doc"),
      col(tokensCol).cast("long").as("toks"),
      col(bytesCol).cast("long").as("bytes")
    )

    val packed = grouped
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(struct(col("doc"), col("toks"), col("bytes")))).as("docs"))
      .select(
        col("grp"),
        aggregate(
          col("docs"),
          struct(
            lit(0L).as("bin"),
            lit(0L).as("ftok"),
            lit(0L).as("fbyte"),
            array().cast("array<struct<doc:long,toks:long,bytes:long,bin:long>>").as("out")
          ),
          (acc, d) => {
            val toks = d.getField("toks")
            val bytes = d.getField("bytes")
            val overflow =
              (acc.getField("ftok") + toks > capTokens) ||
                (acc.getField("fbyte") + bytes > capBytes)
            val fresh = overflow && acc.getField("ftok") + acc.getField("fbyte") > 0
            val bin = when(fresh, acc.getField("bin") + 1).otherwise(acc.getField("bin"))
            val ftok = when(fresh, toks).otherwise(acc.getField("ftok") + toks)
            val fbyte = when(fresh, bytes).otherwise(acc.getField("fbyte") + bytes)
            struct(
              bin.as("bin"),
              ftok.as("ftok"),
              fbyte.as("fbyte"),
              concat(
                acc.getField("out"),
                array(struct(
                  d.getField("doc").as("doc"), toks.as("toks"),
                  bytes.as("bytes"), bin.as("bin")))
              ).as("out")
            )
          },
          acc => acc.getField("out")
        ).as("assigned")
      )
      .select(col("grp"), explode(col("assigned")).as("a"))
      .select(
        col("grp"),
        col("a.bin").as("bin"),
        col("a.doc").as("doc"),
        col("a.toks").as("toks"),
        col("a.bytes").as("bytes")
      )

    val wBin = Window.partitionBy(col("grp"), col("bin"))
    packed
      .withColumn("bin_toks", sum(col("toks")).over(wBin))
      .withColumn("bin_bytes", sum(col("bytes")).over(wBin))
      .withColumn("oversize", col("toks") > capTokens || col("bytes") > capBytes)
  }
}
