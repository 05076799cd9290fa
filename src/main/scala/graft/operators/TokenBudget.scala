package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Token-budget corpus cut: keep documents, in a deterministic hash order,
  * until each group's running token total reaches a budget — "give me B
  * tokens per language" is how training mixes are actually specified
  * (source/language budgets, not row counts).
  *
  * Semantics: within each group, order docs by (md5(doc_id), doc_id) — the
  * same stable, corpus-growth-insensitive order as x67/x68/x80 — and keep a
  * doc iff the running token sum INCLUDING it is <= budget.
  *
  * Scale shape — exact two-phase running sum, no per-group serialization:
  * the naive plan (`SUM OVER (PARTITION BY grp ORDER BY h)`) sorts each
  * group into ONE reducer, and one language can be half a 100 TB corpus.
  * Instead the hash order is split at its first two hex chars (256 range
  * buckets, monotonic with the full hash order since a fixed-width
  * lowercase-hex prefix sorts identically as string and as integer):
  *
  *  - phase 1: per-(group, bucket) token totals — one map-combined
  *    aggregate over the corpus projection; the exclusive prefix offsets
  *    per group come from a window over that groups x 256 GRID (tiny, so
  *    its one-reducer-per-group sort is free), never from driver code;
  *  - phase 2: the running sum within each (group, bucket) — 256-way
  *    parallel window sorts — plus the bucket's offset, broadcast-joined
  *    back (null-safe on the group, so NULL-group docs cut exactly like
  *    the naive plan's NULL partition).
  *
  * The result is bit-identical to the single-window plan (the spec asserts
  * exactly that, including NULL groups); only the parallelism differs.
  */
object TokenBudget {

  /** Kept docs under a per-group token budget:
    * (doc_id, <groupCol>, n_tokens, cum_tokens). The corpus projection is
    * cached across the two phases and the (budget-bounded) result is
    * materialized EAGERLY so the cache is released here rather than pinned
    * for the session lifetime — same contract as the other eager builders
    * ([[graft.util.Materialize]]).
    */
  def budgetCut(docs: DataFrame, budget: Long, groupCol: String = "lang",
                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val base = baseOf(docs, groupCol, textCol, idCol).cache()
    val out = graft.util.Materialize.eager(
      cutPlan(base, budget, groupCol))
    base.unpersist(false)
    out
  }

  /** The un-materialized two-phase plan over an un-cached projection —
    * plan-shape gates (PlanSpec) and spec comparisons build through this.
    */
  def budgetCutPlan(docs: DataFrame, budget: Long, groupCol: String = "lang",
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    cutPlan(baseOf(docs, groupCol, textCol, idCol), budget, groupCol)

  /** Same cut over PRECOMPUTED per-doc token counts — the entry point when
    * the denomination is a trained tokenizer's ([[Bpe.tokenCounts]]) rather
    * than the whitespace split. `counts` = (idCol, groupCol, n_tokens);
    * identical two-phase plan, identical semantics.
    */
  def budgetCutFromCounts(counts: DataFrame, budget: Long,
                          groupCol: String = "lang",
                          idCol: String = "doc_id"): DataFrame = {
    val base = baseFromCounts(
      counts.select(col(idCol), col(groupCol),
        col("n_tokens").cast(LongType).as("n_tokens")),
      groupCol, idCol).cache()
    val out = graft.util.Materialize.eager(cutPlan(base, budget, groupCol))
    base.unpersist(false)
    out
  }

  /** (doc_id, grp, n_tokens, h, bucket) corpus projection. */
  private def baseOf(docs: DataFrame, groupCol: String, textCol: String,
                     idCol: String): DataFrame =
    baseFromCounts(
      docs.select(col(idCol), col(groupCol),
        size(split(col(textCol), "\\s+")).cast(LongType).as("n_tokens")),
      groupCol, idCol)

  /** The ONE definition of the hash-ordered, 256-bucketed projection. */
  private def baseFromCounts(counts: DataFrame, groupCol: String,
                             idCol: String): DataFrame =
    counts.select(
        col(idCol).cast(LongType).as("doc_id"),
        col(groupCol).as("grp"),
        col("n_tokens"),
        md5(col(idCol).cast(StringType)).as("h"))
      .withColumn("bucket",
        conv(substring(col("h"), 1, 2), 16, 10).cast(IntegerType))

  private def cutPlan(base: DataFrame, budget: Long, groupCol: String): DataFrame = {
    // phase 1: per-(group, bucket) totals -> exclusive prefix offsets, via
    // a window over the groups x 256 grid (tiny — its per-group sort is
    // nothing like the corpus-wide sort the naive plan pays)
    val gridW = Window.partitionBy(col("ogrp")).orderBy(col("obucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offDf = base.groupBy(col("grp").as("ogrp"), col("bucket").as("obucket"))
      .agg(sum(col("n_tokens")).as("t"))
      .withColumn("off", coalesce(sum(col("t")).over(gridW), lit(0L)))
      .drop("t")
    // phase 2: 256-way-parallel within-bucket running sums + the offset;
    // null-safe group equality keeps NULL-group docs (the naive window
    // treats NULL as its own partition, so the fast plan must too)
    val w = Window.partitionBy(col("grp"), col("bucket"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(offDf),
        col("grp") <=> col("ogrp") && col("bucket") === col("obucket"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w) + col("off"))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("grp").as(groupCol),
        col("n_tokens"), col("cum_tokens"))
  }

  /** The naive one-window-per-group plan — the semantics oracle for
    * [[budgetCut]] (one reducer per group; test/verification use only).
    */
  def budgetCutNaive(docs: DataFrame, budget: Long, groupCol: String = "lang",
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val base = docs.select(
      col(idCol).cast(LongType).as("doc_id"),
      col(groupCol).as("grp"),
      size(split(col(textCol), "\\s+")).cast(LongType).as("n_tokens"),
      md5(col(idCol).cast(StringType)).as("h"))
    val w = Window.partitionBy(col("grp")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("grp").as(groupCol),
        col("n_tokens"), col("cum_tokens"))
  }
}
