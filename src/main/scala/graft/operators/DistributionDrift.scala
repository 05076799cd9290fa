package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Token-distribution drift between corpus slices — the data-mixing
  * diagnostic of LLM curation: KL(P_slice ‖ P_corpus) per slice answers
  * "which source/domain/shard looks least like the mix I am training on"
  * (domain reweighting, ingest anomaly detection, x80's mixing knobs).
  *
  * Definition: both distributions are add-one smoothed over the CORPUS
  * vocabulary (V tokens), closed — the per-slice grid enumerates every
  * vocab token, so there is no OOV mass and both measures sum to exactly
  * 1 ( Σ(cs+1) = ns+V over the grid ), making KL ≥ 0 a theorem, not a
  * hope:
  *   ps(t) = (cs(t)+1)/(ns+V),  pc(t) = (c(t)+1)/(N+V)
  *   KL    = Σ_t ps(t) · ln(ps(t)/pc(t))
  *         = Σ_t (cs(t)+1) · lnterm(t)  /  (ns+V)        (exact integers)
  *
  * Exactness: lnterm is integer-scaled (round(ln·1e6) BIGINT, the x95
  * device), the weighted sum is exact integer arithmetic, and the single
  * final division is mirrored verbatim in the DuckDB oracle.
  *
  * Scale: the only corpus-sized shuffle is the (slice, token)
  * aggregation — map-combined over the per-doc kernel's
  * distinct-tokens-per-doc rows. Everything after operates on
  * vocabulary-bounded relations: the grid is slices × V rows built by
  * broadcasting the tiny slice-totals side under the distributed vocab
  * (no shuffle), and the slice-counts side broadcasts back onto it. With
  * x95's `vocabCap` discipline applied upstream, V stays bounded at
  * 100 TB.
  */
object DistributionDrift {

  /** (slice, tok, cs) from the per-doc token kernel — occurrences never
    * cross the shuffle, only per-doc-distinct (tok, tf) rows.
    */
  def sliceTokenCounts(docs: DataFrame, sliceCol: String,
                       minLen: Int = UnigramLm.MinTokenLen): DataFrame = {
    val tokCounts = udf((t: String) => Kernels.tokenCounts(t, minLen))
    docs.select(col(sliceCol).as("slice"),
        explode(tokCounts(lower(col("text")))).as(Seq("tok", "tf")))
      .groupBy(col("slice"), col("tok")).agg(sum(col("tf")).as("cs"))
  }

  /** Integer-scaled ln(ps/pc); `cs` may be a left-join miss (null → 0).
    * Mirrored verbatim by [[oracleTermSql]].
    */
  def scaledLogRatio(cs: Column, ns: Column, c: Column,
                     nTotal: Column, v: Column): Column =
    round(log(
      ((coalesce(cs, lit(0L)) + lit(1.0)) / (ns + v + lit(0.0))) /
        ((c + lit(1.0)) / (nTotal + v + lit(0.0)))) * UnigramLm.LnScale)
      .cast(LongType)

  /** DuckDB twin of [[scaledLogRatio]] — same operation tree. */
  def oracleTermSql(cs: String, ns: String, c: String,
                    nTotal: String, v: String): String =
    s"CAST(ROUND(LN(((COALESCE($cs, 0) + 1.0) / ($ns + $v + 0.0)) / " +
      s"(($c + 1.0) / ($nTotal + $v + 0.0))) * ${UnigramLm.LnScale}) AS BIGINT)"

  /** KL(P_slice ‖ P_corpus) per distinct value of `sliceCol`.
    * Output: (slice, n_toks, kl) — kl in nats, ≥ 0, rounded 6dp.
    */
  def sourceKl(docs: DataFrame, sliceCol: String = "source",
               minLen: Int = UnigramLm.MinTokenLen): DataFrame = {
    val tf = sliceTokenCounts(docs, sliceCol, minLen)
    val vocab = tf.groupBy(col("tok")).agg(sum(col("cs")).as("c"))
    val scalars = vocab.agg(sum(col("c")).as("n_total"), count(lit(1)).as("v"))
    klCore(tf, vocab, scalars)
      .select(col("slice"), col("n_toks"), col("kl"))
  }

  /** Drift of incoming slices against a FROZEN reference distribution
    * (the [[UnigramLm.train]] output over a reference corpus) — the
    * monitoring form: KL is measured over the REFERENCE vocabulary
    * (incoming tokens outside it carry no ps mass — the distribution
    * stays closed and kl ≥ 0 holds), and the discarded mass reports as
    * `oov_rate` (new-token influx is itself a drift signal, surfaced
    * instead of silently folded in). Self-reference identity:
    * against a model trained on the same docs, kl equals [[sourceKl]]
    * exactly and oov_rate is 0 — the spec asserts both.
    * Output: (slice, n_toks, kl, oov_rate); n_toks counts IN-VOCABULARY
    * tokens. A slice with zero in-vocabulary tokens has no closed
    * distribution to compare and emits no row (its influx is 100% OOV —
    * an upstream gate on raw token counts catches that regime).
    */
  def klAgainstReference(docs: DataFrame, vocab: DataFrame, scalars: DataFrame,
                         sliceCol: String = "source",
                         minLen: Int = UnigramLm.MinTokenLen): DataFrame = {
    val tfAll = sliceTokenCounts(docs, sliceCol, minLen)
    val allTotals = tfAll.groupBy(col("slice")).agg(sum(col("cs")).as("n_all"))
    val tf = tfAll.join(broadcast(vocab.select(col("tok"))), Seq("tok"), "left_semi")
    klCore(tf, vocab, scalars)
      .join(broadcast(allTotals), Seq("slice"))
      .select(col("slice"), col("n_toks"), col("kl"),
        ((col("n_all") - col("n_toks")).cast(DoubleType) / col("n_all"))
          .as("oov_rate"))
  }

  /** Shared KL machinery: `tf` must already be restricted to `vocab`'s
    * tokens; slice totals are computed from it (so the measure closes
    * over the vocabulary grid).
    */
  private def klCore(tf: DataFrame, vocab: DataFrame,
                     scalars: DataFrame): DataFrame = {
    val totals = tf.groupBy(col("slice")).agg(sum(col("cs")).as("ns"))
    // grid: V (distributed) × slices (broadcast) — no shuffle
    val grid = vocab.crossJoin(broadcast(totals))
    val terms = grid
      .join(broadcast(tf), Seq("slice", "tok"), "left")
      .crossJoin(broadcast(scalars))
      .select(col("slice"), col("ns"), col("v"),
        (coalesce(col("cs"), lit(0L)) + lit(1L)).as("w"),
        scaledLogRatio(col("cs"), col("ns"), col("c"),
          col("n_total"), col("v")).as("lp"))
    terms.groupBy(col("slice"))
      .agg(max(col("ns")).as("n_toks"), max(col("v")).as("v"),
        sum(col("w") * col("lp")).as("sum_wlp"))
      .select(col("slice"), col("n_toks"),
        round(col("sum_wlp").cast(DoubleType) /
            ((col("n_toks") + col("v")).cast(DoubleType) * UnigramLm.LnScale.toDouble),
          6).as("kl"))
  }
}
