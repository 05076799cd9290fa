package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the two COMPOSITION contracts the 100× pipeline rehearsal caught
  * (PipelineRehearsal scaladoc), against the exact production stage
  * functions — failures here are failures no per-operator gate can see:
  *
  *  1. the quality stage's nll threshold must be a PERCENTILE of the
  *     corpus being curated: a threshold pinned on one corpus's nll
  *     distribution curates a distribution-shifted corpus to zero docs;
  *  2. near-dup dedup must run BEFORE the LM filter (the CCNet order):
  *     when a dup class is high-perplexity, filtering first deletes every
  *     member and the dedup stage resolves nothing — the class exits the
  *     pipeline by the WRONG mechanism (all copies gone, no keeper).
  */
class CompositionSpec extends SparkSpec {

  import spark.implicits._

  /** ~40 unique rare tokens nobody else uses: passes the gate (25–90
    * tokens, zero repetition), scores near-max nll under the self-trained
    * unigram LM, and never collides with base-corpus shingles.
    */
  private def rareText(seed: Int, tail: String): String =
    ((0 until 39).map(i => s"zq${seed}x$i") :+ tail).mkString(" ")

  /** Base corpus (real sf docs) + a planted 3-member near-dup class: same
    * lang, same length window, pairwise trigram-shingle Jaccard ≥ 0.8
    * (docs differ in ONE tail token), all tokens unique to the class.
    */
  private lazy val plantedIds = Seq(900001L, 900002L, 900003L)
  private lazy val corpus: DataFrame = {
    val base = graft.queries.Tables.documents(spark, Sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    // pairwise distinct texts (exact dedup must NOT touch the class) that
    // differ in ONE tail token: 36/42 shared trigram shingles ≈ 0.86 ≥ 0.8
    val t0 = rareText(7, "zqtaila")
    val t1 = rareText(7, "zqtailb")
    val t2 = rareText(7, "zqtailc")
    val planted = Seq(
      (900001L, t0, "en", "src0", t0.length.toLong),
      (900002L, t1, "en", "src0", t1.length.toLong),
      (900003L, t2, "en", "src0", t2.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    base.unionByName(planted).cache()
  }

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  test("quality threshold transfers as a percentile; the pinned threshold curates a shifted corpus to zero") {
    // a corpus whose every doc is rare-token soup: self-trained unigram
    // nll is ~ln(vocab) >> the registry's pinned MaxNll (3.45, derived
    // from the BASE corpus's distribution — x101's oracle convenience)
    val shifted = (0 until 300).map { i =>
      (i.toLong, (0 until 30).map(j => s"sh${i}w$j").mkString(" "),
        "en", 0L)
    }.toDF("doc_id", "text", "lang", "n_chars")
      .withColumn("n_tokens", lit(30L))
    val nll = graft.operators.UnigramLm.selfScore(shifted)
    val pinnedKept = nll
      .filter(col("nll") <= graft.queries.CurationOps.MaxNll).count()
    assert(pinnedKept == 0L,
      s"fixture too tame: pinned MaxNll kept $pinnedKept shifted docs — " +
        "the non-transfer this spec pins would not reproduce")
    // the production stage derives p95 from the corpus it curates —
    // survivors must be ~95% regardless of where the distribution sits
    val kept = PipelineRehearsal.qualityStage(shifted).count()
    val frac = kept.toDouble / 300
    assert(frac >= 0.90 && frac <= 1.0,
      f"percentile-derived gate kept $kept/300 ($frac%.2f) of the shifted corpus")
    // and on the real corpus the same stage keeps ~p95 too (no special-
    // casing: one rule, both distributions)
    val realDocs = PipelineRehearsal.gateStage(
      graft.queries.Tables.documents(spark, Sf))
    val realIn = realDocs.count()
    val realKept = PipelineRehearsal.qualityStage(realDocs).count()
    val realFrac = realKept.toDouble / realIn
    assert(realFrac >= 0.90 && realFrac <= 1.0,
      f"kept $realKept/$realIn ($realFrac%.2f) of the real corpus")
  }

  test("dedup before the LM filter resolves the high-perplexity dup class; the reversed order deletes it unresolved") {
    val gated = PipelineRehearsal.gateStage(corpus).cache()
    assert(plantedIds.toSet.subsetOf(ids(gated)),
      "planted class must survive the heuristic gate for the order to matter")

    // the planted class IS high-perplexity: every member above the
    // combined corpus's p95 (the premise that makes order destructive)
    val nll = graft.operators.UnigramLm.selfScore(gated)
    val p95 = nll.agg(expr("approx_percentile(nll, 0.95)"))
      .collect().head.getDouble(0)
    val plantedNll = nll.filter(col("doc_id").isin(plantedIds: _*))
      .select(min(col("nll"))).collect().head.getDouble(0)
    assert(plantedNll > p95,
      f"fixture premise broken: planted min nll $plantedNll%.3f <= p95 $p95%.3f")

    // CCNet order: dedup sees the class, resolves ONE keeper
    val pairsRight = graft.queries.TextOps.lshNearDupPairsOf(gated)
      .filter(col("doc_a").isin(plantedIds: _*) &&
        col("doc_b").isin(plantedIds: _*))
    assert(pairsRight.count() >= 2,
      "dedup-first must surface the planted pairs")
    val deduped = PipelineRehearsal.dedupStage(gated)
    assert((ids(deduped) & plantedIds.toSet).size == 1,
      "dedup-first must keep exactly one class member")

    // reversed order: the LM filter deletes every member first — zero
    // pairs reach dedup, the class exits with NO keeper
    val filteredFirst = PipelineRehearsal.qualityStage(gated)
      .join(gated.select("doc_id", "n_chars"), Seq("doc_id"))
    assert((ids(filteredFirst) & plantedIds.toSet).isEmpty,
      "premise: the LM gate removes the whole high-perplexity class")
    val pairsWrong = graft.queries.TextOps.lshNearDupPairsOf(filteredFirst)
      .filter(col("doc_a").isin(plantedIds: _*) ||
        col("doc_b").isin(plantedIds: _*))
    assert(pairsWrong.count() == 0,
      "filter-first leaves dedup nothing of the class to resolve")
    gated.unpersist(false)
  }

  test("x117 composes leak-free: two evaluations leave no net cached relations") {
    // the build-scoped persists (cleaned/scored, five consumers) must be
    // released before the builder returns — a library caller composing
    // the entry N times must not accumulate CacheManager entries (the
    // round-13 ADVICE leak). The builders materialize their bounded
    // per-lang result eagerly, so building IS evaluating.
    def rddKeys = spark.sparkContext.getPersistentRDDs.keySet
    val before = rddKeys
    val r1 = graft.SparkEntry.queries("x117_curation_v3")(spark, Sf).collect()
    val r2 = graft.SparkEntry.queries("x117_curation_v3")(spark, Sf).collect()
    graft.SparkEntry.queries("x115_percentile_gate")(spark, Sf).collect(): Unit
    val leaked = rddKeys -- before
    assert(leaked.isEmpty,
      s"x115/x117 builders leaked cached RDDs: $leaked")
    assert(r1.map(_.toString).sorted.sameElements(r2.map(_.toString).sorted),
      "repeated x117 evaluations must agree")
  }
}
