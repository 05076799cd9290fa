package graft.sources

import graft.SparkSpec
import graft.operators.{Dedup, Kernels}
import graft.queries.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MinHashHistorySpec extends SparkSpec {

  import spark.implicits._

  // 30-token docs: 28 trigrams, so a one-token tail edit shares 26 of 30
  // distinct trigrams — Jaccard 26/30 ≈ 0.867, safely over the 0.8 cut
  private val baseText =
    (1 to 29).map(i => s"tok$i").mkString(" ") + " tail"
  private val nearText =
    (1 to 29).map(i => s"tok$i").mkString(" ") + " edited"
  private val otherText =
    (1 to 30).map(i => s"other$i").mkString(" ")
  private val novelText =
    (1 to 30).map(i => s"novel$i").mkString(" ")

  private def doc(id: Long, text: String, lang: String = "en") =
    (id, text, lang, text.length.toLong)

  private def histDocs: DataFrame = Seq(
    doc(1L, baseText), doc(2L, otherText), doc(3L, baseText, lang = "fr"))
    .toDF("doc_id", "text", "lang", "n_chars")

  private def batchDocs: DataFrame = Seq(
    doc(10L, baseText),  // verbatim recrawl of 1 → jaccard 1.0
    doc(11L, nearText),  // near-dup of 1 → 26/30
    doc(12L, novelText), // no history match
    doc(13L, baseText, lang = "de")) // text of 1, wrong lang → filtered
    .toDF("doc_id", "text", "lang", "n_chars")

  /** Engine-independent expected answer: exhaustive cross Jaccard over
    * string trigram sets with the same-lang + length-window restriction.
    */
  private def naivePairs: Set[(Long, Long, Double)] = {
    def rows(df: DataFrame) = df.collect().map(r =>
      (r.getLong(0), Kernels.wordTrigramSet(r.getString(1)).toSet,
        r.getString(2), r.getLong(3)))
    (for {
      (bi, bs, bl, bn) <- rows(batchDocs); (hi, hs, hl, hn) <- rows(histDocs)
      if bl == hl && math.abs(bn - hn) * 2 <= math.max(bn, hn)
      inter = (bs & hs).size
      if bs.nonEmpty && hs.nonEmpty
      j = inter.toDouble / (bs.size + hs.size - inter)
      if j >= 0.8
    } yield (bi, hi, j)).toSet
  }

  private def got(bands: DataFrame, sh: DataFrame): Set[(Long, Long, Double)] =
    Dedup.incrementalNearDups(TextOps.shingleArrays(batchDocs), bands, sh)
      .as[(Long, Long, Double)].collect().toSet

  test("store probe equals the exhaustive cross-Jaccard answer") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mh").toString
    try {
      MinHashHistory.create(spark, dir,
        TextOps.minHashBandsOf(histDocs), TextOps.minHashShinglesOf(histDocs))
      val (bands, sh) = MinHashHistory.scanOrCompute(spark, dir)(
        sys.error("unreachable"))
      val want = naivePairs
      assert(got(bands, sh) == want, s"got ${got(bands, sh)}, want $want")
      // the fixture exercises a verbatim recrawl (exactly 1.0), a true
      // near-dup strictly inside (0.8, 1), a novel doc and a lang mismatch
      assert(want.contains((10L, 1L, 1.0)))
      assert(want.exists(p => p._1 == 11L && p._3 > 0.8 && p._3 < 1.0))
      assert(!want.exists(_._1 == 12L), "novel doc matched history")
      assert(!want.exists(_._1 == 13L), "cross-lang twin escaped the filter")
    } finally MinHashHistory.invalidate(spark, dir)
  }

  test("bloomStat: healthy on a fresh store, None once unregistered") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-stat").toString
    try {
      MinHashHistory.create(spark, dir,
        TextOps.minHashBandsOf(histDocs), TextOps.minHashShinglesOf(histDocs))
      val s = MinHashHistory.bloomStat(spark, dir).getOrElse(
        fail("no saturation stat for a store created WITH a sidecar"))
      assert(s.fill > 0.0 && s.fill <= 0.51 &&
        s.effFpp < KeyBloom.DefaultFpp,
        s"fresh band store's saturation stat out of band: $s")
    } finally MinHashHistory.invalidate(spark, dir)
    assert(MinHashHistory.bloomStat(spark, dir).isEmpty,
      "stat served for an unregistered store")
  }

  test("standalone fallback (no producer) answers identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-fb").toString
    try {
      val (bands, sh) = MinHashHistory.scanOrCompute(spark, dir)(
        (TextOps.minHashBandsOf(histDocs), TextOps.minHashShinglesOf(histDocs)))
      assert(got(bands, sh) == naivePairs)
    } finally MinHashHistory.invalidate(spark, dir)
  }

  test("append extends the history; compact preserves answers and layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-app").toString
    try {
      MinHashHistory.create(spark, dir,
        TextOps.minHashBandsOf(histDocs), TextOps.minHashShinglesOf(histDocs))
      // fresh scans per probe: compaction rewrites the backing files, so a
      // captured relation would hold a stale file listing
      def probe() = {
        val (bands, sh) = MinHashHistory.scanOrCompute(spark, dir)(
          sys.error("unreachable"))
        got(bands, sh)
      }
      assert(!probe().exists(_._1 == 12L))
      // ingest the novel text as history doc 4 — the probe must now pair it
      val newHist = Seq(doc(4L, novelText)).toDF("doc_id", "text", "lang", "n_chars")
      MinHashHistory.append(spark, dir,
        TextOps.minHashBandsOf(newHist), TextOps.minHashShinglesOf(newHist))
      val after = probe()
      assert(after.contains((12L, 4L, 1.0)), s"appended doc not visible: $after")
      // a replay double-append inflates intersections AND denominators
      // (multiset caveat); compact restores distinct rows and the answers
      MinHashHistory.append(spark, dir,
        TextOps.minHashBandsOf(histDocs), TextOps.minHashShinglesOf(histDocs))
      val table = MinHashHistory.tableFor(dir)
      val bloated = spark.table(MinHashHistory.shTableFor(dir)).count()
      MinHashHistory.compact(spark, dir)
      assert(spark.table(MinHashHistory.shTableFor(dir)).count() < bloated,
        "compact did not shrink the bloated shingle relation")
      assert(probe() == after, "compaction changed probe answers")
      val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $table")
        .collect().map(_.mkString(" ")).mkString("\n")
      assert(desc.contains("Num Buckets") || desc.contains("bucket"),
        s"bucket spec lost in compaction rename:\n$desc")
    } finally MinHashHistory.invalidate(spark, dir)
  }

  test("probe plans: store scans are map-only — no Exchange, no Sort, " +
      "never broadcast raw") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-plan").toString
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // the fixture store is broadcast-tiny; a 100 TB store is not — the
    // auto-broadcast kill verifies only the EXPLICIT batch-bounded hints
    // broadcast (raw-store broadcast is asserted absent below)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // a probe scan reads the store FILES as plain parquet
    // (Bucketing.probeScan) — match by location, not catalog identity
    def isHistScan(p: SparkPlan): Boolean = p match {
      case s: FileSourceScanExec =>
        s.tableIdentifier.exists(
          _.table.startsWith("graft_minhash_history")) ||
          s.relation.location.rootPaths.exists(
            _.toString.contains("graft_minhash_history"))
      case _ => false
    }
    def rawScanBeneath(p: SparkPlan): Boolean = p match {
      case _: BaseJoinExec => false
      case s if isHistScan(s) => true
      case other => other.children.exists(rawScanBeneath)
    }
    def gate(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.count()
      val exec = df.queryExecution.executedPlan
      assert(exec.collectFirst {
        case s: FileSourceScanExec if isHistScan(s) => s
      }.isDefined, s"$label does not scan its store:\n$exec")
      assert(exec.collect {
        case e: ShuffleExchangeExec if rawScanBeneath(e.child) => e
      }.isEmpty, s"$label: raw store relation shuffles:\n$exec")
      assert(exec.collect {
        case s: SortExec if rawScanBeneath(s.child) => s
      }.isEmpty, s"$label: store side re-sorts per probe:\n$exec")
      assert(exec.collect {
        case b: BroadcastExchangeExec if rawScanBeneath(b.child) => b
      }.isEmpty, s"$label: raw store relation broadcasts:\n$exec")
    }
    try {
      MinHashHistory.create(spark, dir,
        TextOps.minHashBandsOf(histDocs), TextOps.minHashShinglesOf(histDocs))
      val (bands, sh) = MinHashHistory.scanOrCompute(spark, dir)(
        sys.error("unreachable"))
      // the two store-scanning stages of incrementalNearDups, pre-
      // materialization (the operator checkpoints their small results, so
      // the final frame's executed plan no longer shows the store scans)
      val batchArrs = TextOps.shingleArrays(batchDocs)
        .filter(org.apache.spark.sql.functions.col("lang").isNotNull)
      val cands = Dedup.nearDupCandidates(batchArrs, bands, 128, 32)
      gate("candidate probe", cands)
      gate("verify fetch", Dedup.verifySliceOf(sh, cands))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      MinHashHistory.invalidate(spark, dir)
    }
  }

  test("null-lang docs never pair (SQL lang-equality semantics)") {
    // the oracle's b.lang = h.lang is three-valued: NULL = NULL is not
    // TRUE, so two null-lang twins must NOT pair — while an unguarded
    // xxhash64(bucket, lang) fold would skip the null and pair them
    val hist = Seq(doc(1L, baseText), doc(2L, baseText, lang = null))
      .toDF("doc_id", "text", "lang", "n_chars")
    val batch = Seq(doc(10L, baseText), doc(11L, baseText, lang = null))
      .toDF("doc_id", "text", "lang", "n_chars")
    val pairs = Dedup.incrementalNearDups(
      TextOps.shingleArrays(batch),
      TextOps.minHashBandsOf(hist), TextOps.minHashShinglesOf(hist))
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs == Set((10L, 1L, 1.0)),
      s"null-lang docs leaked into the pair set: $pairs")
  }

  test("broadcast budget guard: an over-budget band relation degrades to " +
      "the non-broadcast join — answers unchanged, no broadcast anywhere") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-budget").toString
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(graft.util.ProbeBudget.Conf, "1")
    try {
      MinHashHistory.create(spark, dir,
        TextOps.minHashBandsOf(histDocs), TextOps.minHashShinglesOf(histDocs))
      val (bands, sh) = MinHashHistory.scanOrCompute(spark, dir)(
        sys.error("unreachable"))
      assert(got(bands, sh) == naivePairs,
        "over-budget fallback changed near-dup answers")
      val probe = Dedup.incrementalNearDups(
        TextOps.shingleArrays(batchDocs), bands, sh)
      val bcasts = probe.queryExecution.executedPlan.collect {
        case b: BroadcastExchangeExec => b
      }
      assert(bcasts.isEmpty,
        s"over-budget probe still broadcasts:\n" +
          probe.queryExecution.executedPlan)
    } finally {
      spark.conf.unset(graft.util.ProbeBudget.Conf)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      MinHashHistory.invalidate(spark, dir)
    }
  }

  test("EMPTY store: create from no docs, reducer-gated probe pairs " +
      "nothing and throws nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-empty").toString
    try {
      val none = histDocs.limit(0)
      MinHashHistory.create(spark, dir,
        TextOps.minHashBandsOf(none), TextOps.minHashShinglesOf(none))
      val (bands, sh) = MinHashHistory.scanOrCompute(spark, dir)(
        sys.error("unreachable"))
      val pairs = Dedup.incrementalNearDups(
          TextOps.shingleArrays(batchDocs), bands, sh,
          bandReducer = MinHashHistory.bandScanReducer(spark, dir))
        .collect()
      assert(pairs.isEmpty, s"empty store produced pairs: ${pairs.toSeq}")
    } finally MinHashHistory.invalidate(spark, dir)
  }

  test("bloom-gated band reducer: a fully-novel batch reads ZERO band-store " +
      "AND zero shingle-store files; store answers unchanged with it") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-bloom").toString
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      MinHashHistory.create(spark, dir,
        TextOps.minHashBandsOf(histDocs), TextOps.minHashShinglesOf(histDocs))
      val (bands, sh) = MinHashHistory.scanOrCompute(spark, dir)(
        sys.error("unreachable"))
      val reducer = MinHashHistory.bandScanReducer(spark, dir)
      assert(reducer.isDefined, "registered store must offer a reducer")
      // the store-served answer is unchanged by the reducer (the bloom
      // cut has no false negatives; pruning only drops non-candidate
      // bucket FILES)
      val gotReduced = Dedup.incrementalNearDups(
          TextOps.shingleArrays(batchDocs), bands, sh,
          bandReducer = reducer)
        .as[(Long, Long, Double)].collect().toSet
      assert(gotReduced == naivePairs,
        s"reducer changed answers: $gotReduced vs $naivePairs")
      // fully-novel batch: every band key misses the bloom — the probe
      // plan touches NEITHER store relation (band leg bloom-gated, the
      // shingle verify skipped by the operator's empty-candidates exit)
      val novel = Seq(
        doc(30L, (1 to 30).map(i => s"fresh$i").mkString(" ")),
        doc(31L, (1 to 30).map(i => s"unseen$i").mkString(" ")))
        .toDF("doc_id", "text", "lang", "n_chars")
      val probe = Dedup.incrementalNearDups(
        TextOps.shingleArrays(novel), bands, sh, bandReducer = reducer)
      assert(probe.collect().isEmpty)
      val histScans = probe.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(
            _.toString.contains("graft_minhash_history")) => s
      }
      assert(histScans.isEmpty,
        s"novel batch still scans a minhash store relation:\n" +
          probe.queryExecution.executedPlan)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      MinHashHistory.invalidate(spark, dir)
    }
  }

  test("x123 registry entry probes the persisted store when one is registered") {
    val d = Sf
    try {
      MinHashHistory.create(spark, d,
        TextOps.x123HistoryBands(spark, d), TextOps.x123HistoryShingles(spark, d))
      val stored = graft.queries.TextOps.x123_incremental_neardup
        .build(spark, d).collect().map(_.toSeq).toSet
      MinHashHistory.invalidate(spark, d)
      val derived = graft.queries.TextOps.x123_incremental_neardup
        .build(spark, d).collect().map(_.toSeq).toSet
      assert(stored == derived,
        "store-served probe diverges from the derived-history answer")
      assert(stored.nonEmpty, "sf0.001 split produced no near-dup pairs")
    } finally MinHashHistory.invalidate(spark, d)
  }
}
