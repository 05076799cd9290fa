package graft.sources

import graft.SparkSpec
import graft.operators.{Dedup, Kernels}
import org.apache.spark.sql.functions._

class GramHistorySpec extends SparkSpec {

  import spark.implicits._

  private val K = 12

  private def corpusDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog every single morning"),
    (2L, "an entirely different second corpus document with its own words"),
    (3L, "third corpus entry padding the store with more unique grams here"))
    .toDF("doc_id", "text")

  private def naiveFrac(text: String, corpus: Seq[String]): (Long, Long) = {
    val hist = corpus.flatMap(t => Kernels.charGramHashCounts(t, K).keys).toSet
    val grams = Kernels.charGramHashCounts(text, K)
    val total = text.length - K + 1
    val hit = grams.collect { case (g, pc) if hist(g) => pc }.sum
    (total.toLong, hit)
  }

  test("batch probe equals the naive corpus-membership computation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gh").toString
    try {
      GramHistory.create(spark, dir, corpusDocs, K)
      val store = GramHistory.scanOrCompute(spark, dir)(sys.error("unreachable"))
      val corpusTexts = corpusDocs.select("text").as[String].collect().toSeq
      val batch = Seq(
        (10L, "the quick brown fox jumps over the lazy dog every single morning"),
        (11L, "completely novel material sharing nothing whatsoever with history"),
        (12L, "the quick brown fox jumps over something completely novel instead"))
        .toDF("doc_id", "text")
      val got = Dedup.incrementalDupGrams(batch, store, K)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      batch.as[(Long, String)].collect().foreach { case (id, t) =>
        val (total, hit) = naiveFrac(t, corpusTexts)
        assert(got(id) == ((total, hit, hit.toDouble / total)),
          s"doc $id: ${got(id)} != ($total, $hit)")
      }
      // the recrawled doc saturates; the novel doc scores 0
      assert(got(10L)._3 == 1.0)
      assert(got(11L)._3 == 0.0)
      assert(got(12L)._3 > 0.0 && got(12L)._3 < 1.0)
    } finally GramHistory.invalidate(spark, dir)
  }

  test("append extends membership without a read-before-write") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gh-app").toString
    try {
      GramHistory.create(spark, dir, corpusDocs, K)
      val novel = "completely novel material sharing nothing whatsoever with history"
      val store = GramHistory.scanOrCompute(spark, dir)(sys.error("unreachable"))
      val batch = Seq((20L, novel)).toDF("doc_id", "text")
      val before = Dedup.incrementalDupGrams(batch, store, K).collect().head
      assert(before.getDouble(3) == 0.0)
      GramHistory.append(spark, dir,
        GramHistory.gramHashes(Seq((99L, novel)).toDF("doc_id", "text"), K))
      val after = Dedup.incrementalDupGrams(batch,
        GramHistory.scanOrCompute(spark, dir)(sys.error("unreachable")), K)
        .collect().head
      assert(after.getDouble(3) == 1.0,
        s"appended grams not visible: $after")
    } finally GramHistory.invalidate(spark, dir)
  }

  test("compact dedupes cross-append repeats; probes answer identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gh-cpt").toString
    try {
      GramHistory.create(spark, dir, corpusDocs, K)
      val texts = corpusDocs.select("text").as[String].collect()
      // three redundant appends: membership unchanged, stored rows tripled
      (1 to 3).foreach { _ =>
        GramHistory.append(spark, dir, GramHistory.gramHashes(corpusDocs, K))
      }
      val table = GramHistory.tableFor(dir)
      val distinctGrams =
        texts.flatMap(t => Kernels.charGramHashCounts(t, K).keys).toSet.size
      val bloated = spark.table(table).count()
      assert(bloated == 4L * distinctGrams,
        s"fixture must carry repeats: $bloated vs $distinctGrams distinct")
      val batch = Seq(
        (40L, texts.head),
        (41L, "completely novel material sharing nothing whatsoever with history"))
        .toDF("doc_id", "text")
      def probe() = Dedup.incrementalDupGrams(batch,
          GramHistory.scanOrCompute(spark, dir)(sys.error("unreachable")), K)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val before = probe()
      GramHistory.compact(spark, dir)
      assert(spark.table(table).count() == distinctGrams,
        "compact must rewrite the store to its distinct grams")
      assert(probe() == before, "compaction changed probe answers")
      // the rewritten table still carries the bucket spec the
      // no-exchange probe plan rides (the gate below re-checks the plan
      // on a fresh store; here we pin the metadata survived the rename)
      val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $table")
        .collect().map(_.mkString(" ")).mkString("\n")
      assert(desc.contains("Num Buckets") || desc.contains("bucket"),
        s"bucket spec lost in compaction rename:\n$desc")
    } finally GramHistory.invalidate(spark, dir)
  }

  test("probe plan: store scan is map-only — no Exchange, no Sort, never " +
      "broadcast raw") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val dir = java.nio.file.Files.createTempDirectory("graft-gh-plan").toString
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // the fixture store is broadcast-tiny; a 100 TB store is not — the
    // auto-broadcast kill verifies only the EXPLICIT batch-bounded hints
    // broadcast (raw-store broadcast is asserted absent below)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      GramHistory.create(spark, dir, corpusDocs, K)
      val batch =
        Seq((30L, "the quick brown fox jumps over the lazy dog every single morning"))
          .toDF("doc_id", "text")
      val probe = Dedup.incrementalDupGrams(batch,
        GramHistory.probeHistory(spark, dir,
          GramHistory.gramHashes(batch, K))(sys.error("unreachable")),
        K, broadcastProbe = false)
      val exec = probe.queryExecution.executedPlan
      // a hist scan reachable without crossing a join = the raw store
      // relation itself (downstream of a join it is already probe-reduced).
      // The probe reads the store FILES as plain parquet (Bucketing
      // .probeScan), so match by location too, not just catalog identity
      def isHistScan(p: SparkPlan): Boolean = p match {
        case s: FileSourceScanExec =>
          s.tableIdentifier.exists(_.table.startsWith("graft_gram_history")) ||
            s.relation.location.rootPaths.exists(
              _.toString.contains("graft_gram_history"))
        case _ => false
      }
      def rawScanBeneath(p: SparkPlan): Boolean = p match {
        case _: BaseJoinExec => false
        case s if isHistScan(s) => true
        case other => other.children.exists(rawScanBeneath)
      }
      assert(exec.collectFirst {
        case s: FileSourceScanExec if isHistScan(s) => s
      }.isDefined, s"probe does not scan the gram-history table:\n$exec")
      // no exchange above the raw store scan: the scan streams map-side
      // into the broadcast-semi verify (the pre-round-17 shape shuffled
      // nothing either, but SORTED the whole store per probe — gone too)
      val shuffled = exec.collect {
        case e: ShuffleExchangeExec if rawScanBeneath(e.child) => e
      }
      assert(shuffled.isEmpty, s"raw store relation shuffles:\n$exec")
      val sorted = exec.collect {
        case s: SortExec if rawScanBeneath(s.child) => s
      }
      assert(sorted.isEmpty,
        s"store side re-sorts per probe (the cost that grew with " +
          s"history):\n$exec")
      // the store itself must never be the broadcast side (only the
      // batch-bounded key set and the probe-reduced result may ship)
      val rawBroadcast = exec.collect {
        case b: BroadcastExchangeExec if rawScanBeneath(b.child) => b
      }
      assert(rawBroadcast.isEmpty, s"raw store relation broadcasts:\n$exec")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      GramHistory.invalidate(spark, dir)
    }
  }

  test("bloom sidecar: a fully-disjoint batch probes ZERO store files") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft-gh-bloom").toString
    try {
      GramHistory.create(spark, dir, corpusDocs, K)
      val table = GramHistory.tableFor(dir)
      assert(KeyBloom.read(spark, Bucketing.guardBase(spark, table)).isDefined,
        "create() must write the bloom sidecar")
      val batch = Seq(
        (50L, "zq xv jw kf yb zq xv jw kf yb zq xv jw kf yb zq xv jw kf yb"))
        .toDF("doc_id", "text")
      val probe = Dedup.incrementalDupGrams(batch,
        GramHistory.probeHistory(spark, dir,
          GramHistory.gramHashes(batch, K))(sys.error("unreachable")),
        K, broadcastProbe = false)
      val rows = probe.collect()
      assert(rows.length == 1 && rows.head.getDouble(3) == 0.0,
        s"disjoint batch must score 0.0: ${rows.mkString}")
      // every batch key missed the bloom (no false negatives exist, and
      // this fixture's keys are deterministic), so the probe plan must
      // not touch the store at all — the zero-read short-circuit
      val histScans = probe.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec
          if s.tableIdentifier.exists(
            _.table.startsWith("graft_gram_history")) ||
            s.relation.location.rootPaths.exists(
              _.toString.contains("graft_gram_history")) => s
      }
      assert(histScans.isEmpty,
        s"disjoint probe still scans the store:\n" +
          probe.queryExecution.executedPlan)
    } finally GramHistory.invalidate(spark, dir)
  }

  test("bloom sidecar: appends fold in (no false negatives), compact " +
      "re-sizes, a dropped sidecar degrades to the plain scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gh-bloom2").toString
    try {
      GramHistory.create(spark, dir, corpusDocs, K)
      val table = GramHistory.tableFor(dir)
      val base = Bucketing.guardBase(spark, table)
      val novel = "completely novel material sharing nothing whatsoever with history"
      GramHistory.append(spark, dir,
        GramHistory.gramHashes(Seq((99L, novel)).toDF("doc_id", "text"), K))
      // the appended grams MUST be bloom-visible: a probe for them goes
      // through candidates (a stale sidecar here would silently zero it)
      val batch = Seq((60L, novel)).toDF("doc_id", "text")
      def frac(): Double = Dedup.incrementalDupGrams(batch,
        GramHistory.probeHistory(spark, dir,
          GramHistory.gramHashes(batch, K))(sys.error("unreachable")),
        K, broadcastProbe = false).collect().head.getDouble(3)
      assert(frac() == 1.0, "append not visible through the bloom path")
      // compact re-sizes the sidecar to the surviving distinct keys
      GramHistory.compact(spark, dir)
      val meta = KeyBloom.read(spark, base).map(_._2)
      assert(meta.isDefined, "compact must rebuild the sidecar")
      assert(meta.get.inserted == spark.table(table).count(),
        s"compact sidecar sized to ${meta.get.inserted}, " +
          s"table has ${spark.table(table).count()}")
      assert(frac() == 1.0, "probe answers changed across compact")
      // sidecar dropped (legacy store): probe falls back to the plain
      // scan and still answers exactly
      KeyBloom.delete(spark, base)
      assert(frac() == 1.0, "legacy fallback path broke the probe")
    } finally GramHistory.invalidate(spark, dir)
  }
}
