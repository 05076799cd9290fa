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

  test("bloomStat: the saturation trigger statistic reads healthy on a " +
      "fresh store and disappears with the registration") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gh").toString
    try {
      GramHistory.create(spark, dir, corpusDocs, K)
      val s = GramHistory.bloomStat(spark, dir).getOrElse(
        fail("no saturation stat for a store created WITH a sidecar"))
      assert(s.fill > 0.0 && s.fill <= 0.51 &&
        s.effFpp < KeyBloom.DefaultFpp,
        s"fresh gram store's saturation stat out of band: $s")
    } finally GramHistory.invalidate(spark, dir)
    assert(GramHistory.bloomStat(spark, dir).isEmpty,
      "stat served for an unregistered store")
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
    // AQE wraps the executed plan in an adaptive node that hides the
    // scans from collect() — the file-scan assertion below would pass
    // VACUOUSLY with it on
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      GramHistory.create(spark, dir, corpusDocs, K)
      val table = GramHistory.tableFor(dir)
      assert(KeyBloom.readMeta(spark, Bucketing.guardBase(spark, table)).isDefined,
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
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      GramHistory.invalidate(spark, dir)
    }
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
      val meta = KeyBloom.readMeta(spark, base)
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

  test("bloom-bucket routing matches the table's bucketBy layout: every " +
      "key's pmod(murmur3) bucket is its part file's encoded bucket id") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gh-route").toString
    try {
      GramHistory.create(spark, dir, corpusDocs, K)
      val table = GramHistory.tableFor(dir)
      val loc = Bucketing.guardBase(spark, table)
      val fs = new org.apache.hadoop.fs.Path(loc)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val parts = fs.listStatus(new org.apache.hadoop.fs.Path(loc))
        .filter(_.isFile).map(_.getPath.toString)
        .filterNot(p => p.substring(p.lastIndexOf('/') + 1).startsWith("_"))
      assert(parts.nonEmpty)
      val withBid = parts.flatMap(p =>
        Bucketing.bucketIdOfFile(p).map(b => (p, b)))
      assert(withBid.length == parts.length,
        s"unparseable bucket ids among: ${parts.mkString(", ")}")
      withBid.foreach { case (p, fileBid) =>
        val bad = spark.read.parquet(p)
          .select(KeyBloom.bucketIdCol(GramHistory.GramCol, 8).as("_b"))
          .filter(org.apache.spark.sql.functions.col("_b") =!= fileBid)
          .count()
        assert(bad == 0L,
          s"$bad keys in bucket-$fileBid file route elsewhere — the " +
            "pruned probe scan would LOSE them ($p)")
      }
    } finally GramHistory.invalidate(spark, dir)
  }

  test("per-bucket pruning: a small candidate batch reads ONLY its " +
      "candidate buckets' files, and answers stay exact") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gh-prune").toString
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      GramHistory.create(spark, dir, corpusDocs, K)
      val table = GramHistory.tableFor(dir)
      val corpusTexts = corpusDocs.select("text").as[String].collect().toSeq
      // a K+2-char slice of a corpus doc: 3 grams — at most 3 of the 8
      // buckets are candidates, so ≥5 bucket files must be pruned
      val slice = corpusTexts.head.substring(0, K + 2)
      val batch = Seq((70L, slice)).toDF("doc_id", "text")
      val probe = graft.operators.Dedup.incrementalDupGrams(batch,
        GramHistory.probeHistory(spark, dir,
          GramHistory.gramHashes(batch, K))(sys.error("unreachable")),
        K, broadcastProbe = false)
      val row = probe.collect().head
      assert(row.getDouble(3) == 1.0,
        s"recrawled slice must saturate: $row")
      val scannedFiles = probe.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(
            _.toString.contains("graft_gram_history")) =>
          s.relation.location.inputFiles.length
      }.sum
      val allFiles = Bucketing.probeScan(spark, table)
        .inputFiles.length
      assert(scannedFiles > 0, "probe read no store files at all")
      assert(scannedFiles <= 3 && scannedFiles < allFiles,
        s"pruning read $scannedFiles of $allFiles store files for a " +
          "3-gram batch (expected <= 3)")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      GramHistory.invalidate(spark, dir)
    }
  }

  test("broadcast budget guard: an over-budget candidate keyset degrades " +
      "to the co-located join — no broadcast anywhere, answers exact") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gh-budget").toString
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(GramHistory.ProbeBudgetConf, "1")
    try {
      GramHistory.create(spark, dir, corpusDocs, K)
      val batch = Seq(
        (80L, corpusDocs.select("text").as[String].collect().head),
        (81L, "completely novel material sharing nothing whatsoever with history"))
        .toDF("doc_id", "text")
      val probe = graft.operators.Dedup.incrementalDupGrams(batch,
        GramHistory.probeHistory(spark, dir,
          GramHistory.gramHashes(batch, K))(sys.error("unreachable")),
        K, broadcastProbe = false)
      val got = probe.collect()
        .map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(got(80L) == 1.0 && got(81L) == 0.0,
        s"over-budget fallback changed answers: $got")
      val bcasts = probe.queryExecution.executedPlan.collect {
        case b: BroadcastExchangeExec => b
      }
      assert(bcasts.isEmpty,
        s"over-budget probe still broadcasts:\n" +
          probe.queryExecution.executedPlan)
    } finally {
      spark.conf.unset(GramHistory.ProbeBudgetConf)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      GramHistory.invalidate(spark, dir)
    }
  }

  test("sidecar generation: appends bump it (memo can never serve a " +
      "stale bloom), an EMPTY increment leaves the sidecar intact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gh-gen").toString
    try {
      GramHistory.create(spark, dir, corpusDocs, K)
      val base = Bucketing.guardBase(spark, GramHistory.tableFor(dir))
      val g0 = KeyBloom.readMeta(spark, base).get.gen
      GramHistory.append(spark, dir, GramHistory.gramHashes(
        Seq((99L, "completely novel material sharing nothing whatsoever"))
          .toDF("doc_id", "text"), K))
      val m1 = KeyBloom.readMeta(spark, base).get
      assert(m1.gen > g0, "append did not bump the sidecar generation")
      // an empty increment (e.g. a micro-batch of sub-K texts) must not
      // drop or churn the sidecar (the round-17 fold NPE'd here and the
      // failure path deleted the whole accelerator)
      GramHistory.append(spark, dir, GramHistory.gramHashes(
        Seq((100L, "tiny")).toDF("doc_id", "text"), K))
      val m2 = KeyBloom.readMeta(spark, base)
      assert(m2.isDefined, "empty increment dropped the sidecar")
      assert(m2.get.gen == m1.gen && m2.get.inserted == m1.inserted,
        s"empty increment churned the sidecar: ${m2.get} vs $m1")
      // compact rebuilds with a CONTINUED generation — a memoized
      // broadcast from before can never validate against the rebuild
      GramHistory.compact(spark, dir)
      val m3 = KeyBloom.readMeta(spark, base).get
      assert(m3.gen > m2.get.gen,
        s"compact rebuilt the sidecar without advancing gen: $m3 vs ${m2.get}")
    } finally GramHistory.invalidate(spark, dir)
  }

  test("task-local bloom tier (sidecar over the broadcast budget): " +
      "answers exact, zero files for a disjoint batch, pruning intact") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gh-tier").toString
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // force the >10^9-key tier: every sidecar is now "too big to
    // broadcast" and the cut must flip to task-local per-bucket loads
    spark.conf.set(graft.util.ProbeBudget.BloomConf, "1")
    try {
      GramHistory.create(spark, dir, corpusDocs, K)
      val corpusTexts = corpusDocs.select("text").as[String].collect().toSeq
      def probe(batch: org.apache.spark.sql.DataFrame) =
        graft.operators.Dedup.incrementalDupGrams(batch,
          GramHistory.probeHistory(spark, dir,
            GramHistory.gramHashes(batch, K))(sys.error("unreachable")),
          K, broadcastProbe = false)
      // exactness: identical to the naive computation through this tier
      val batch = Seq(
        (210L, corpusTexts.head),
        (211L, "completely novel material sharing nothing whatsoever"),
        (212L, corpusTexts.head.substring(0, K + 2)))
        .toDF("doc_id", "text")
      val got = probe(batch).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      batch.as[(Long, String)].collect().foreach { case (id, t) =>
        val hist = corpusTexts
          .flatMap(x => graft.operators.Kernels.charGramHashCounts(x, K).keys)
          .toSet
        val grams = graft.operators.Kernels.charGramHashCounts(t, K)
        val want = (t.length.toLong - K + 1,
          grams.collect { case (g, pc) if hist(g) => pc }.sum.toLong)
        assert(got(id) == want, s"doc $id through the task-local tier: " +
          s"${got(id)} != $want")
      }
      // zero-read short-circuit survives the tier: a disjoint batch
      // still touches no store file
      val novel = Seq(
        (220L, "zq xv jw kf yb zq xv jw kf yb zq xv jw kf yb zq xv jw kf yb"))
        .toDF("doc_id", "text")
      val p = probe(novel)
      assert(p.collect().head.getDouble(3) == 0.0)
      val scans = p.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(
            _.toString.contains("graft_gram_history")) => s
      }
      assert(scans.isEmpty,
        s"disjoint probe scans the store on the task-local tier:\n" +
          p.queryExecution.executedPlan)
    } finally {
      spark.conf.unset(graft.util.ProbeBudget.BloomConf)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      GramHistory.invalidate(spark, dir)
    }
  }

  test("a sidecar rewritten OUT-OF-PROCESS (same mtime tick) is " +
      "revalidated by generation: new keys become visible immediately") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gh-xapp").toString
    try {
      GramHistory.create(spark, dir, corpusDocs, K)
      val table = GramHistory.tableFor(dir)
      val base = Bucketing.guardBase(spark, table)
      val novel = "completely novel material sharing nothing whatsoever with history"
      val batch = Seq((90L, novel)).toDF("doc_id", "text")
      def frac(): Double = graft.operators.Dedup.incrementalDupGrams(batch,
        GramHistory.probeHistory(spark, dir,
          GramHistory.gramHashes(batch, K))(sys.error("unreachable")),
        K, broadcastProbe = false).collect().head.getDouble(3)
      // memoize the current bloom broadcast: novel batch reads 0
      assert(frac() == 0.0)
      // simulate ANOTHER APPLICATION appending to the shared store:
      // table rows + sidecar fold through KeyBloom directly (bypassing
      // this process's memo invalidation)
      val inc = GramHistory.gramHashes(batch, K)
      KeyBloom.fold(spark, base, inc, GramHistory.GramCol)
      inc.write.mode(org.apache.spark.sql.SaveMode.Append)
        .bucketBy(8, GramHistory.GramCol).sortBy(GramHistory.GramCol)
        .format("parquet").saveAsTable(table)
      // the mtime-validated memo could alias this rewrite within one
      // timestamp tick and serve the stale bloom → frac 0.0 (FALSE
      // NEGATIVES); the generation token cannot
      assert(frac() == 1.0,
        "stale memoized bloom served after an out-of-process rewrite")
    } finally GramHistory.invalidate(spark, dir)
  }
}
