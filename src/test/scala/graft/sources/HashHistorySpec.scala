package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Dedup

/** The persisted incremental-dedup history store (DEDUP_TUNING.md §4):
  * round-trip (create → append → probe), probe-equality against the
  * in-query derivation, the co-location plan gate (no Exchange on the
  * history side of the probe join), and the x86 registry wiring.
  */
class HashHistorySpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    // tiny testdata: auto-broadcast would replace the bucket-aligned SMJ
    // the plan gate inspects; filter-only bucketed scans get auto-disabled
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
  }

  override def afterAll(): Unit = {
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    HashHistory.invalidate(spark, Sf)
    super.afterAll()
  }

  private def docs = graft.queries.Tables.documents(spark, Sf)
    .select(col("doc_id"), col("text"))

  private def hashesOf(df: org.apache.spark.sql.DataFrame) =
    df.select(unhex(md5(col("text"))).as("th"))

  test("create → append → probe round-trip equals the derived-history answer") {
    // two "crawl increments" of history, one probe batch
    val h1 = docs.filter(col("doc_id") % 3 === 0)
    val h2 = docs.filter(col("doc_id") % 3 === 1)
    val batch = docs.filter(col("doc_id") % 3 === 2)
      // plus a recrawl of a history doc (must classify dup_of_history)
      .unionAll(h1.limit(5).select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
    val dir = java.nio.file.Files.createTempDirectory("graft-hh").toString
    try {
      HashHistory.create(spark, dir, hashesOf(h1), buckets = 4)
      HashHistory.append(spark, dir, hashesOf(h2))
      // appends may repeat hashes — the probe's distinct absorbs it
      HashHistory.append(spark, dir, hashesOf(h2.limit(3)))
      val store = HashHistory.scanOrCompute(spark, dir)(
        sys.error("store registered — compute must not be touched"))
      val got = Dedup.incrementalStatusBinary(batch, store)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
      val want = Dedup.incrementalStatus(batch,
        h1.unionAll(h2).select(md5(col("text")).as("th")))
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.sameElements(want),
        s"store probe diverged from derived history: got ${got.take(5).mkString(",")}")
      assert(got.count(_._2 == "dup_of_history") >= 5,
        "recrawled history docs must classify dup_of_history")
    } finally HashHistory.invalidate(spark, dir)
  }

  test("compact dedupes re-appended hashes; probes answer identically") {
    val h1 = docs.filter(col("doc_id") % 3 === 0)
    val batch = docs.filter(col("doc_id") % 3 === 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-hh-cpt").toString
    try {
      HashHistory.create(spark, dir, hashesOf(h1), buckets = 4)
      // three full recrawl appends: membership unchanged, rows quadrupled
      (1 to 3).foreach(_ => HashHistory.append(spark, dir, hashesOf(h1)))
      val table = HashHistory.tableFor(dir)
      val distinctHashes = hashesOf(h1).distinct().count()
      assert(spark.table(table).count() == 4 * distinctHashes)
      def probe() = Dedup.incrementalStatusBinary(batch,
          HashHistory.scanOrCompute(spark, dir)(sys.error("unreachable")))
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val before = probe()
      HashHistory.compact(spark, dir)
      assert(spark.table(table).count() == distinctHashes,
        "compact must rewrite the store to its distinct hashes")
      assert(probe() == before, "compaction changed probe answers")
    } finally HashHistory.invalidate(spark, dir)
  }

  test("probe plan: history side rides the bucket layout with NO Exchange") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, ShuffledHashJoinExec}
    val dir = java.nio.file.Files.createTempDirectory("graft-hh-plan").toString
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      HashHistory.create(spark, dir, hashesOf(docs.filter(col("doc_id") % 2 === 0)))
      val store = HashHistory.scanOrCompute(spark, dir)(sys.error("unreachable"))
      val probe = Dedup.incrementalStatusBinary(
        docs.filter(col("doc_id") % 2 === 1), store)
      val exec = probe.queryExecution.executedPlan
      val sides = exec.collect {
        case j: SortMergeJoinExec => Seq(j.left, j.right)
        case j: ShuffledHashJoinExec => Seq(j.left, j.right)
      }.flatten
      // the DIRECT history side: holds the store scan without crossing
      // another join (the outer keeper-join's input contains the whole
      // probe join — and legitimately, its batch-side exchange)
      val histSides = sides.filter { side =>
        val hasHist = side.collectFirst {
          case s: FileSourceScanExec
            if s.tableIdentifier.exists(_.table.startsWith("graft_hash_history")) => s
        }.isDefined
        val crossesJoin = side.collect {
          case j: SortMergeJoinExec => j
          case j: ShuffledHashJoinExec => j
        }.nonEmpty
        hasHist && !crossesJoin
      }
      assert(histSides.nonEmpty,
        s"probe join does not scan the history table:\n$exec")
      // the whole history subtree — scan, distinct aggregate, join input —
      // must be exchange-free: this is the property that keeps per-batch
      // probe cost independent of history size at 100 TB
      histSides.foreach { side =>
        val shuffles = side.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.isEmpty,
          s"history side of the probe join shuffles:\n$side")
      }
      // sanity: the batch side DOES shuffle (on th) — co-location is not
      // an artifact of the whole plan degenerating to one partition
      assert(exec.collect { case e: ShuffleExchangeExec => e }.nonEmpty,
        s"expected a batch-side exchange:\n$exec")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      HashHistory.invalidate(spark, dir)
    }
  }

  test("x86 registry entry probes the persisted store when one is registered") {
    import graft.queries.TextOps
    HashHistory.invalidate(spark, Sf)
    try {
      // cold: side-effect-free build, derived in-query history
      val cold = graft.SparkEntry.queries("x86_incremental_dedup")(spark, Sf)
      assert(!cold.queryExecution.executedPlan.toString
        .contains("graft_hash_history"),
        "cold x86 build must not touch (or create) a store")
      val coldRows = cold.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      // producer step: persist the derivation's history hashes, then the
      // SAME registry entry probes the bucketed table — same answer
      HashHistory.create(spark, Sf, TextOps.x86HistoryHashes(spark, Sf))
      val warm = graft.SparkEntry.queries("x86_incremental_dedup")(spark, Sf)
      assert(warm.queryExecution.executedPlan.toString
        .contains("graft_hash_history"),
        "warm x86 build must scan the persisted store")
      val warmRows = warm.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      assert(warmRows.sameElements(coldRows),
        "store-backed x86 diverged from the in-query derivation")
    } finally HashHistory.invalidate(spark, Sf)
  }

  test("EMPTY store: create from no hashes, bloom-gated probe answers " +
      "all-kept without touching a file") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hh-empty").toString
    try {
      HashHistory.create(spark, dir, hashesOf(docs.limit(0)), buckets = 4)
      val batch = Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
        .toDF("doc_id", "text")
      val got = Dedup.incrementalStatusBinary(batch,
          HashHistory.probeHistory(spark, dir, hashesOf(batch))(
            sys.error("unreachable")))
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(got == Map(1L -> "kept", 2L -> "kept", 3L -> "dup_in_batch"),
        s"empty store misclassified: $got")
    } finally HashHistory.invalidate(spark, dir)
  }

  test("bloomStat: healthy on a fresh store, None once unregistered") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hh-stat").toString
    try {
      HashHistory.create(spark, dir, hashesOf(docs.limit(50)), buckets = 4)
      val s = HashHistory.bloomStat(spark, dir).getOrElse(
        fail("no saturation stat for a store created WITH a sidecar"))
      assert(s.fill > 0.0 && s.fill <= 0.51 &&
        s.effFpp < KeyBloom.DefaultFpp,
        s"fresh hash store's saturation stat out of band: $s")
    } finally HashHistory.invalidate(spark, dir)
    assert(HashHistory.bloomStat(spark, dir).isEmpty,
      "stat served for an unregistered store")
  }

  test("bloom sidecar (binary keys): a fully-novel batch probes ZERO " +
      "store files; appends fold in; dropped sidecar degrades exactly") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hh-bloom").toString
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val h1 = docs.filter(col("doc_id") % 3 === 0)
      HashHistory.create(spark, dir, hashesOf(h1), buckets = 4)
      val table = HashHistory.tableFor(dir)
      val base = Bucketing.guardBase(spark, table)
      assert(KeyBloom.readMeta(spark, base).isDefined,
        "create() must write the bloom sidecar")
      // fully-novel batch: every md5 misses the bloom → zero store files
      val novel = Seq((900000001L, "a wholly novel document body one"),
        (900000002L, "a wholly novel document body two"))
        .toDF("doc_id", "text")
      def statusOf(batch: org.apache.spark.sql.DataFrame) =
        Dedup.incrementalStatusBinary(batch,
          HashHistory.probeHistory(spark, dir, hashesOf(batch))(
            sys.error("unreachable")))
      val probe = statusOf(novel)
      val rows = probe.collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(rows == Map(900000001L -> "kept", 900000002L -> "kept"),
        s"novel batch misclassified: $rows")
      val histScans = probe.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec
          if s.tableIdentifier.exists(_.table.startsWith("graft_hash_history")) ||
            s.relation.location.rootPaths.exists(
              _.toString.contains("graft_hash_history")) => s
      }
      assert(histScans.isEmpty,
        s"novel batch still scans the hash store:\n" +
          probe.queryExecution.executedPlan)
      // appended hashes are bloom-visible (no false negatives)
      HashHistory.append(spark, dir, hashesOf(novel))
      val recrawl = statusOf(novel.select(
        (col("doc_id") + 5L).as("doc_id"), col("text")))
      assert(recrawl.collect().forall(_.getString(1) == "dup_of_history"),
        "appended hashes not visible through the bloom path")
      // compact rebuilds; probe answers unchanged; dropped sidecar
      // degrades to the plain scan with identical answers
      HashHistory.compact(spark, dir)
      assert(recrawl.collect().forall(_.getString(1) == "dup_of_history"))
      KeyBloom.delete(spark, base)
      assert(statusOf(novel.select((col("doc_id") + 5L).as("doc_id"),
          col("text")))
        .collect().forall(_.getString(1) == "dup_of_history"),
        "legacy fallback path broke the hash probe")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      HashHistory.invalidate(spark, dir)
    }
  }
}
