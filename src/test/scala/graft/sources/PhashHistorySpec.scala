package graft.sources

import graft.SparkSpec
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class PhashHistorySpec extends SparkSpec {

  import spark.implicits._

  private def payload(seed: Int): Array[Byte] =
    Array.tabulate(600)(i => ((i * 37 + seed) % 251).toByte)

  // monotone ramp: strictly rising cell averages, so the re-encode's
  // one-cell dropout flips exactly one gradient bit (d = 1 — a NEAR-dup,
  // not an exact one; the oscillating payloads above land at d = 0)
  private def rampPayload: Array[Byte] =
    Array.tabulate(600)(i => ((i / 3) % 200).toByte)

  // history: three distinct payloads; batch: a re-encode of #1 (near-dup),
  // an exact copy of #2 (dup), and a novel payload
  private def histMedia = Seq(
    (1L, rampPayload), (2L, payload(97)), (3L, payload(181)))
    .toDF("media_id", "content")
  private def batchMedia = Seq(
    (10L, Multimodal.Kernels.stubReencode(rampPayload)),
    (11L, payload(97)),
    (12L, Array.tabulate(600)(i => ((i * i * 13 + 5) % 241).toByte)))
    .toDF("media_id", "content")

  private def naivePairs(maxDist: Int = 3): Set[(Long, Long, Int)] = {
    val h = Seq(1L -> rampPayload, 2L -> payload(97), 3L -> payload(181))
    val b = Seq(10L -> Multimodal.Kernels.stubReencode(rampPayload),
      11L -> payload(97),
      12L -> Array.tabulate(600)(i => ((i * i * 13 + 5) % 241).toByte))
    (for {
      (hi, hc) <- h; (bi, bc) <- b
      d = java.lang.Long.bitCount(
        Multimodal.Kernels.dHash64(hc) ^ Multimodal.Kernels.dHash64(bc))
      if d <= maxDist
    } yield (hi, bi, d)).toSet
  }

  private def got(store: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    Multimodal.incrementalPayloadNearDups(batchMedia, store)
      .as[(Long, Long, Int)].collect().toSet

  test("batch probe equals the naive all-pairs computation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ph").toString
    try {
      PhashHistory.create(spark, dir,
        Multimodal.payloadFingerprints(histMedia))
      val store = PhashHistory.scanOrCompute(spark, dir)(sys.error("unreachable"))
      val want = naivePairs()
      assert(got(store) == want, s"got ${got(store)}, want $want")
      // the fixture must exercise both a dup (d=0) and a near-dup (0<d<=3)
      assert(want.exists(_._3 == 0) && want.exists(p => p._3 > 0))
      assert(!want.exists(p => p._2 == 12L), "novel payload matched history")
    } finally PhashHistory.invalidate(spark, dir)
  }

  test("standalone fallback (no producer) answers identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ph-fb").toString
    try {
      val derived = PhashHistory.scanOrCompute(spark, dir)(
        PhashHistory.chunkKeys(Multimodal.payloadFingerprints(histMedia)))
      assert(got(derived) == naivePairs())
    } finally PhashHistory.invalidate(spark, dir)
  }

  test("append extends the history; compact preserves answers and layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ph-app").toString
    try {
      PhashHistory.create(spark, dir,
        Multimodal.payloadFingerprints(histMedia))
      def store = PhashHistory.scanOrCompute(spark, dir)(sys.error("unreachable"))
      // the novel batch payload is not yet in history
      assert(!got(store).exists(_._2 == 12L))
      // ingest it (as history id 4), then the batch probe must flag it
      PhashHistory.append(spark, dir, Multimodal.payloadFingerprints(
        Seq((4L, Array.tabulate(600)(i => ((i * i * 13 + 5) % 241).toByte)))
          .toDF("media_id", "content")))
      val after = got(store)
      assert(after.contains((4L, 12L, 0)), s"appended payload not visible: $after")
      // two redundant appends bloat the store; compaction restores distinct
      // rows without changing any answer
      (1 to 2).foreach { _ =>
        PhashHistory.append(spark, dir,
          Multimodal.payloadFingerprints(histMedia))
      }
      val table = PhashHistory.tableFor(dir)
      val bloated = spark.table(table).count()
      PhashHistory.compact(spark, dir)
      assert(spark.table(table).count() < bloated,
        "compact did not shrink the bloated store")
      assert(got(store) == after, "compaction changed probe answers")
      val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $table")
        .collect().map(_.mkString(" ")).mkString("\n")
      assert(desc.contains("Num Buckets") || desc.contains("bucket"),
        s"bucket spec lost in compaction rename:\n$desc")
    } finally PhashHistory.invalidate(spark, dir)
  }

  test("probe plan: history side rides the bucket layout with NO Exchange") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val dir = java.nio.file.Files.createTempDirectory("graft-ph-plan").toString
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // the fixture store is broadcast-tiny; a 100 TB store is not — force
    // the co-located join path the gate exists to protect
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      PhashHistory.create(spark, dir,
        Multimodal.payloadFingerprints(histMedia))
      val store = PhashHistory.scanOrCompute(spark, dir)(sys.error("unreachable"))
      val probe = Multimodal.incrementalPayloadNearDups(batchMedia, store)
      val exec = probe.queryExecution.executedPlan
      val sides = exec.collect {
        case j: SortMergeJoinExec => Seq(j.left, j.right)
        case j: ShuffledHashJoinExec => Seq(j.left, j.right)
      }.flatten
      val histSides = sides.filter { side =>
        val hasHist = side.collectFirst {
          case s: FileSourceScanExec
            if s.tableIdentifier.exists(_.table.startsWith("graft_phash_history")) => s
        }.isDefined
        val crossesJoin = side.collect {
          case j: SortMergeJoinExec => j
          case j: ShuffledHashJoinExec => j
        }.nonEmpty
        hasHist && !crossesJoin
      }
      assert(histSides.nonEmpty,
        s"probe join does not scan the phash-history table:\n$exec")
      histSides.foreach { side =>
        val shuffles = side.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.isEmpty,
          s"history side of the probe join shuffles:\n$side")
      }
      assert(exec.collect { case e: ShuffleExchangeExec => e }.nonEmpty,
        s"expected a batch-side exchange:\n$exec")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      PhashHistory.invalidate(spark, dir)
    }
  }
}
