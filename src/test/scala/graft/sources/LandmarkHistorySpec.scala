package graft.sources

import graft.SparkSpec
import graft.operators.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LandmarkHistorySpec extends SparkSpec {

  import spark.implicits._

  // track payloads long enough to clear the triplet material floor
  private def track(sentence: String): Array[Byte] =
    (sentence + " ").*(12).getBytes("UTF-8")

  private val t1 = track("the quick brown fox jumps over the lazy dog")
  private val t2 = track("pack my box with five dozen liquor jugs")
  private val t3 = track("how vexingly quick daft zebras jump today")
  private val novel = track("0123456789 9876543210 13579 24680 1122334455")

  // history: three tracks; batch: a re-encode of #1 (near-dup at offset
  // 0), an exact copy of #2, and a novel track
  private val hist = Seq(1L -> t1, 2L -> t2, 3L -> t3)
  private val batch = Seq(
    10L -> Multimodal.Kernels.stubReencode(t1), 11L -> t2, 12L -> novel)

  private def lmDf(rows: Seq[(Long, Array[Byte])]): DataFrame =
    rows.flatMap { case (id, c) =>
      Multimodal.Kernels.audioLandmarks3(c).map { case (h, t) => (id, h, t) }
    }.toDF("media_id", "lhash", "t")

  /** Local reference: per (hist, batch) pair, votes per offset over
    * hash-equal landmarks, max-votes/min-offset election, both cuts.
    */
  private def naive: Set[(Long, Long, Int, Int)] =
    (for {
      (hi, hc) <- hist
      (bi, bc) <- batch
      hlm = Multimodal.Kernels.audioLandmarks3(hc)
      blm = Multimodal.Kernels.audioLandmarks3(bc)
      votesByOff = (for ((hh, ht) <- hlm; (bh, bt) <- blm if hh == bh)
        yield bt - ht).groupBy(identity).map { case (o, xs) => o -> xs.size }
      if votesByOff.nonEmpty
      bestV = votesByOff.values.max
      bestOff = votesByOff.collect { case (o, v) if v == bestV => o }.min
      if bestV >= 5 && bestV.toDouble / blm.size >= 0.25
    } yield (hi, bi, bestV, bestOff)).toSet

  private def got(store: DataFrame): Set[(Long, Long, Int, Int)] =
    Multimodal.incrementalAudioNearDups(lmDf(batch), store)
      .select("hist_id", "batch_id", "n_votes", "best_off")
      .as[(Long, Long, Int, Int)].collect().toSet

  test("batch probe equals the local reference computation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    try {
      LandmarkHistory.create(spark, dir, lmDf(hist))
      val store = LandmarkHistory.scanOrCompute(spark, dir)(sys.error("unreachable"))
      val want = naive
      assert(got(store) == want, s"got ${got(store)}, want $want")
      // the fixture exercises an exact copy AND a re-encoded near-dup,
      // both aligned at offset 0, and the novel track matches nothing
      assert(want.contains((2L, 11L, Multimodal.Kernels.audioLandmarks3(t2).size, 0)))
      assert(want.exists(p => p._1 == 1L && p._2 == 10L && p._4 == 0),
        s"re-encoded variant did not align with its original: $want")
      assert(!want.exists(_._2 == 12L), s"novel track matched history: $want")
    } finally LandmarkHistory.invalidate(spark, dir)
  }

  test("standalone fallback (no producer) answers identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-fb").toString
    try {
      val derived = LandmarkHistory.scanOrCompute(spark, dir)(
        LandmarkHistory.storeShape(lmDf(hist)))
      assert(got(derived) == naive)
    } finally LandmarkHistory.invalidate(spark, dir)
  }

  test("append extends the history; compact preserves answers and layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-app").toString
    try {
      LandmarkHistory.create(spark, dir, lmDf(hist))
      def store = LandmarkHistory.scanOrCompute(spark, dir)(sys.error("unreachable"))
      assert(!got(store).exists(_._2 == 12L))
      // ingest the novel track (as history id 4): the probe must flag it
      LandmarkHistory.append(spark, dir, lmDf(Seq(4L -> novel)))
      val after = got(store)
      assert(after.exists(p => p._1 == 4L && p._2 == 12L && p._4 == 0),
        s"appended track not visible: $after")
      // redundant appends bloat the store AND double votes (landmark rows
      // are multiset evidence, not membership) — compaction restores
      // distinct rows and with them the original answers
      LandmarkHistory.append(spark, dir, lmDf(hist))
      assert(got(store) != after,
        "duplicate landmark rows should inflate votes (multiset semantics)")
      val table = LandmarkHistory.tableFor(dir)
      val bloated = spark.table(table).count()
      LandmarkHistory.compact(spark, dir)
      assert(spark.table(table).count() < bloated,
        "compact did not shrink the bloated store")
      assert(got(store) == after, "compaction did not restore probe answers")
      val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $table")
        .collect().map(_.mkString(" ")).mkString("\n")
      assert(desc.contains("Num Buckets") || desc.contains("bucket"),
        s"bucket spec lost in compaction rename:\n$desc")
    } finally LandmarkHistory.invalidate(spark, dir)
  }

  test("index-side hot-bucket cap bounds buckets and only shrinks answers") {
    val dirE = java.nio.file.Files.createTempDirectory("graft-lm-capE").toString
    val dirC = java.nio.file.Files.createTempDirectory("graft-lm-capC").toString
    try {
      LandmarkHistory.create(spark, dirE, lmDf(hist))
      LandmarkHistory.create(spark, dirC, lmDf(hist), capPerHash = 2)
      val capped = spark.table(LandmarkHistory.tableFor(dirC))
      val maxBucket = capped.groupBy("lhash").count()
        .agg(max("count")).collect()(0).getLong(0)
      assert(maxBucket <= 2, s"cap leaked: max bucket $maxBucket")
      // votes through a capped index can only SHRINK: no invented pairs,
      // no inflated scores vs the exact store
      val exact = got(LandmarkHistory.scanOrCompute(spark, dirE)(fail("e")))
        .map(p => (p._1, p._2) -> p._3).toMap
      val viaCap = Multimodal.incrementalAudioNearDups(lmDf(batch),
          LandmarkHistory.scanOrCompute(spark, dirC)(fail("c")),
          minVotes = 1, minQCoverage = 0.0)
        .select("hist_id", "batch_id", "n_votes")
        .as[(Long, Long, Int)].collect()
      viaCap.foreach { case (h, b, v) =>
        // every capped match exists in the exact answer at >= votes
        // (exact ran with the default cuts, so only compare where present)
        exact.get((h, b)).foreach(ev =>
          assert(v <= ev, s"capped index inflated votes for ($h,$b): $v > $ev"))
      }
    } finally {
      LandmarkHistory.invalidate(spark, dirE)
      LandmarkHistory.invalidate(spark, dirC)
    }
  }

  test("probe plan: history side rides the bucket layout with NO Exchange") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-plan").toString
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // the fixture store is broadcast-tiny; a 100 TB landmark index is not
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      LandmarkHistory.create(spark, dir, lmDf(hist))
      val store = LandmarkHistory.scanOrCompute(spark, dir)(sys.error("unreachable"))
      val probe = Multimodal.incrementalAudioNearDups(lmDf(batch), store)
      val exec = probe.queryExecution.executedPlan
      val sides = exec.collect {
        case j: SortMergeJoinExec => Seq(j.left, j.right)
        case j: ShuffledHashJoinExec => Seq(j.left, j.right)
      }.flatten
      val histSides = sides.filter { side =>
        val hasHist = side.collectFirst {
          case s: FileSourceScanExec
            if s.tableIdentifier.exists(_.table.startsWith("graft_landmark_history")) => s
        }.isDefined
        val crossesJoin = side.collect {
          case j: SortMergeJoinExec => j
          case j: ShuffledHashJoinExec => j
        }.nonEmpty
        hasHist && !crossesJoin
      }
      assert(histSides.nonEmpty,
        s"probe join does not scan the landmark-history table:\n$exec")
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
      LandmarkHistory.invalidate(spark, dir)
    }
  }
}
