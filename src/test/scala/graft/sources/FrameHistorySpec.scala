package graft.sources

import graft.SparkSpec
import graft.operators.Multimodal
import graft.queries.Tables
import org.apache.spark.sql.functions._

class FrameHistorySpec extends SparkSpec {

  import spark.implicits._

  // corpus with re-encoded variants, split x116-style: originals < 300
  // are "history", the rest (originals >= 300 + every variant) probe it
  private lazy val corpus = Multimodal.withReencodedVariants(
    Multimodal.syntheticMedia(Tables.documents(spark, Sf))
      .filter(col("media_id") < 600), everyNth = 5)
  private lazy val frames =
    Multimodal.frameFingerprints(corpus).cache()
  private def histFrames = frames.filter(col("media_id") < 300)
  private def batchFrames =
    frames.filter(col("media_id") >= 300)

  /** Local reference: Jaccard over distinct frame-hash sets, hist × batch. */
  private def refPairs(hist: Map[Long, Set[Long]],
                       batch: Map[Long, Set[Long]]): Set[(Long, Long, Int, Double)] =
    (for {
      (h, ha) <- hist; (b, hb) <- batch
      m = (ha & hb).size if m > 0
      j = m.toDouble / (ha.size + hb.size - m) if j >= 0.5
    } yield (h, b, m, math.rint(j * 10000) / 10000)).toSet

  private def setsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("media_id", "phash").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (id, hs) => id -> hs.map(_._2).toSet }

  private def got(hf: org.apache.spark.sql.DataFrame,
                  hs: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Double)] =
    Multimodal.incrementalVideoNearDups(batchFrames, hf, hs)
      .as[(Long, Long, Int, Double)].collect().toSet

  test("store-served probe equals the local reference (and finds variant pairs)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fh").toString
    try {
      FrameHistory.create(spark, dir, histFrames)
      val (hf, hs) = FrameHistory.scanOrCompute(spark, dir)(sys.error("unreachable"))
      val want = refPairs(setsOf(histFrames), setsOf(batchFrames))
      assert(want.nonEmpty, "fixture produced no cross-split video pairs")
      assert(got(hf, hs) == want)
    } finally FrameHistory.invalidate(spark, dir)
  }

  test("standalone fallback (no producer) answers identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fh-fb").toString
    try {
      val (hf, hs) = FrameHistory.scanOrCompute(spark, dir)(
        (FrameHistory.storeRows(histFrames), FrameHistory.sizeRows(histFrames)))
      assert(got(hf, hs) == refPairs(setsOf(histFrames), setsOf(batchFrames)))
    } finally FrameHistory.invalidate(spark, dir)
  }

  test("append extends the history; compact restores distinct rows, sizes, layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fh-app").toString
    try {
      // history starts WITHOUT videos in [200, 300)
      val h0 = histFrames.filter(col("media_id") < 200)
      val inc = histFrames.filter(col("media_id") >= 200)
      assert(inc.count() > 0, "fixture has no increment videos")
      FrameHistory.create(spark, dir, h0)
      def store = FrameHistory.scanOrCompute(spark, dir)(sys.error("unreachable"))
      val partial = { val (hf, hs) = store; got(hf, hs) }
      FrameHistory.append(spark, dir, inc)
      val full = { val (hf, hs) = store; got(hf, hs) }
      val want = refPairs(setsOf(histFrames), setsOf(batchFrames))
      assert(full == want, "appended videos not visible to the probe")
      assert(partial.subsetOf(full) && partial != full)
      // a replay double-append INFLATES matches and duplicates sizes rows
      // (the documented multiset caveat); compact restores exact answers
      FrameHistory.append(spark, dir, inc)
      val table = FrameHistory.tableFor(dir)
      val bloated = spark.table(table).count()
      FrameHistory.compact(spark, dir)
      assert(spark.table(table).count() < bloated,
        "compact did not shrink the bloated store")
      assert({ val (hf, hs) = store; got(hf, hs) } == want,
        "compaction did not restore exact probe answers")
      val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $table")
        .collect().map(_.mkString(" ")).mkString("\n")
      assert(desc.contains("Num Buckets") || desc.contains("bucket"),
        s"bucket spec lost in compaction rename:\n$desc")
      // sizes rebuilt to one exact row per video
      val sizes = spark.table(FrameHistory.sizesTableFor(dir))
        .as[(Long, Long)].collect().toMap
      val wantSizes = setsOf(histFrames).map { case (id, s) => id -> s.size.toLong }
      assert(sizes == wantSizes)
    } finally FrameHistory.invalidate(spark, dir)
  }

  test("probe plan: NEITHER history scan (frames, sizes) has an Exchange above it") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val dir = java.nio.file.Files.createTempDirectory("graft-fh-plan").toString
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // the fixture store is broadcast-tiny; a 100 TB store is not — force
    // the co-located join path the gate exists to protect
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      FrameHistory.create(spark, dir, histFrames)
      val (hf, hs) = FrameHistory.scanOrCompute(spark, dir)(sys.error("unreachable"))
      val probe = Multimodal.incrementalVideoNearDups(batchFrames, hf, hs)
      val exec = probe.queryExecution.executedPlan
      val sides = exec.collect {
        case j: SortMergeJoinExec => Seq(j.left, j.right)
        case j: ShuffledHashJoinExec => Seq(j.left, j.right)
      }.flatten
      // a history-table scan side that contains no NESTED join is a pure
      // store-scan side — gate it exchange-free (both tables)
      val histSides = sides.filter { side =>
        val hasHist = side.collectFirst {
          case s: FileSourceScanExec
            if s.tableIdentifier.exists(_.table.startsWith("graft_frame_history")) => s
        }.isDefined
        val crossesJoin = side.collect {
          case j: SortMergeJoinExec => j
          case j: ShuffledHashJoinExec => j
        }.nonEmpty
        hasHist && !crossesJoin
      }
      // both the phash-keyed frames scan and the id-keyed sizes scan must
      // appear as pure sides
      assert(histSides.size >= 2,
        s"expected pure scan sides for frames AND sizes tables:\n$exec")
      histSides.foreach { side =>
        val shuffles = side.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.isEmpty,
          s"history side of a probe join shuffles:\n$side")
      }
      assert(exec.collect { case e: ShuffleExchangeExec => e }.nonEmpty,
        s"expected batch-side exchanges:\n$exec")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      FrameHistory.invalidate(spark, dir)
    }
  }
}
