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

  test("probe plan: history side rides the bucket layout with NO Exchange") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val dir = java.nio.file.Files.createTempDirectory("graft-gh-plan").toString
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // the fixture store is broadcast-tiny; a 100 TB store is not — force
    // the co-located join path the gate exists to protect
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      GramHistory.create(spark, dir, corpusDocs, K)
      val store = GramHistory.scanOrCompute(spark, dir)(sys.error("unreachable"))
      val probe = Dedup.incrementalDupGrams(
        Seq((30L, "the quick brown fox jumps over the lazy dog every single morning"))
          .toDF("doc_id", "text"), store, K)
      val exec = probe.queryExecution.executedPlan
      val sides = exec.collect {
        case j: SortMergeJoinExec => Seq(j.left, j.right)
        case j: ShuffledHashJoinExec => Seq(j.left, j.right)
      }.flatten
      val histSides = sides.filter { side =>
        val hasHist = side.collectFirst {
          case s: FileSourceScanExec
            if s.tableIdentifier.exists(_.table.startsWith("graft_gram_history")) => s
        }.isDefined
        val crossesJoin = side.collect {
          case j: SortMergeJoinExec => j
          case j: ShuffledHashJoinExec => j
        }.nonEmpty
        hasHist && !crossesJoin
      }
      assert(histSides.nonEmpty,
        s"probe join does not scan the gram-history table:\n$exec")
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
      GramHistory.invalidate(spark, dir)
    }
  }
}
