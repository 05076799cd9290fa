package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class CleanedCorpusSpec extends SparkSpec {

  import spark.implicits._

  private val Boiler =
    "this exact boilerplate sentence repeats across documents verbatim"

  private def corpus(extra: (Long, String, String)*): DataFrame =
    (Seq(
      (1L, s"unique alpha prose one $Boiler tail one", "en"),
      (2L, s"unique beta prose two $Boiler tail two", "en"),
      (3L, "wholly original text with no duplicated span at all", "fr")) ++
      extra).toDF("doc_id", "text", "lang")

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ccspec-").toString

  test("memo hit is bit-identical to the fresh removal and skips recompute") {
    val dir = freshDir()
    val evals = new AtomicInteger(0)
    def docs: DataFrame = { evals.incrementAndGet(); corpus() }

    val fresh = Dedup.removeDupSpans(corpus(), 40)
      .select($"doc_id", $"text_clean".as("text"))
      .join(corpus().select($"doc_id", $"lang"), Seq("doc_id"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])

    val first = CleanedCorpus.cleanedCached(spark, dir, 40, docs)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val second = CleanedCorpus.cleanedCached(spark, dir, 40, docs)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])

    assert(evals.get() == 1, "memo hit must not re-evaluate the docs thunk")
    assert(first.toSeq == fresh.toSeq)
    assert(second.toSeq == fresh.toSeq)
    // the shared boilerplate span was actually removed
    val t1 = first.find(_.head == 1L).get(1).asInstanceOf[String]
    assert(!t1.contains(Boiler), s"span not removed: $t1")
    CleanedCorpus.invalidate(dir)
  }

  test("invalidate(dir) re-materializes: a post-append build sees new content") {
    val dir = freshDir()
    val before = CleanedCorpus.cleanedCached(spark, dir, 40, corpus()).count()
    // a stale hit ignores the appended doc (the documented staleness window)
    val stale = CleanedCorpus.cleanedCached(spark, dir, 40,
      corpus((4L, "a brand new appended document", "de"))).count()
    assert(stale == before)
    CleanedCorpus.invalidate(dir)
    val after = CleanedCorpus.cleanedCached(spark, dir, 40,
      corpus((4L, "a brand new appended document", "de"))).count()
    assert(after == before + 1)
    CleanedCorpus.invalidate(dir)
  }

  test("the registry is a bounded LRU and eviction deletes the temp dir") {
    CleanedCorpus.invalidate()
    val dir = freshDir()
    val tiny = Seq((1L, "one short doc", "en")).toDF("doc_id", "text", "lang")
    // k varies the memo key, so one dir fills the whole registry
    val firstPath = java.nio.file.Paths.get(java.net.URI.create(
      CleanedCorpus.cleanedCached(spark, dir, 1000, tiny).inputFiles.head))
      .getParent.toFile
    assert(firstPath.exists())
    (1001 to 1032).foreach { k =>
      CleanedCorpus.cleanedCached(spark, dir, k, tiny): Unit
    }
    assert(CleanedCorpus.memoSize <= 32,
      s"registry grew past its bound: ${CleanedCorpus.memoSize}")
    assert(!firstPath.exists(),
      s"evicted entry's temp dir not deleted: $firstPath")
    // the most-recent entry still serves (access-ordered eviction)
    assert(CleanedCorpus.cleanedCached(spark, dir, 1032,
      sys.error("recent entry evicted")).count() == 1L)
    CleanedCorpus.invalidate()
  }

  test("x117 memo-warm invocation returns the fresh invocation's rows") {
    // first build materializes the cleaned store; second is memo-warm —
    // same rows bit-for-bit (the steady-state Bench path)
    val a = graft.queries.CurationOps.x117_curation_v3.build(spark, Sf)
      .collect().map(_.toSeq)
    val b = graft.queries.CurationOps.x117_curation_v3.build(spark, Sf)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
  }
}
