package graft.operators

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session-scoped materialization of the span-REMOVED corpus — the
  * [[UnigramLm.trainCached]] producer device one level up (round-14
  * verdict #5): x117 re-derives `cleaned` (removal → text_clean → lang
  * join) on every invocation, and Verify/Bench invoke it repeatedly over
  * the same corpus, so the removal bill (x114's gram exchange + rewrite,
  * the pipeline's single most expensive step) re-runs per call even
  * though its output is deterministic.
  *
  * Unlike the LM memo, the cleaned relation is CORPUS-sized — it cannot
  * collect to the driver. The memo is therefore a DISK materialization
  * (the published production posture: ExactSubstr pipelines write the
  * deduplicated corpus once and every downstream stage reads the
  * artifact — Lee et al. 2022 §4): first call per (application, dir, k)
  * computes the removal and writes (doc_id, text, lang) parquet to a
  * session temp dir; every call (including the first) returns a READ of
  * that parquet, so all consumers in every invocation see one stable
  * schema and bit-identical values (removal is deterministic). No Spark
  * cache is pinned — CompositionSpec's zero-net-cached-RDDs gate holds
  * by construction, and the 5-consumer fan-out inside x117 becomes five
  * scans of a small columnar file instead of five evaluations of the
  * removal DAG.
  *
  * STALENESS WINDOW — same contract as [[UnigramLm.trainCached]] /
  * [[Bpe.trainCached]], deliberate: the key does not fingerprint corpus
  * content; within one application a hit ignores later appends to `dir`
  * (the cleaned corpus is a versioned pipeline artifact). The window
  * ends only at an EXPLICIT [[invalidate]] (per-dir or global) or
  * [[graft.server.TankServer.stop]], which clears the lot and deletes
  * the temp dirs — no production verb invalidates automatically today;
  * a caller that mutates `dir` and wants a fresh materialization must
  * call [[invalidate(dir:String)*]] itself.
  *
  * The registry is a 32-entry access-ordered LRU (the
  * [[UnigramLm.trainCached]] bound, round-14's hygiene device): a
  * long-lived server session curating many corpora evicts the
  * least-recently-served materialization AND deletes its temp dir, so
  * temp space is bounded at 32 cleaned corpora.
  */
object CleanedCorpus {

  private final case class Entry(path: Path)

  private val MaxStores = 32

  private val stores = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Entry](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Entry]): Boolean =
        if (size() > MaxStores) { deleteRecursively(e.getValue.path); true }
        else false
    })

  /** The x117 `cleaned` relation — (doc_id, text, lang) with `text` the
    * span-removed residual — materialized once per (application, dir, k)
    * and served from parquet thereafter. `docs` must carry (doc_id, text,
    * lang); it is only evaluated on a miss.
    *
    * LIFETIME: the returned frame reads the entry's temp files LAZILY and
    * is only valid while the entry is RESIDENT — eviction (32 newer
    * materializations) or [[invalidate]] deletes the files, and a held
    * frame then fails its next action with FileNotFoundException (loud,
    * never silently wrong). A caller that defers the action re-calls this
    * (a hit is a map lookup) instead of caching the frame. Deferring
    * deletion to invalidate()/stop was considered and rejected: unbounded
    * temp space for long-lived curation servers is the failure mode this
    * LRU exists to prevent.
    */
  def cleanedCached(spark: SparkSession, dir: String, k: Int,
                    docs: => DataFrame): DataFrame = {
    val key = spark.sparkContext.applicationId + "|" +
      new java.io.File(dir).getAbsolutePath + "|" + k
    val e = stores.computeIfAbsent(key, _ => {
      val frame = docs
      val cleaned = Dedup.removeDupSpans(frame, k)
        .select(col("doc_id"), col("text_clean").as("text"))
        .join(frame.select(col("doc_id"), col("lang")), Seq("doc_id"))
      val path = Files.createTempDirectory("graft-cleaned-")
      // overwrite into the fresh temp dir (createTempDirectory pre-creates
      // it, so errorifexists would refuse an empty directory). A failed
      // write must not leak the dir: no entry is stored on throw, so
      // nothing would ever delete it.
      try cleaned.write.mode("overwrite").parquet(path.toString)
      catch { case t: Throwable => deleteRecursively(path); throw t }
      Entry(path)
    })
    spark.read.parquet(e.path.toString)
  }

  private[graft] def memoSize: Int = stores.size()

  /** Drop every materialized cleaned corpus (all dirs) and delete the
    * backing temp dirs — [[graft.server.TankServer.stop]]'s hook.
    */
  private[graft] def invalidate(): Unit = stores.synchronized {
    val it = stores.entrySet().iterator()
    while (it.hasNext) { deleteRecursively(it.next().getValue.path); it.remove() }
  }

  /** Drop the materializations over `dir` (all k) — the hook a caller
    * that mutated `dir` invokes for a fresh materialization, mirroring
    * [[UnigramLm.invalidate(dir:String)*]]. NOT wired into any mutation
    * verb automatically (see the staleness contract above).
    */
  private[graft] def invalidate(dir: String): Unit = stores.synchronized {
    val seg = "|" + new java.io.File(dir).getAbsolutePath + "|"
    val it = stores.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.contains(seg)) { deleteRecursively(e.getValue.path); it.remove() }
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { Files.deleteIfExists(f): Unit })
    }
  }
}
