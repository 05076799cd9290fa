package graft.sources

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted video FRAME-fingerprint history — the video member of the
  * incremental-dedup family ([[HashHistory]] = whole-doc, [[GramHistory]]
  * = substring, [[PhashHistory]] = whole-payload, [[LandmarkHistory]] =
  * audio): a NEW crawl batch's sampled-frame dHashes are probed against
  * the already-ingested corpus' frame sets WITHOUT rescanning its video
  * payloads, with the x108 Jaccard cut deciding near-dups.
  *
  * TWO bucketed relations, because the Jaccard denominator needs exact
  * per-video set sizes the matched subset cannot supply:
  *
  *  - `<table>`: `(phash LONG, id LONG)` — one row per DISTINCT frame hash
  *    per video, bucketed on `phash` (the probe's equi-join key: frame
  *    matching is EXACT hash equality — dHash absorbs the re-encode shift
  *    — so no banding/chunking is needed, unlike [[PhashHistory]]).
  *  - `<table>_sizes`: `(id LONG, n LONG)` — each history video's distinct
  *    frame-hash count, bucketed on `id`. The probe's match relation
  *    (match-pair-sized, tiny) exchanges INTO this layout; the sizes scan
  *    itself rides its buckets with no exchange, so per-batch cost stays
  *    batch-sized at any corpus size (FrameHistorySpec gates both scans
  *    exchange-free).
  *
  * Contracts shared with the sibling stores: session registry keyed by
  * (application, dir); [[create]]/[[append]]/[[compact]] under ONE
  * [[MutationGuard]] marker (the frames table's base — both relations
  * mutate together); [[create]] clears the [[StreamMark]] replay
  * watermark (new lineage). Append semantics: one video's frames arrive
  * in ONE batch (the ingest unit is a video); re-appending a video
  * duplicates its frame rows AND its sizes row, inflating n_match and
  * fanning out the sizes join until [[compact]] — the multiset caveat of
  * the [[LandmarkHistory]] replay contract, stated here because a
  * crashed-epoch replay can hit it.
  */
object FrameHistory {

  val KeyCol = "phash"

  private val stores = new ConcurrentHashMap[String, (String, Int)]()

  private def key(spark: SparkSession, dir: String): String =
    spark.sparkContext.applicationId + "|" + new java.io.File(dir).getAbsolutePath

  /** Deterministic table name for a source dir. */
  def tableFor(dir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(new java.io.File(dir).getAbsolutePath.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    s"graft_frame_history_$hex"
  }

  def sizesTableFor(dir: String): String = tableFor(dir) + "_sizes"

  /** The store shape of a frame-fingerprint frame: (phash, id). Input is
    * [[graft.operators.Multimodal.frameFingerprints]]' (media_id, phash)
    * relation — already DISTINCT per (video, hash).
    */
  def storeRows(frames: DataFrame): DataFrame =
    frames.select(col(KeyCol), col("media_id").as("id"))

  /** Per-video distinct-frame-hash counts — the Jaccard denominators. */
  def sizeRows(frames: DataFrame): DataFrame =
    frames.groupBy(col("media_id").as("id"))
      .agg(count(lit(1)).as("n"))

  /** PRODUCER step: persist the corpus' frame relation + sizes as the
    * bucketed history tables for `dir` and register them.
    */
  def create(spark: SparkSession, dir: String, frames: DataFrame,
             buckets: Int = 8): Unit = {
    val table = tableFor(dir)
    MutationGuard.withGuard(spark, Bucketing.guardBase(spark, table)) {
      Bucketing.writeBucketed(storeRows(frames), table, KeyCol, buckets)
      Bucketing.writeBucketed(sizeRows(frames), sizesTableFor(dir), "id", buckets)
    }
    // a recreated store is a NEW streaming lineage: drop any replay
    // watermark a previous stream left or its appends are silently skipped
    StreamMark.clear(spark, table)
    stores.put(key(spark, dir), (table, buckets)): Unit
  }


  /** Re-attach to an already-created store (new application, shared
    * metastore) — the restart path: at store scale a rebuild is exactly
    * what the persisted table exists to avoid. `buckets` must match the
    * created layout (appends write bucket-compatible segments). Fails
    * loudly if the table does not exist.
    */
  def attach(spark: SparkSession, dir: String, buckets: Int = 8): Unit = {
    val table = tableFor(dir)
    require(spark.catalog.tableExists(table),
      s"FrameHistory.attach: table $table does not exist - run create() first")
    require(spark.catalog.tableExists(sizesTableFor(dir)),
      s"FrameHistory.attach: sizes table missing - run create() first")
    Bucketing.requireBuckets(spark, table, buckets, "FrameHistory.attach")
    Bucketing.requireBuckets(spark, sizesTableFor(dir), buckets, "FrameHistory.attach")
    stores.put(key(spark, dir), (table, buckets)): Unit
  }

  /** Append an increment's frames (+ their sizes rows) as
    * bucket-compatible files. One-batch-per-video contract: see the
    * object scaladoc.
    */
  def append(spark: SparkSession, dir: String, frames: DataFrame): Unit = {
    val (table, buckets) = Option(stores.get(key(spark, dir))).getOrElse(
      throw new IllegalStateException(
        s"FrameHistory.append: no store registered for $dir — create() first"))
    MutationGuard.withGuard(spark, Bucketing.guardBase(spark, table)) {
      storeRows(frames)
        .write.mode(SaveMode.Append)
        .bucketBy(buckets, KeyCol)
        .sortBy(KeyCol)
        .format("parquet")
        .saveAsTable(table)
      sizeRows(frames)
        .write.mode(SaveMode.Append)
        .bucketBy(buckets, "id")
        .sortBy("id")
        .format("parquet")
        .saveAsTable(sizesTableFor(dir))
    }
  }

  /** STORE-SIZED compaction: frames to DISTINCT (phash, id) rows, sizes
    * REBUILT from the compacted frames (restoring exact denominators after
    * any replay double-append) — probes answer identically before and
    * after on a clean store, bucket layouts preserved (spec-gated).
    */
  def compact(spark: SparkSession, dir: String): Unit = {
    val (table, buckets) = Option(stores.get(key(spark, dir))).getOrElse(
      throw new IllegalStateException(
        s"FrameHistory.compact: no store registered for $dir — create() first"))
    MutationGuard.withGuard(spark, Bucketing.guardBase(spark, table)) {
      Bucketing.compactDistinct(spark, table, KeyCol, buckets,
        allColumns = true)
      Bucketing.writeBucketed(
        spark.table(table).groupBy(col("id")).agg(count(lit(1)).as("n")),
        sizesTableFor(dir), "id", buckets)
    }
  }

  /** LAZY consumer entry: (frames, sizes) bucketed scans when a producer
    * step ran for this (application, dir), else the caller's derived
    * plans.
    */
  def scanOrCompute(spark: SparkSession, dir: String)
                   (compute: => (DataFrame, DataFrame)): (DataFrame, DataFrame) =
    Option(stores.get(key(spark, dir))) match {
      case Some((table, _)) =>
        (spark.table(table).select(col(KeyCol), col("id")),
          spark.table(sizesTableFor(dir)).select(col("id"), col("n")))
      case None => compute
    }

  private[graft] def registeredTable(spark: SparkSession,
                                     dir: String): Option[String] =
    Option(stores.get(key(spark, dir))).map(_._1)

  private[graft] def invalidate(spark: SparkSession, dir: String): Unit =
    stores.remove(key(spark, dir)): Unit
}
