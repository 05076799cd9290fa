package graft.sources

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH index — the text NEAR-DUP member of the
  * incremental-dedup family, completing its symmetry ([[HashHistory]] =
  * whole-doc EXACT, [[GramHistory]] = substring, [[PhashHistory]] =
  * payload, [[LandmarkHistory]] = audio, [[FrameHistory]] = video; text
  * near-dup had only the all-corpus batch form x40): a NEW crawl batch's
  * MinHash band buckets are probed against the already-ingested corpus'
  * persisted index WITHOUT re-running corpus-wide LSH — the production
  * text-dedup deployment (nobody re-pairs 100 TB per crawl; the batch
  * probes a signature index, the published MinHash-LSH serving shape).
  *
  * TWO bucketed relations, the [[FrameHistory]] device (candidates need
  * one layout, exact verification another):
  *
  *  - `<table>`: `(bucket LONG, id, n_chars)` — one row per (doc, band):
  *    xxhash64 of (banded-signature bucket, lang) — the band index AND
  *    the language fold into the key, so the same-lang candidate
  *    restriction (x40's scale contract) is structural and the probe
  *    join keeps a SINGLE equi key riding the bucket layout (a separate
  *    lang equality would become a second join key and force a history-
  *    side exchange; a cross-band/cross-lang 64-bit coincidence admits a
  *    spurious candidate at P ≈ 2⁻⁶⁴ — far below the banding budget).
  *    n_chars rides along for the non-equi length-window condition.
  *    32 rows × 24 B/doc.
  *  - `<table>_sh`: `(id LONG, shash LONG)` — one row per distinct word
  *    trigram per doc, xxhash64-keyed (8-byte keys; a collision can only
  *    INFLATE an intersection — the x99/x102 accepted 4e-8 budget, and
  *    the per-doc row count doubles as the exact Jaccard denominator),
  *    bucketed on `id` so the verify fetch for candidate history docs
  *    rides the layout with NO history-side exchange. Corpus-token-scale
  *    like [[GramHistory]] — the documented store-as-state posture.
  *
  * Contracts shared with the sibling stores: session registry keyed by
  * (application, dir); [[create]]/[[append]]/[[compact]] under ONE
  * [[MutationGuard]] marker (both relations mutate together); [[create]]
  * clears the [[StreamMark]] replay watermark. Append semantics: one
  * doc's rows arrive in ONE batch; re-appending a doc duplicates its
  * band rows (candidate dups — absorbed by the probe's pair DISTINCT)
  * AND its shingle rows (inflating BOTH the intersection and the
  * denominator until [[compact]] rebuilds distinct rows) — the multiset
  * replay caveat of the family.
  */
object MinHashHistory {

  val KeyCol = "bucket"

  private val stores = new ConcurrentHashMap[String, (String, Int)]()

  // memoized band-table sidecar-bloom broadcasts, generation-validated
  // (the GramHistory device — see [[ProbeReduce]]/[[KeyBloom]])
  private val blooms: ProbeReduce.BloomMemo = new ConcurrentHashMap()

  private def key(spark: SparkSession, dir: String): String =
    spark.sparkContext.applicationId + "|" + new java.io.File(dir).getAbsolutePath

  /** Deterministic table name for a source dir. */
  def tableFor(dir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(new java.io.File(dir).getAbsolutePath.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    s"graft_minhash_history_$hex"
  }

  def shTableFor(dir: String): String = tableFor(dir) + "_sh"

  /** PRODUCER step: persist the corpus' band index + shingle-hash
    * relation as the bucketed history tables for `dir` and register them.
    * `bands` must be (bucket, id, n_chars); `shingles` (id, shash).
    */
  def create(spark: SparkSession, dir: String, bands: DataFrame,
             shingles: DataFrame, buckets: Int = 8,
             bloomFpp: Double = KeyBloom.DefaultFpp): Unit = {
    val table = tableFor(dir)
    MutationGuard.withGuard(spark, Bucketing.guardBase(spark, table)) {
      Bucketing.writeBucketed(bands, table, KeyCol, buckets)
      Bucketing.writeBucketed(shingles, shTableFor(dir), "id", buckets)
      rebuildBloom(spark, table, buckets, bloomFpp)
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
      s"MinHashHistory.attach: table $table does not exist - run create() first")
    require(spark.catalog.tableExists(shTableFor(dir)),
      s"MinHashHistory.attach: shingle table missing - run create() first")
    Bucketing.requireBuckets(spark, table, buckets, "MinHashHistory.attach")
    Bucketing.requireBuckets(spark, shTableFor(dir), buckets, "MinHashHistory.attach")
    stores.put(key(spark, dir), (table, buckets)): Unit
  }

  /** Append an increment's band + shingle rows as bucket-compatible
    * files. One-batch-per-doc contract: see the object scaladoc.
    */
  def append(spark: SparkSession, dir: String, bands: DataFrame,
             shingles: DataFrame): Unit = {
    val (table, buckets) = Option(stores.get(key(spark, dir))).getOrElse(
      throw new IllegalStateException(
        s"MinHashHistory.append: no store registered for $dir — create() first"))
    MutationGuard.withGuard(spark, Bucketing.guardBase(spark, table)) {
      // fold BEFORE the table append (the GramHistory ordering: crash
      // residue is phantom bloom keys — harmless — never band keys the
      // bloom misses); failures drop the sidecar, not the store
      val base = Bucketing.guardBase(spark, table)
      try {
        if (KeyBloom.fold(spark, base,
            bands.select(col(KeyCol)).distinct(), KeyCol).exists(_ > 0L))
          blooms.remove(table): Unit
      } catch {
        case scala.util.control.NonFatal(e) =>
          KeyBloom.delete(spark, base)
          blooms.remove(table): Unit
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"MinHashHistory: bloom sidecar update failed for $table — " +
              s"sidecar dropped, probes fall back to the full band scan: " +
              s"${e.getMessage}")
      }
      bands.write.mode(SaveMode.Append)
        .bucketBy(buckets, KeyCol).sortBy(KeyCol)
        .format("parquet").saveAsTable(table)
      shingles.write.mode(SaveMode.Append)
        .bucketBy(buckets, "id").sortBy("id")
        .format("parquet").saveAsTable(shTableFor(dir))
    }
  }

  /** (Re)build the band table's [[KeyBloom]] sidecar — per-bucket
    * task-local; failure degrades to the full band scan (the family
    * contract). Keyed on the DISTINCT band-bucket hashes (the band
    * table's rows repeat a bucket across docs; membership is per key).
    */
  private def rebuildBloom(spark: SparkSession, table: String,
                           buckets: Int,
                           fpp: Double = KeyBloom.DefaultFpp): Unit =
    try {
      KeyBloom.build(spark, Bucketing.guardBase(spark, table),
        spark.table(table).select(col(KeyCol)).distinct(), KeyCol, buckets,
        fpp)
      blooms.remove(table): Unit
    } catch {
      case scala.util.control.NonFatal(e) =>
        KeyBloom.delete(spark, Bucketing.guardBase(spark, table))
        blooms.remove(table): Unit
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"MinHashHistory: bloom sidecar build failed for $table — " +
            s"probes fall back to the full band scan: ${e.getMessage}")
    }

  /** STORE-SIZED compaction to distinct rows in both relations — probes
    * answer identically before and after on a clean store (and a replay
    * double-append's inflation is undone), bucket layouts preserved.
    */
  def compact(spark: SparkSession, dir: String): Unit = {
    val (table, buckets) = Option(stores.get(key(spark, dir))).getOrElse(
      throw new IllegalStateException(
        s"MinHashHistory.compact: no store registered for $dir — create() first"))
    MutationGuard.withGuard(spark, Bucketing.guardBase(spark, table)) {
      Bucketing.compactDistinct(spark, table, KeyCol, buckets,
        allColumns = true)
      Bucketing.compactDistinct(spark, shTableFor(dir), "id", buckets,
        allColumns = true)
      // re-size the band sidecar to the surviving distinct keys (also
      // the legacy store's upgrade path)
      rebuildBloom(spark, table, buckets)
    }
  }

  /** LAZY consumer entry: (bands, shingles) store scans when a producer
    * step ran for this (application, dir), else the caller's derived
    * plans. The store scans read the tables' FILES as plain parquet
    * ([[Bucketing.probeScan]]): the probe joins broadcast the batch side
    * into map-only store scans, so bucket co-location buys nothing there
    * and the bucketed scan's one-partition-per-bucket split would cap a
    * grown store's read at `buckets`-way parallelism.
    */
  def scanOrCompute(spark: SparkSession, dir: String)
                   (compute: => (DataFrame, DataFrame)): (DataFrame, DataFrame) =
    Option(stores.get(key(spark, dir))) match {
      case Some((table, _)) =>
        (Bucketing.probeScan(spark, table)
          .select(col(KeyCol), col("id"), col("n_chars")),
          Bucketing.probeScan(spark, shTableFor(dir))
            .select(col("id"), col("shash")))
      case None => compute
    }

  /** Bloom-gated band-scan reducer for
    * [[graft.operators.Dedup.incrementalNearDups]] — PURE FILE PRUNING
    * (no broadcast, no semi-join: the downstream probe join already
    * reduces rows; what grows with history is the band-store BYTES READ
    * per probe): given the batch's materialized band-key relation, cut
    * it to [[KeyBloom]]-hit candidates (codegen'd, no false negatives)
    * and return the band-store scan restricted to the candidate keys'
    * BUCKET files — a fully-novel batch reads ZERO band-store files,
    * and with no band candidates the operator's early exit skips the
    * shingle store too, closing the all-legs zero-read story for a
    * novel crawl batch (hash + gram + near-dup). None when no producer
    * step registered this (application, dir) — callers keep their
    * derived-history relation.
    */
  def bandScanReducer(spark: SparkSession, dir: String)
      : Option[DataFrame => DataFrame] =
    Option(stores.get(key(spark, dir))).map { case (table, _) => keys =>
      val cols = Seq(col(KeyCol), col("id"), col("n_chars"))
      ProbeReduce.bloomCut(spark, table, KeyCol, keys, blooms) match {
        case None => Bucketing.probeScan(spark, table).select(cols: _*)
        case Some((cut, meta)) =>
          // the cut is consumed exactly ONCE (this bucket-id collect):
          // one grouped-aggregation job over the (already-materialized)
          // batch band keys replaces the round-17 eager-checkpoint +
          // isEmpty + distinct-collect trio — same bucket set, two fewer
          // scheduler round-trips per probe
          val bids = cut
            .groupBy(KeyBloom.bucketIdCol(KeyCol, meta.buckets).as("_b"))
            .agg(count(lit(1))).collect().map(_.getInt(0)).toSet
          Bucketing.probeScan(spark, table, Some(bids)).select(cols: _*)
      }
    }

  /** Sidecar-saturation trigger statistic for the BAND sidecar
    * (DEDUP_TUNING §5.1) — see [[GramHistory.bloomStat]]; manifest-only,
    * None when unregistered or legacy.
    */
  def bloomStat(spark: SparkSession,
                dir: String): Option[KeyBloom.Saturation] =
    registeredTable(spark, dir).flatMap(t =>
      KeyBloom.saturationStat(spark, Bucketing.guardBase(spark, t)))

  private[graft] def registeredTable(spark: SparkSession,
                                     dir: String): Option[String] =
    Option(stores.get(key(spark, dir))).map(_._1)

  private[graft] def invalidate(spark: SparkSession, dir: String): Unit = {
    Option(stores.get(key(spark, dir)))
      .foreach(t => Option(blooms.remove(t._1)).foreach(_._2.unpersist()))
    stores.remove(key(spark, dir)): Unit
  }
}
