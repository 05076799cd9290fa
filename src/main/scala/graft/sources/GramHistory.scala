package graft.sources

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Persisted character-GRAM history store — [[HashHistory]]'s substring-
  * level sibling, completing the incremental pair: x86 answers "is this
  * whole document already in the corpus", this answers "how much of this
  * document's TEXT already appears in the corpus" (Lee et al.-style
  * substring contamination of a NEW batch against an existing corpus,
  * without rescanning the corpus per batch).
  *
  * Stored relation: one LONG column `gh` = xxhash64 of each distinct
  * k-gram's UTF-8 bytes ([[graft.operators.Kernels.charGramHashCounts]]
  * — the x99 production keying; 8 B/gram, collision budget documented
  * there), bucketed+sorted by `gh` so the batch probe join rides the
  * layout with NO history-side exchange — x86's scaling contract,
  * PlanSpec-style-gated in GramHistorySpec. Sizing: a 100 TB corpus has
  * ~10^11 distinct 40-grams ≈ 1 TB of store at 8 B+overhead/gram —
  * 2^10–2^14 buckets; testdata uses 8.
  *
  * Same session-registry contract as [[HashHistory]]: building a
  * consumer frame is side-effect-free; [[create]] is the explicit
  * producer step; appends are bucket-compatible files whose cross-append
  * repeats the probe's semantics absorb (membership, not counts).
  */
object GramHistory {

  val GramCol = "gh"

  private val stores = new ConcurrentHashMap[String, (String, Int)]()

  // memoized sidecar-bloom broadcasts, validated by the sidecar's
  // GENERATION counter (monotonic, bumped by every committed write — NOT
  // mtime, whose 1 s/1 ms granularity can alias a rewrite by another
  // application sharing the store and silently serve a stale bloom with
  // FALSE NEGATIVES) so the (possibly large) bloom array ships to
  // executors once per store version, not once per probe; mutating verbs
  // also invalidate in-process
  private val blooms: ProbeReduce.BloomMemo = new ConcurrentHashMap()

  /** Broadcast-budget conf for the probe-reduce build side — the shared
    * incremental-family knob ([[graft.util.ProbeBudget]]): when a probe's
    * bloom-hit candidate keyset exceeds it, [[probeHistory]] falls back
    * to the co-located bucketed join instead of an unbounded broadcast —
    * the batch ≪ store contract, ENFORCED rather than documented: a
    * caller whose "batch" rivals the store degrades to the graceful
    * sort-merge shape, never to a driver OOM / 8 GB broadcast error.
    */
  val ProbeBudgetConf: String = graft.util.ProbeBudget.Conf

  private def key(spark: SparkSession, dir: String): String =
    spark.sparkContext.applicationId + "|" + new java.io.File(dir).getAbsolutePath

  /** Deterministic table name for a source dir. */
  def tableFor(dir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(new java.io.File(dir).getAbsolutePath.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    s"graft_gram_history_$hex"
  }

  /** Distinct gram hashes of a corpus — the store's content and the
    * shape [[append]] expects for an increment.
    */
  def gramHashes(corpus: DataFrame, k: Int,
                 textCol: String = "text"): DataFrame = {
    val gramsU = udf((t: String) =>
      graft.operators.Kernels.charGramHashCounts(t, k).keys.toArray)
    corpus.select(explode(gramsU(col(textCol))).as(GramCol)).distinct()
  }

  /** PRODUCER step: persist the corpus' distinct gram hashes as the
    * bucketed history table for `dir` and register it.
    */
  def create(spark: SparkSession, dir: String, corpus: DataFrame, k: Int,
             buckets: Int = 8,
             bloomFpp: Double = KeyBloom.DefaultFpp): Unit = {
    val table = tableFor(dir)
    MutationGuard.withGuard(spark, Bucketing.guardBase(spark, table)) {
      Bucketing.writeBucketed(gramHashes(corpus, k), table, GramCol, buckets)
      rebuildBloom(spark, table, buckets, bloomFpp)
    }
    // a recreated store is a NEW streaming lineage: drop any replay
    // watermark a previous stream left or its appends are silently skipped
    StreamMark.clear(spark, table)
    stores.put(key(spark, dir), (table, buckets)): Unit
  }

  /** (Re)build the [[KeyBloom]] sidecar from the table's current keys —
    * one extra store pass at producer time, per-bucket task-local
    * ([[KeyBloom.build]]: each task writes ONE bucket's bloom; no
    * driver-side bloom bytes). Sized with [[KeyBloom.Headroom]] so
    * appends have capacity; failures only lose the accelerator (probes
    * fall back to the plain scan), never the store, so they degrade
    * loudly-but-nonfatally.
    */
  private def rebuildBloom(spark: SparkSession, table: String,
                           buckets: Int,
                           fpp: Double = KeyBloom.DefaultFpp): Unit =
    try {
      KeyBloom.build(spark, Bucketing.guardBase(spark, table),
        spark.table(table).select(col(GramCol)), GramCol, buckets, fpp)
      blooms.remove(table): Unit
    } catch {
      case scala.util.control.NonFatal(e) =>
        KeyBloom.delete(spark, Bucketing.guardBase(spark, table))
        blooms.remove(table): Unit
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"GramHistory: bloom sidecar build failed for $table — probes " +
            s"fall back to the plain store scan: ${e.getMessage}")
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
      s"GramHistory.attach: table $table does not exist - run create() first")
    Bucketing.requireBuckets(spark, table, buckets, "GramHistory.attach")
    stores.put(key(spark, dir), (table, buckets)): Unit
  }

  /** Append an increment's gram hashes as bucket-compatible files. */
  def append(spark: SparkSession, dir: String, increment: DataFrame): Unit = {
    val (table, buckets) = Option(stores.get(key(spark, dir))).getOrElse(
      throw new IllegalStateException(
        s"GramHistory.append: no store registered for $dir — create() first"))
    MutationGuard.withGuard(spark, Bucketing.guardBase(spark, table)) {
      // fold the increment into the bloom sidecar BEFORE the table
      // append: a crash between the two steps then leaves the bloom with
      // phantom keys (false positives — verified away, harmless), never
      // the table with keys the bloom misses (false negatives — silently
      // wrong probes). The fold is per-bucket task-local
      // ([[KeyBloom.fold]]): only touched buckets' blooms are read,
      // updated and rewritten, in ONE distributed job that also returns
      // the folded count — no driver-side bloom bytes, no separate
      // count() job (the round-17 monolith paid both per micro-batch).
      // Past-capacity growth only raises the fpp (probe selectivity
      // degrades, answers stay exact); compact() re-sizes. A legacy
      // store without a sidecar stays legacy — a rebuild here would
      // cost a full store scan per append.
      val base = Bucketing.guardBase(spark, table)
      try {
        if (KeyBloom.fold(spark, base,
            increment.select(col(GramCol)), GramCol).exists(_ > 0L))
          blooms.remove(table): Unit
      } catch {
        case scala.util.control.NonFatal(e) =>
          // a sidecar that may be missing the increment's keys would
          // give FALSE NEGATIVES — delete it rather than risk that
          KeyBloom.delete(spark, base)
          blooms.remove(table): Unit
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"GramHistory: bloom sidecar update failed for $table — " +
              s"sidecar dropped, probes fall back to the plain scan: " +
              s"${e.getMessage}")
      }
      increment.select(col(GramCol))
        .write.mode(SaveMode.Append)
        .bucketBy(buckets, GramCol)
        .sortBy(GramCol)
        .format("parquet")
        .saveAsTable(table)
    }
  }

  /** STORE-SIZED compaction: appends accumulate cross-append repeats of
    * the same gram (membership semantics absorb them, but bytes and file
    * counts grow with every batch) — compaction rewrites the table to its
    * DISTINCT grams, one bucketed segment, via
    * [[Bucketing.compactDistinct]] (sibling-table-then-rename;
    * single-mutating-writer contract there) — probes before and after
    * answer identically and the bucket layout (and therefore the
    * no-history-exchange probe plan) is preserved (spec-gated).
    */
  def compact(spark: SparkSession, dir: String,
              bloomFpp: Double = KeyBloom.DefaultFpp): Unit = {
    val (table, buckets) = Option(stores.get(key(spark, dir))).getOrElse(
      throw new IllegalStateException(
        s"GramHistory.compact: no store registered for $dir — create() first"))
    MutationGuard.withGuard(spark, Bucketing.guardBase(spark, table)) {
      Bucketing.compactDistinct(spark, table, GramCol, buckets)
      // re-size the bloom sidecar to the compacted key count (this is
      // also the upgrade path: a legacy, saturated or pre-per-bucket
      // store gains a right-sized per-bucket sidecar at its next
      // compaction; bloomFpp re-tunes the zero-read batch ceiling —
      // see create())
      rebuildBloom(spark, table, buckets, bloomFpp)
    }
  }

  /** LAZY consumer entry: the bucketed table scan when a producer step
    * ran for this (application, dir), else the caller's derived plan.
    */
  def scanOrCompute(spark: SparkSession, dir: String)
                   (compute: => DataFrame): DataFrame =
    Option(stores.get(key(spark, dir))) match {
      case Some((table, _)) => spark.table(table).select(col(GramCol))
      case None => compute
    }

  /** PROBE consumer entry — the relation a batch probe should semi-join
    * instead of the raw store scan: the store's keys REDUCED to the
    * batch's own key set (gh-membership over `batchKeys` is identical to
    * the full history's, which is all a membership semi-join observes),
    * returned broadcast-hinted so the downstream probe join is a
    * broadcast-hash semi over a map-only store scan — no store-side
    * exchange AND no store-side sort (the pre-round-17 bucketed
    * sort-merge shape re-SORTED the multi-segment store per probe; that
    * sort was the one incremental-probe cost that grew with history).
    *
    * With a [[KeyBloom]] sidecar, batch keys are pre-cut to bloom-hit
    * CANDIDATES first (no false negatives — a bloom miss is definitively
    * absent; the cut is the codegen'd
    * [[graft.functions.BloomBucketMightContain]], not an interpreted
    * UDF), so the broadcast build set is dup-density-sized plus an fpp
    * sliver of the fresh keys; a fully-novel batch short-circuits to an
    * EMPTY relation with ZERO store files read, and a partially-novel
    * one PRUNES the store scan to the candidate keys' BUCKETS (a key can
    * only live in its own bucket — [[Bucketing.probeScan]]'s pruned
    * form). Both spec-gated. Without a sidecar (legacy store) the
    * reduction still runs against all batch keys — the sort-free scan
    * win stands.
    *
    * Contract — ENFORCED: `batchKeys` is batch-bounded (the incremental
    * family's premise — a probe batch is orders smaller than the store).
    * When the (bloom-cut) keyset's estimated broadcast footprint exceeds
    * [[ProbeBudgetConf]], the probe degrades to the co-located bucketed
    * sort-merge join (the graceful pre-round-17 shape: store-side sort,
    * no exchange, no unbounded broadcast) with a named warning, instead
    * of an opaque 8 GB-limit/driver-OOM failure. Falls back to `compute`
    * when no producer step registered this (application, dir).
    */
  def probeHistory(spark: SparkSession, dir: String, batchKeys: DataFrame)
                  (compute: => DataFrame): DataFrame =
    Option(stores.get(key(spark, dir))) match {
      case None =>
        // no producer step: the derived in-query history, reduced the
        // same way so the caller sees ONE contract (always probe-reduced)
        broadcast(compute.select(col(GramCol))
          .join(broadcast(batchKeys.select(col(GramCol))), Seq(GramCol),
            "left_semi")
          .distinct())
      case Some((table, _)) =>
        ProbeReduce.probe(spark, table, GramCol, batchKeys, blooms,
          "GramHistory.probeHistory",
          spark.range(0).select(col("id").as(GramCol)))
    }

  /** Spec hook: the generation-validated memoized bloom broadcast. */
  private[graft] def bloomBroadcast(spark: SparkSession, table: String)
      : Option[(Broadcast[Array[BloomFilter]], KeyBloom.Meta)] =
    ProbeReduce.bloomBroadcast(spark, table, blooms)

  /** Sidecar-saturation trigger statistic (DEDUP_TUNING §5.1): the
    * manifest-only stat that says WHEN to [[compact]] — appends fold keys
    * into blooms sized at create(), so growth past capacity decays probe
    * SELECTIVITY (never exactness) and collapses the novel-batch
    * zero-read ceiling. None when no store is registered for `dir` or
    * the store is legacy (no sidecar).
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
