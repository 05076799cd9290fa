package graft.sources

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** ONE definition of the bloom-gated, bucket-pruned, budget-guarded
  * probe reduce the key-membership history stores share
  * ([[GramHistory.probeHistory]] over LONG gram keys,
  * [[HashHistory.probeHistory]] over BINARY md5 keys): batch keys are
  * pre-cut to [[KeyBloom]]-hit CANDIDATES (codegen'd
  * [[graft.functions.BloomBucketMightContain]] — no false negatives, so
  * answers stay exact), a fully-novel batch short-circuits to an empty
  * relation with ZERO store files read, a partially-novel one prunes the
  * store scan to the candidate keys' BUCKETS, and the broadcast build
  * side is enforced against [[graft.util.ProbeBudget]] — over budget the
  * reduce degrades to the co-located bucketed join instead of an opaque
  * broadcast failure.
  *
  * Each store owns its broadcast memo (a map revalidated by the
  * sidecar's GENERATION — never mtime) and passes it in; this object
  * holds no state.
  */
private[sources] object ProbeReduce {

  type BloomMemo = ConcurrentHashMap[String,
    (Long, Broadcast[Array[BloomFilter]], KeyBloom.Meta)]

  /** Saturation trip wire for the DEDUP_TUNING §5.1 trigger: effective
    * fpp ≥ [[SaturationWarnFactor]] × the created fpp, CAPPED at
    * [[SaturationWarnCeiling]] so stores created with a loose fpp
    * (> 1/factor — effFpp can never reach 10× them, it tops out at 1.0)
    * still warn when genuinely saturated. The probe already reads the
    * manifest, so the decayed-selectivity warning costs nothing — it
    * names the stat, the store and the verb (`compact()`) instead of
    * letting the bloom cut silently degrade toward the plain scan. Pure
    * so the spec can pin the threshold.
    */
  val SaturationWarnFactor = 10.0
  val SaturationWarnCeiling = 0.5

  def saturationWarning(table: String,
                        meta: KeyBloom.Meta): Option[String] = {
    val s = KeyBloom.saturation(meta)
    if (s.effFpp >= math.min(SaturationWarnFactor * meta.fpp,
        SaturationWarnCeiling))
      Some(f"$table: bloom sidecar saturated — ${s.render} " +
        f"(created fpp ${meta.fpp}%.2g); " +
        "compact() re-sizes the sidecar (DEDUP_TUNING §5.1)")
    else None
  }

  // warn once per saturation EPISODE, not per generation: every append
  // fold bumps the generation, so a gen-keyed memo would re-warn each
  // append-probe cycle (and grow forever); keying by table and clearing
  // on a healthy reading warns on the unhealthy TRANSITION and re-arms
  // after the compact that fixes it
  private val warned = ConcurrentHashMap.newKeySet[String]()

  private def warnIfSaturated(table: String, meta: KeyBloom.Meta): Unit =
    saturationWarning(table, meta) match {
      case Some(msg) =>
        if (warned.add(table))
          org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
      case None => warned.remove(table): Unit
    }

  /** The memoized sidecar-bloom broadcast (per-bucket array) + meta for
    * a store table, revalidated by the sidecar's generation counter —
    * the bloom array ships to executors once per store version, not once
    * per probe. Mutating verbs also invalidate in-process by removing
    * the table's memo entry.
    */
  def bloomBroadcast(spark: SparkSession, table: String, memo: BloomMemo)
      : Option[(Broadcast[Array[BloomFilter]], KeyBloom.Meta)] = {
    val base = Bucketing.guardBase(spark, table)
    KeyBloom.readMeta(spark, base) match {
      case None => memo.remove(table); None
      case Some(meta) =>
        Option(memo.get(table)) match {
          case Some((g, bc, m)) if g == meta.gen => Some((bc, m))
          case stale =>
            stale.foreach(_._2.unpersist())
            KeyBloom.readAll(spark, base).map { case (arr, m) =>
              val bc = spark.sparkContext.broadcast(arr)
              memo.put(table, (m.gen, bc, m))
              (bc, m)
            }
        }
    }
  }

  /** The bloom candidate cut of `keys` at the right TIER: under
    * [[graft.util.ProbeBudget.BloomConf]] the sidecar ships as one
    * generation-memoized broadcast array and the cut is the codegen'd
    * [[graft.functions.BloomBucketMightContain]] filter; past it — the
    * ≳10^9-key tier where no single process should hold the sidecar —
    * the cut is [[KeyBloom.taskLocalCut]] (batch keys shuffle to their
    * bucket, each task loads only its bucket's bloom). Identical
    * no-false-negatives semantics either way (spec-gated: the zero-read
    * and exactness gates re-run with the budget forced to 1). None when
    * no valid sidecar. The returned plan is NOT materialized.
    */
  def bloomCut(spark: SparkSession, table: String, keyCol: String,
               keys: DataFrame, memo: BloomMemo)
      : Option[(DataFrame, KeyBloom.Meta)] = {
    val base = Bucketing.guardBase(spark, table)
    KeyBloom.readMeta(spark, base).flatMap { meta =>
      warnIfSaturated(table, meta)
      if (KeyBloom.sidecarBytes(spark, base) <=
          graft.util.ProbeBudget.bloomBytes(spark))
        bloomBroadcast(spark, table, memo).map { case (bc, m) =>
          val keyExpr = org.apache.spark.sql.GraftBridge.expression(
            col(keyCol))
          val bidExpr = org.apache.spark.sql.GraftBridge.expression(
            KeyBloom.bucketIdCol(keyCol, m.buckets))
          (keys.select(col(keyCol)).filter(
            org.apache.spark.sql.GraftBridge.column(
              graft.functions.BloomBucketMightContain(keyExpr, bidExpr, bc))),
            m)
        }
      else
        Some((KeyBloom.taskLocalCut(spark, base, keys.select(col(keyCol)),
          keyCol, meta.buckets), meta))
    }
  }

  /** The probe reduce against a REGISTERED store table. `batchKeys` must
    * already be the single-`keyCol` batch key relation; `emptyKeys` is
    * the store's empty relation (schema'd — the zero-read short-circuit
    * result).
    */
  def probe(spark: SparkSession, table: String, keyCol: String,
            batchKeys: DataFrame, memo: BloomMemo, who: String,
            emptyKeys: => DataFrame): DataFrame =
    bloomCut(spark, table, keyCol, batchKeys, memo) match {
      case None =>
        // legacy store (no sidecar): materialize the batch keys once
        // (the emptiness/budget count and the broadcast build both
        // consume them — lazy, each would re-run the batch key
        // derivation; measured ~1 s per extra pass at sf0.1 for the
        // gram store), then the plain-parquet probe scan — the reduce
        // is a broadcast semi, so bucket co-location buys nothing and
        // the bucketed scan's one-partition-per-bucket split caps a
        // grown store's read at `buckets`-way parallelism
        val keys0 = graft.util.Materialize.eager(
          batchKeys.select(col(keyCol)))
        reduceOrFallback(spark, table, keyCol, keys0, keys0.count(),
          Bucketing.probeScan(spark, table).select(col(keyCol)), who)
      case Some((cut, meta)) =>
        // ONE materialization, of the bloom-CUT candidates directly: the
        // batch key derivation runs once into this checkpoint (the cut
        // rides the same pass), and the count, bucket collect and
        // broadcast build all read it — checkpointing the uncut keys
        // first (the round-17 shape) paid a second write + job for a
        // relation nothing else consumes
        val cand = graft.util.Materialize.eager(cut)
        // candidate count AND candidate buckets from ONE per-bucket
        // aggregation job (≤ `buckets` driver-side rows) — the separate
        // count() + distinct-bucket collect() of the round-17 shape paid
        // two scheduler round-trips for numbers one grouped scan yields
        val bidCounts = cand
          .groupBy(KeyBloom.bucketIdCol(keyCol, meta.buckets).as("_b"))
          .agg(count(lit(1)).as("_c")).collect()
        val n = bidCounts.map(_.getLong(1)).sum
        if (n == 0L)
          // nothing can match: zero store files read this probe
          emptyKeys
        else {
          // candidate buckets are ≤ `buckets` driver-side ints; the
          // store scan reads ONLY their files (a key can only live in
          // its own bucket)
          val bids = bidCounts.map(_.getInt(0)).toSet
          reduceOrFallback(spark, table, keyCol, cand, n,
            Bucketing.probeScan(spark, table, Some(bids))
              .select(col(keyCol)), who)
        }
    }

  /** The reduce tail under the broadcast budget: within budget, the
    * batch-bounded keyset broadcasts into a map-only scan of `store`
    * (the pruned plain-parquet read) and the reduced result broadcasts
    * onward; over budget — the batch ≪ store contract violated —
    * degrade to the co-located bucketed join (store-side sort, no store
    * exchange, bounded memory) with a named warning.
    */
  private def reduceOrFallback(spark: SparkSession, table: String,
      keyCol: String, keys: DataFrame, nKeys: Long, store: DataFrame,
      who: String): DataFrame = {
    import graft.util.ProbeBudget
    if (!ProbeBudget.within(spark, nKeys, ProbeBudget.BytesPerKeyRow)) {
      ProbeBudget.warnExceeded(
        org.slf4j.LoggerFactory.getLogger(getClass),
        s"$who candidate keyset for $table", nKeys,
        ProbeBudget.BytesPerKeyRow, spark)
      spark.table(table).select(col(keyCol))
        .join(keys, Seq(keyCol), "left_semi")
        .distinct()
    } else
      broadcast(store.join(broadcast(keys), Seq(keyCol), "left_semi")
        .distinct())
  }
}
