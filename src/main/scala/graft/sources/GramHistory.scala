package graft.sources

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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
             buckets: Int = 8): Unit = {
    val table = tableFor(dir)
    MutationGuard.withGuard(spark, Bucketing.guardBase(spark, table)) {
      Bucketing.writeBucketed(gramHashes(corpus, k), table, GramCol, buckets)
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
      s"GramHistory.attach: table $table does not exist - run create() first")
    Bucketing.bucketCountOf(spark, table).foreach(n => require(n == buckets,
      s"GramHistory.attach: table $table was created with $n buckets, " +
        s"attach got $buckets - appends would corrupt the layout"))
    stores.put(key(spark, dir), (table, buckets)): Unit
  }

  /** Append an increment's gram hashes as bucket-compatible files. */
  def append(spark: SparkSession, dir: String, increment: DataFrame): Unit = {
    val (table, buckets) = Option(stores.get(key(spark, dir))).getOrElse(
      throw new IllegalStateException(
        s"GramHistory.append: no store registered for $dir — create() first"))
    MutationGuard.withGuard(spark, Bucketing.guardBase(spark, table)) {
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
  def compact(spark: SparkSession, dir: String): Unit = {
    val (table, buckets) = Option(stores.get(key(spark, dir))).getOrElse(
      throw new IllegalStateException(
        s"GramHistory.compact: no store registered for $dir — create() first"))
    MutationGuard.withGuard(spark, Bucketing.guardBase(spark, table)) {
      Bucketing.compactDistinct(spark, table, GramCol, buckets)
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

  private[graft] def registeredTable(spark: SparkSession,
                                     dir: String): Option[String] =
    Option(stores.get(key(spark, dir))).map(_._1)

  private[graft] def invalidate(spark: SparkSession, dir: String): Unit =
    stores.remove(key(spark, dir)): Unit
}
