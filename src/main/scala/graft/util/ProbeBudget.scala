package graft.util

import org.apache.spark.sql.SparkSession

/** ONE broadcast-budget knob for the incremental-probe family's
  * batch-derived build sides ([[graft.sources.GramHistory.probeHistory]]'s
  * bloom-hit keyset, [[graft.operators.Dedup]]'s band buckets and gram
  * key sets): the family's batch ≪ store contract makes these
  * broadcast-bounded BY PREMISE, and this budget ENFORCES the premise —
  * a caller whose "batch" rivals the store degrades to the non-broadcast
  * join shape (graceful: sort-merge, bounded memory) with a named
  * warning instead of hitting Spark's 8 GB broadcast limit or a driver
  * OOM with no contract named.
  *
  * The estimate is rows × a per-row HashedRelation footprint constant —
  * deliberately coarse (the guard distinguishes "a batch" from "half the
  * store", not 400 from 500 MB). Default 512 MiB ≈ 20M+ keys: far above
  * any sane micro-batch, so the guard trips only on genuine violations.
  */
object ProbeBudget {

  val Conf = "spark.graft.probe.broadcastBudgetBytes"
  val Default: Long = 512L << 20

  /** Separate budget for shipping a store's [[graft.sources.KeyBloom]]
    * sidecar as ONE broadcast array (the ≤10^9-key tier): past it, the
    * probe's bloom cut flips to task-local per-bucket loads — each task
    * reads only its bucket's bloom (sidecar/buckets bytes), so no single
    * process ever holds the whole sidecar. ~10^9 keys at 8.5 bits/key is
    * ~1 GiB, the default cut-over.
    */
  val BloomConf = "spark.graft.probe.bloomBroadcastBudgetBytes"
  val BloomDefault: Long = 1L << 30

  def bloomBytes(spark: SparkSession): Long =
    spark.conf.getOption(BloomConf).map(_.toLong).getOrElse(BloomDefault)

  /** Estimated broadcast bytes/row for a narrow (≤3-column fixed-width)
    * build side in a HashedRelation.
    */
  val BytesPerKeyRow = 24L
  val BytesPerBandRow = 48L

  def bytes(spark: SparkSession): Long =
    spark.conf.getOption(Conf).map(_.toLong).getOrElse(Default)

  /** True when `rows` at `bytesPerRow` fit the configured budget. */
  def within(spark: SparkSession, rows: Long, bytesPerRow: Long): Boolean =
    rows * bytesPerRow <= bytes(spark)

  def warnExceeded(log: org.slf4j.Logger, what: String, rows: Long,
                   bytesPerRow: Long, spark: SparkSession): Unit =
    log.warn(s"$what: $rows rows estimate ${rows * bytesPerRow} B against " +
      s"$Conf=${bytes(spark)} B — the batch-bounded probe contract is " +
      "violated; degrading to the non-broadcast join. Use the co-located " +
      "operator path for store-scale batches.")
}
