package graft.sources

import org.apache.spark.sql.SparkSession

/** Enforced single-mutating-writer guard for the derived-index stores
  * (Bm25Store / IvfStore / HashHistory / GramHistory) — upgrades the
  * [[SwapDir]] / [[Bucketing.compactDistinct]] concurrency contract from
  * documentation to a LOUD failure: every mutating verb (create / append /
  * compact) runs under an exclusive marker file, so an append racing a
  * compact fails at acquire instead of silently losing its files.
  *
  * Mechanics: acquire is ONE `create(overwrite = false)` of
  * `<base>_mutating` — atomic winner on any Hadoop FS — holding
  * `holder expiresAt`; release deletes it (in a finally — a failed verb
  * releases). A marker past its TTL is treated as abandoned (a crashed
  * writer) and stolen via delete-then-create.
  *
  * Stated limits, deliberately accepted: the steal path has a
  * delete/create window in which two stealers can interleave (the
  * epoch-NAMED scheme in FeatureStore's Lease closes it at the cost of
  * epoch bookkeeping — these stores are manifest-free derived artifacts,
  * rebuildable from the corpus, so the cheap guard that makes the COMMON
  * race loud is the right bill), and a writer that outlives the TTL can
  * be stolen from mid-write — size `ttlMillis` above the longest compact.
  * Readers are unaffected: the guard serializes mutations only.
  */
object MutationGuard {

  /** Run `body` holding the exclusive mutation marker for `base`
    * (the store root for dir stores; the table location for table
    * stores — a path whose PARENT outlives the mutation). Throws
    * IllegalStateException if the marker is held and fresh after
    * `waitMillis` of bounded retry. Session confs
    * `spark.graft.store.guardWaitMillis` / `guardTtlMillis` override the
    * defaults for all store verbs at once (ops knob — size the TTL above
    * the longest compact).
    */
  def withGuard[A](spark: SparkSession, base: String,
                   waitMillis: Long = 30 * 1000L,
                   ttlMillis: Long = 10 * 60 * 1000L)(body: => A): A = {
    val wait = spark.conf
      .get("spark.graft.store.guardWaitMillis", waitMillis.toString).toLong
    val ttl = spark.conf
      .get("spark.graft.store.guardTtlMillis", ttlMillis.toString).toLong
    val marker = new org.apache.hadoop.fs.Path(base + "_mutating")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val holder = spark.sparkContext.applicationId + "/" +
      Thread.currentThread().getId
    val deadline = System.currentTimeMillis + wait
    var acquired = false
    while (!acquired) {
      try {
        val out = fs.create(marker, false)
        try out.write(
          s"$holder ${System.currentTimeMillis + ttl}\n".getBytes("UTF-8"))
        finally out.close()
        acquired = true
      } catch {
        case _: java.io.IOException =>
          val stale =
            try System.currentTimeMillis -
              fs.getFileStatus(marker).getModificationTime > ttl
            catch { case _: java.io.IOException => false } // vanished: retry
          if (stale) { fs.delete(marker, false): Unit }
          else if (System.currentTimeMillis > deadline)
            throw new IllegalStateException(
              s"MutationGuard: $marker held by another writer after " +
                s"${wait}ms — index-store mutations are single-writer " +
                "(concurrent append/compact would lose files); serialize " +
                "them or raise spark.graft.store.guardWaitMillis")
          else Thread.sleep(200)
      }
    }
    try body finally { fs.delete(marker, false): Unit }
  }
}
