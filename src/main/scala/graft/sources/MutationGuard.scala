package graft.sources

import org.apache.spark.sql.SparkSession

/** Enforced single-mutating-writer guard for the derived-index stores
  * (Bm25Store / IvfStore / AnnStore / HashHistory / GramHistory) — upgrades
  * the [[SwapDir]] / [[Bucketing.compactDistinct]] concurrency contract
  * from documentation to a LOUD failure: every mutating verb (create /
  * append / compact) runs under an exclusive marker file, so an append
  * racing a compact fails at acquire instead of silently losing its files.
  *
  * Mechanics: acquire is ONE `create(overwrite = false)` of
  * `<base>_mutating` holding `holder expiresAt`; release deletes it (on
  * success AND on body failure). Staleness is judged by the HOLDER's
  * declared `expiresAt` — a long-running compact that raised its own TTL
  * is protected from an appender running the default — falling back to
  * mtime + this session's TTL only when the content is torn (a creator
  * that crashed mid-write). A writer that created the marker but failed
  * to write its content deletes its own torn marker before propagating,
  * so an I/O hiccup cannot wedge the store for a TTL.
  *
  * Stated limits, deliberately accepted: `create(overwrite = false)` is
  * atomic on HDFS and local filesystems but check-then-write on most
  * object stores (S3A) — there the guard is best-effort and a true lock
  * must come from the job scheduler; the steal path has a delete/create
  * window in which two stealers can interleave (the epoch-NAMED scheme in
  * FeatureStore's Lease closes it at the cost of epoch bookkeeping —
  * these stores are manifest-free derived artifacts, rebuildable from the
  * corpus, so the cheap guard that makes the COMMON race loud is the
  * right bill). A writer that outlives its declared TTL can be stolen
  * from mid-write; release detects that (ownership check) and fails
  * LOUDLY so the overlap is investigated, never silent. Readers are
  * unaffected: the guard serializes mutations only.
  */
object MutationGuard {

  /** Run `body` holding the exclusive mutation marker for `base`
    * (the store root for dir stores; the table location for table
    * stores — a path whose PARENT outlives the mutation). Throws
    * IllegalStateException if the marker is held and unexpired after
    * `waitMillis` of bounded retry, or if this writer's own marker was
    * stolen during `body` (TTL outlived — another writer may have
    * overlapped). Session confs `spark.graft.store.guardWaitMillis` /
    * `guardTtlMillis` override the defaults for all store verbs at once
    * (ops knob — size the TTL above the longest compact).
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
    // unique per ACQUISITION (not just per thread): the release-time
    // ownership check must distinguish our marker from a thief's
    val holder = spark.sparkContext.applicationId + "/" +
      Thread.currentThread().getId + "/" + java.util.UUID.randomUUID()
    acquire(fs, marker, holder, wait, ttl)
    val result =
      try body
      catch { case e: Throwable =>
        // body failed: best-effort owned release; never mask `e`
        try { if (heldBy(fs, marker).contains(holder)) fs.delete(marker, false): Unit }
        catch { case _: java.io.IOException => () }
        throw e
      }
    // body succeeded: a stolen marker means another writer may have
    // overlapped our mutation — loud, and leave the thief's marker alone
    if (heldBy(fs, marker).contains(holder)) {
      try { fs.delete(marker, false): Unit }
      catch { case e: java.io.IOException =>
        // the verb DID succeed; a failed unlock only delays the next
        // writer until steal — warn, don't fail the mutation
        System.err.println(s"[MutationGuard] release of $marker failed " +
          s"(next writer steals after the TTL): ${e.getMessage}")
      }
    } else
      throw new IllegalStateException(
        s"MutationGuard: marker $marker was stolen during the mutation — " +
          "this writer outlived its TTL and another mutation may have " +
          "overlapped. Verify the store (derived stores are rebuildable) " +
          "and raise spark.graft.store.guardTtlMillis above the longest verb")
    result
  }

  private def acquire(fs: org.apache.hadoop.fs.FileSystem,
                      marker: org.apache.hadoop.fs.Path, holder: String,
                      wait: Long, ttl: Long): Unit = {
    val deadline = System.currentTimeMillis + wait
    var acquired = false
    while (!acquired) {
      val out =
        try Some(fs.create(marker, false))
        catch { case _: java.io.IOException => None } // held (or FS refusal)
      out match {
        case Some(o) =>
          try {
            try o.write(
              s"$holder ${System.currentTimeMillis + ttl}\n".getBytes("UTF-8"))
            finally o.close()
            acquired = true
          } catch { case e: java.io.IOException =>
            // WE created it but could not write content — remove our own
            // torn marker rather than wedging every writer for a TTL
            try { fs.delete(marker, false): Unit }
            catch { case _: java.io.IOException => () }
            throw e
          }
        case None =>
          // staleness by the holder's DECLARED expiry; mtime+ttl only
          // when the content is torn; "vanished" reads as fresh (retry)
          val stale =
            try {
              val mtime = fs.getFileStatus(marker).getModificationTime
              expiryOf(fs, marker) match {
                case Some(exp) => System.currentTimeMillis > exp
                case None => System.currentTimeMillis - mtime > ttl
              }
            } catch { case _: java.io.IOException => false }
          if (System.currentTimeMillis > deadline)
            throw new IllegalStateException(
              s"MutationGuard: $marker held by another writer after " +
                s"${wait}ms — index-store mutations are single-writer " +
                "(concurrent append/compact would lose files); serialize " +
                "them or raise spark.graft.store.guardWaitMillis")
          else if (stale) {
            // best-effort steal; the deadline above bounds the loop even
            // when the delete cannot succeed (e.g. ACL-denied)
            fs.delete(marker, false): Unit
            Thread.sleep(50)
          } else Thread.sleep(200)
      }
    }
  }

  /** The `holder` recorded in the marker, None when absent or torn. */
  private def heldBy(fs: org.apache.hadoop.fs.FileSystem,
                     marker: org.apache.hadoop.fs.Path): Option[String] =
    content(fs, marker).map(_._1)

  private def expiryOf(fs: org.apache.hadoop.fs.FileSystem,
                       marker: org.apache.hadoop.fs.Path): Option[Long] =
    content(fs, marker).map(_._2)

  private def content(fs: org.apache.hadoop.fs.FileSystem,
                      marker: org.apache.hadoop.fs.Path): Option[(String, Long)] =
    try {
      val in = fs.open(marker)
      val line =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .find(_.nonEmpty).getOrElse("")
        finally in.close()
      line.split("\\s+") match {
        case Array(h, x) => Some((h, x.toLong))
        case _ => None
      }
    } catch {
      case _: java.io.IOException | _: NumberFormatException => None
    }
}
