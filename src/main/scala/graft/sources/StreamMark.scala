package graft.sources

import org.apache.spark.sql.SparkSession

/** Persisted replay watermark for the store-append streaming twins
  * ([[graft.streaming.CurationStreams]]): the last batchId whose append
  * committed to a history store, written BESIDE the store table's location
  * (like the [[MutationGuard]] marker) so it survives compaction's
  * drop+rename of the table dir.
  *
  * Streaming batchIds are monotonic only per CHECKPOINT LINEAGE — a
  * recreated store (or a fresh stream with a new checkpoint) must start
  * from -1, or the stale mark silently skips every append with
  * batchId <= the old lineage's high-water mark and the store permanently
  * misses those rows. Each store's `create()` therefore calls [[clear]]:
  * store lifetime and mark lifetime are tied together at the one place a
  * new lineage legitimately begins.
  */
object StreamMark {

  /** Mark location for a store addressed by a raw base PATH (the
    * [[graft.operators.IvfStore]] family — no catalog table): a
    * `_stream_batch` sibling, like [[MutationGuard]]'s `_mutating`.
    */
  def markPathAt(base: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(base + "_stream_batch")

  def markPath(spark: SparkSession, table: String)
      : org.apache.hadoop.fs.Path =
    markPathAt(Bucketing.guardBase(spark, table))

  /** Last committed append's batchId, or -1 when no mark exists (fresh
    * lineage) or the mark is unreadable (degrade to replay-one-batch,
    * which the stores' membership semantics absorb).
    */
  def read(spark: SparkSession, table: String): Long =
    readMark(spark, markPath(spark, table))

  /** [[read]] for a path-addressed store. */
  def readAt(spark: SparkSession, base: String): Long =
    readMark(spark, markPathAt(base))

  private def readMark(spark: SparkSession,
                       p: org.apache.hadoop.fs.Path): Long =
    try {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) -1L
      else {
        val in = fs.open(p)
        try new String(in.readAllBytes(), "UTF-8").trim.toLong
        finally in.close()
      }
    } catch { case _: java.io.IOException | _: NumberFormatException => -1L }

  /** Best-effort persist (overwrite) of the last-committed append's
    * batchId; a failure degrades to the caller's in-session guard — the
    * restart then replays that one append (see each streaming twin's
    * replay contract for what a re-append means per store).
    */
  def write(spark: SparkSession, table: String, batchId: Long): Unit =
    writeMark(spark, markPath(spark, table), table, batchId)

  /** [[write]] for a path-addressed store. */
  def writeAt(spark: SparkSession, base: String, batchId: Long): Unit =
    writeMark(spark, markPathAt(base), base, batchId)

  private def writeMark(spark: SparkSession, p: org.apache.hadoop.fs.Path,
                        label: String, batchId: Long): Unit =
    try {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(p, true)
      try out.write(s"$batchId\n".getBytes("UTF-8")) finally out.close()
    } catch { case e: java.io.IOException =>
      System.err.println(s"[store-stream] could not persist replay " +
        s"watermark for $label (restart will re-append batch $batchId — " +
        s"see the twin's replay contract for semantics): ${e.getMessage}")
    }

  /** Delete the mark — called by every store `create()` so a recreated
    * store starts a fresh lineage at -1 (best-effort: an IOException here
    * would also have failed the guarded table write that follows).
    */
  def clear(spark: SparkSession, table: String): Unit =
    clearMark(spark, markPath(spark, table))

  /** [[clear]] for a path-addressed store. */
  def clearAt(spark: SparkSession, base: String): Unit =
    clearMark(spark, markPathAt(base))

  private def clearMark(spark: SparkSession,
                        p: org.apache.hadoop.fs.Path): Unit =
    try {
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, false): Unit
    } catch { case _: java.io.IOException => () }
}
