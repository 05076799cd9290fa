package graft.util

import org.apache.spark.sql.DataFrame

/** Eager materialization with an explicit fault-tolerance contract.
  *
  * Several builder APIs materialize a SMALL result eagerly so a large cached
  * upstream relation (shingle arrays, a spilled temp file) can be released
  * immediately instead of pinning executor storage for the session lifetime.
  * Doing that with `localCheckpoint` alone stores the result in
  * executor-LOCAL blocks: on a cluster losing an executor afterwards
  * (dynamic allocation, spot nodes — part of the 100 TB design target) the
  * DataFrame becomes permanently unrecoverable, because the lineage was
  * truncated too.
  *
  * [[eager]] therefore prefers a RELIABLE checkpoint whenever the session
  * has a checkpoint directory configured
  * (`spark.sparkContext.setCheckpointDir(...)` — on a cluster, point it at
  * the durable FS): the result is written there and survives any executor
  * loss. Without a configured directory it falls back to `localCheckpoint`,
  * which is exactly right for local[] runs and tests. Both forms store
  * partitions as-is (order-preserving) and both are EAGER — calling this
  * triggers a job, which is the documented cost of the builder APIs that
  * use it.
  */
object Materialize {
  /** Checkpoint-dir deployments should also set
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (or sweep the
    * directory periodically): Spark does not delete reliable-checkpoint
    * data by default, and repeated eager() calls otherwise accumulate it.
    */
  def eager(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      // checkpoint(eager) runs the materializing action AND a second job
      // that writes the checkpoint files; without a persist that second job
      // recomputes the entire upstream lineage (doubling the pipeline cost
      // and re-firing any diagnostic accumulators). Persist so the write
      // job reads the cached blocks, then drop the cache — the checkpoint
      // files carry the data from here on. A caller that ALREADY cached
      // this plan keeps its cache: unpersisting here would silently evict
      // the caller's entry (cache registration is plan-keyed).
      val alreadyCached =
        df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
      if (!alreadyCached) df.persist()
      try df.checkpoint(eager = true)
      finally if (!alreadyCached) df.unpersist(false)
    } else df.localCheckpoint(eager = true)
}
