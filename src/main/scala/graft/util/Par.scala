package graft.util

import java.util.concurrent.{Callable, ExecutionException, Executors}

/** Concurrent evaluation of INDEPENDENT builder legs (optimization guide
  * §2.6, "overlap independent jobs"): a composed query's legs each run a
  * short chain of small eager jobs — bloom-cut checkpoints, bucket
  * collects, broadcast builds — whose tasks leave most of the cluster (or
  * local[N]) idle while the driver waits between jobs. Spark's scheduler
  * happily runs jobs submitted from several driver threads at once (FIFO:
  * a later job's tasks back-fill executors freed by the current job's
  * tail), so overlapping the chains cuts the composition's wall without
  * changing any leg's plan, partitioning or answer.
  *
  * Contract: thunks must be INDEPENDENT (no thunk reads another's result;
  * shared inputs must already be materialized by the caller). A fresh
  * pool per call, sized to the thunk count and shut down in finally — no
  * shared state across calls, and worker threads are created from the
  * submitting thread so Spark's inheritable thread-locals (job group,
  * local properties) carry over. The first thunk failure is rethrown
  * as-is to the caller.
  */
object Par {
  def all[T](thunks: (() => T)*): Seq[T] = {
    if (thunks.lengthCompare(2) < 0) return thunks.map(_()).toSeq
    val pool = Executors.newFixedThreadPool(thunks.length)
    try {
      val futures = thunks.map(t => pool.submit(new Callable[T] {
        override def call(): T = t()
      }))
      futures.map { f =>
        try f.get()
        catch { case e: ExecutionException => throw e.getCause }
      }.toSeq
    } finally pool.shutdown()
  }
}
