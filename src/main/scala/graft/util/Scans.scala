package graft.util

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan fan-out for KERNEL-DOMINATED corpus passes — the
  * optimization-guide §2.5 "unsplittable input" case: the testdata corpus
  * ships as single-row-group parquet, so a bare scan plans ONE task and a
  * heavy per-doc kernel (gram/minhash/token/media UDFs — round-18
  * profiling: x114's gram pass ran 1.4 s on 1 of 32 cores) runs at
  * parallelism 1 while the rest of the session idles. File-split knobs
  * cannot fix this (a row group is the parquet split floor), so when the
  * planned scan parallelism is below half the session default this fans
  * out with ONE deterministic round-robin exchange of the raw rows (at
  * sf0.1 ~600 KB — pennies next to the 30× kernel parallelism it buys).
  * At production scale the input splits naturally (many files / row
  * groups), the predicate holds and NO exchange is added — the 100 TB
  * plan shape is unchanged; filters still push to the scan either way
  * (Catalyst sinks predicates through Repartition).
  *
  * Deliberately OPT-IN per heavy CORPUS-SCALE builder, never folded into
  * the table readers or shared batch kernels: applied globally it taxed
  * every small incremental probe with 32-task stages (a user
  * repartition's partitioning is exempt from AQE coalescing, so each
  * downstream map stage inherits it — measured 150 → 2,084 tasks on x125
  * and a ~2× wall regression on the probe family). Streaming frames pass
  * through untouched (micro-batches are batch-bounded — the tax case —
  * and a streaming plan has no RDD to inspect).
  */
object Scans {
  def fanOutForKernels(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= target) df
    else df.repartition(target)
  }
}
