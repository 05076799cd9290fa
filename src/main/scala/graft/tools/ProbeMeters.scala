package graft.tools

import org.apache.spark.sql.DataFrame

/** Shared measurement devices for the scale-probe mains. */
private[tools] object ProbeMeters {

  /** Store bytes measured from the EXECUTED plan's scan nodes: the sum of
    * file bytes each matching store relation SELECTED for read (post
    * bucket-pruning / post zero-read short-circuit — the design claim
    * itself, load-immune and free of counter pollution: task input
    * metrics count localCheckpoint block reads, and hadoop-fs counters
    * are flaky across the vectorized reader). Callers must run with AQE
    * off so the scans are collectible. `pathSubstrings` selects which
    * relations count as "store" (table-location name fragments).
    */
  def selectedStoreBytes(df: DataFrame, pathSubstrings: Seq[String]): Long =
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists { p =>
          val t = p.toString
          pathSubstrings.exists(t.contains)
        } => s.relation.location.sizeInBytes
    }.sum
}
