package graft.sources

import org.apache.spark.sql.SparkSession

/** Write-sibling-then-swap for parquet-directory stores — the ONE
  * definition of the compaction choreography [[graft.operators.Bm25Store]]
  * and [[graft.operators.IvfStore]] share: materialize the rewritten
  * relation into a `_compact` sibling (reads stay consistent until it is
  * complete), then delete the current dir and rename the sibling in.
  *
  * CONCURRENCY CONTRACT — single mutating writer: swap and any concurrent
  * `append` to the same dir race — an append that commits between the
  * sibling write and the delete is destroyed by the delete (and, for
  * multi-relation stores, its sibling relations survive, leaving the
  * relations inconsistent). Store MUTATIONS (create/append/compact) are
  * therefore serialized: every store verb runs under [[MutationGuard]],
  * so a racing second writer fails LOUDLY at acquire instead of losing
  * files. Concurrent READS are safe at every point except the
  * delete+rename window itself, whose crash/read residue is a missing
  * dir — i.e. a rebuildable-store state, never a silently wrong answer.
  */
object SwapDir {

  /** Run `write(tmpDir)` against `dir + "_compact"`, then swap it in. */
  def apply(spark: SparkSession, dir: String)(write: String => Unit): Unit = {
    val cur = new org.apache.hadoop.fs.Path(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir + "_compact")
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(tmp, true)
    write(tmp.toString)
    fs.delete(cur, true)
    if (!fs.rename(tmp, cur))
      throw new java.io.IOException(s"SwapDir: rename $tmp -> $cur failed")
  }
}
