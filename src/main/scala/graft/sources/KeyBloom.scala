package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.sketch.BloomFilter

/** Persisted key-membership bloom SIDECAR for a bucketed history store —
  * the exactness-preserving probe accelerator the gram store needs at
  * crawl cadence: store keys are uniform 64-bit hashes, so parquet
  * min/max zone maps CANNOT skip anything (every hash-bucketed sorted
  * file spans essentially the full key range — its row-group stats are
  * saturated by construction), and per-file blooms die combinatorially
  * for large batches (a file survives pruning iff ANY of m probe keys
  * false-positives into it: 1 − (1 − fpp)^m → 1 already at m ≈ 1/fpp).
  * What DOES work at every scale is one STORE-LEVEL bloom consulted on
  * the BATCH side: a key the bloom misses is definitively absent
  * (blooms have no false negatives), so the exact store verify runs
  * only over bloom-hit candidates — dup-density-sized plus an fpp
  * fraction of the fresh keys — and a fully-novel batch touches ZERO
  * store files. False positives cost nothing but verify work; answers
  * stay exact ([[GramHistory]]'s probe semantics are unchanged).
  *
  * Layout: `<tableLocation>_zones/keybloom.bin` =
  * [expected: Long][fpp: Double][inserted: Long][spark BloomFilter
  * bytes]. The sidecar lives BESIDE the table directory so
  * [[Bucketing.compactDistinct]]'s drop-and-rename never touches it
  * (compaction rebuilds it anyway). Writes go through a `.tmp` +
  * rename, so a reader never sees a torn file; all mutating callers
  * already hold the store's [[MutationGuard]].
  *
  * Sizing: created at `headroom ×` the current key count so appends
  * have room; `inserted` tracks growth past capacity — saturation only
  * RAISES the false-positive rate (probe degrades toward the plain
  * scan, never toward a wrong answer) and `compact()` re-sizes. At
  * 100 TB (~10^11 grams) one monolithic bloom is ~150 GB and stops
  * being broadcastable — the layout extends to one sidecar per bucket
  * (same format, task-local loads riding the existing bucket split);
  * the single-file form is the ≤10^9-key tier this repo's scales
  * exercise.
  */
object KeyBloom {

  /** Default false-positive rate: ~8.5 bits/key — a 10^8-key store's
    * sidecar is ~107 MB (broadcast-viable), and an fpp miss only adds
    * a verified-and-discarded candidate.
    */
  val DefaultFpp = 0.02

  /** Creation headroom: capacity = 2× the keys present at (re)build. */
  val Headroom = 2L

  final case class Meta(expected: Long, fpp: Double, inserted: Long)

  def pathFor(base: String): Path = new Path(base + "_zones/keybloom.bin")

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Atomically (write-tmp-then-rename) persist the bloom + meta. */
  def write(spark: SparkSession, base: String, bloom: BloomFilter,
            meta: Meta): Unit = {
    val p = pathFor(base)
    val f = fs(spark, p)
    val tmp = new Path(p.toString + ".tmp")
    val out = new DataOutputStream(f.create(tmp, true))
    try {
      out.writeLong(meta.expected)
      out.writeDouble(meta.fpp)
      out.writeLong(meta.inserted)
      bloom.writeTo(out)
    } finally out.close()
    if (f.exists(p)) f.delete(p, false): Unit
    if (!f.rename(tmp, p))
      throw new java.io.IOException(s"KeyBloom: rename $tmp -> $p failed")
  }

  /** Load the sidecar; None when absent (legacy store — probes fall back
    * to the plain scan) or unreadable (torn/foreign bytes degrade to the
    * fallback, never to a wrong answer).
    */
  def read(spark: SparkSession, base: String): Option[(BloomFilter, Meta)] = {
    val p = pathFor(base)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = new DataInputStream(f.open(p))
      try {
        val meta = Meta(in.readLong(), in.readDouble(), in.readLong())
        Some((BloomFilter.readFrom(in), meta))
      } catch {
        case _: java.io.IOException => None
      } finally in.close()
    }
  }

  def delete(spark: SparkSession, base: String): Unit = {
    val p = pathFor(base)
    val f = fs(spark, p)
    if (f.exists(p)) f.delete(p, false): Unit
  }

  /** Modification time of the sidecar (0 when absent) — the cross-verb
    * cache validity check for memoized broadcasts.
    */
  def mtime(spark: SparkSession, base: String): Long = {
    val p = pathFor(base)
    val f = fs(spark, p)
    if (f.exists(p)) f.getFileStatus(p).getModificationTime else 0L
  }
}
