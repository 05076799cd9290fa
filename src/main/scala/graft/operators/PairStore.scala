package graft.operators

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped persisted-relation store for verified near-dup PAIRS —
  * the composition device that keeps the resolution queries (x84/x85/x89)
  * from re-running the pair pipelines (x40's shingle→MinHash→LSH→verify,
  * x42's blocked exact search) they consume.
  *
  * Why this exists: a dedup pipeline computes the verified pair relation
  * ONCE and then derives everything else from it — components, keeper
  * election, per-language removal stats. Without a shared materialization,
  * each derived query re-executes the full corpus scan + shuffle of the
  * pair pipeline (at 100 TB, the most expensive plan in the engine) — the
  * exact defect this store removes: an explicit producer step ([[refresh]],
  * run by Verify/Bench/callers BEFORE the resolution queries) persists the
  * pairs to parquet, and every consumer ([[scanOrCompute]]) plans a parquet
  * scan of the candidates-sized relation instead of a corpus-sized rebuild.
  *
  * Laziness contract: BUILDING a registry frame never persists (or runs)
  * anything. [[scanOrCompute]] either returns a scan of an
  * already-persisted relation or returns the producer PLAN itself,
  * unexecuted — standalone consumers stay correct (they just pay the
  * pipeline when they finally run), and constructing a frame for
  * `explain()`/plan gates/empty-input tests has no side effects. Only the
  * explicit [[refresh]] (and [[register]]) step materializes.
  *
  * Store shape: pairs are candidates-sized (near-dup rate × corpus),
  * orders of magnitude below the corpus, so the persisted relation is
  * small parquet and the write rides the producer's one materializing
  * action. Entries are keyed by (Spark application, producer name, source
  * dir) — the source tables are immutable per dir, so a persisted relation
  * never goes stale within an application; a new JVM starts empty. Each
  * [[refresh]] publishes to a fresh generation-suffixed path and swaps the
  * registration afterwards, so a DataFrame handed out earlier keeps
  * resolving its own (still-present) files — no overwrite-under-reader
  * races. On a cluster, point [[rootDir]] at shared storage (any Hadoop-FS
  * URI) so executors and the driver resolve the same files; the default is
  * a JVM-lifetime temp directory, right for local[] runs and tests.
  *
  * The streaming twin of this device is the caller-provided
  * `appendPairs`/`allPairs` callback pair of
  * [[graft.streaming.CurationStreams.dupComponents]]: same contract
  * (persist verified pairs once, resolve from the store), with appends per
  * micro-batch instead of one batch write.
  */
object PairStore {

  /** Override via `graft.pairstore.dir` system property BEFORE first use
    * (cluster deployments: a durable shared-FS path).
    */
  private lazy val rootDir: String = {
    val configured = sys.props.get("graft.pairstore.dir")
    configured.getOrElse {
      val p = java.nio.file.Files.createTempDirectory("graft-pair-store")
      // best-effort local cleanup; harmless no-op for FS-backed overrides
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(p.toFile)
      }
      p.toString
    }
  }

  /** key → persisted parquet path, present only after a successful write. */
  private val persisted = new ConcurrentHashMap[String, String]()

  /** Monotone write-generation counter: every [[refresh]] writes to a fresh
    * path, so a concurrent reader of the previous generation never sees its
    * files deleted mid-scan and two concurrent refreshes cannot interleave
    * one overwrite.
    */
  private val generation = new AtomicLong(0L)

  private def key(spark: SparkSession, name: String, dir: String): String =
    spark.sparkContext.applicationId + "|" + name + "|" +
      new java.io.File(dir).getAbsolutePath

  private def pathFor(k: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"$rootDir/$hex-g${generation.incrementAndGet()}"
  }

  /** The consumer entry point — LAZY, side-effect-free: a parquet scan of
    * the persisted relation when a producer step already ran in this
    * application, else the producer plan itself (unexecuted — standalone
    * use keeps working and pays the pipeline only when the frame is finally
    * acted on). `compute` is by-name and is not touched when the store is
    * warm.
    */
  def scanOrCompute(spark: SparkSession, name: String, dir: String)
                   (compute: => DataFrame): DataFrame =
    Option(persisted.get(key(spark, name, dir))) match {
      case Some(p) => spark.read.parquet(p)
      case None => compute
    }

  /** The EXPLICIT producer step: compute the pair relation NOW, persist it
    * to a fresh generation path, publish the registration, and return the
    * store-backed frame (a parquet scan). Verify/Bench (and production
    * pipelines) call this for each declared producer before running the
    * resolution queries; its cost IS the pair-pipeline cost plus one
    * candidates-sized write.
    *
    * `compact = true` persists the SPANNING-STAR form instead
    * ([[Components.compactPairs]] — one `component → member` edge per
    * non-keeper, |E| collapsed to its connectivity floor). Every
    * resolution answer derived from the store (components, keeper
    * election, removal stats) is unchanged — compaction preserves
    * connected components by construction — but per-pair attributes
    * (similarity scores) are dropped and the raw candidate pairs are no
    * longer enumerable, so it is OPT-IN: wrong for a store whose content
    * is itself the query answer (x40's verified pairs, hash-checked
    * against the exhaustive oracle), right for the long-lived store of an
    * INCREMENTAL corpus (DEDUP_TUNING §4), where each delta refresh
    * re-persists old ∪ new pairs and an uncompacted dense clique would
    * otherwise grow the store quadratically across refreshes.
    */
  def refresh(spark: SparkSession, name: String, dir: String,
              compact: Boolean = false)
             (compute: => DataFrame): DataFrame = {
    val k = key(spark, name, dir)
    val p = pathFor(k)
    val rel = if (compact) {
      // producers disagree on endpoint column names (x40 persists
      // doc_a/doc_b, x42 id_a/id_b) — compact on the relation's OWN first
      // two columns rather than hard-coded defaults, so opting either
      // store into compaction works
      val computed = compute
      val Seq(src, dst) = computed.columns.take(2).toSeq
      Components.compactPairs(computed, srcCol = src, dstCol = dst)
    } else compute
    rel.write.mode("overwrite").parquet(p)
    persisted.put(k, p)
    spark.read.parquet(p)
  }

  /** Register an EXTERNALLY-written materialization of the producer's
    * relation (e.g. Verify's own per-query parquet output) so consumers —
    * and any oracle replaying the same files — read one shared copy.
    */
  def register(spark: SparkSession, name: String, dir: String,
               path: String): Unit =
    persisted.put(key(spark, name, dir), path): Unit

  /** The persisted path, if a producer step ran (plan-gate hook for specs). */
  private[graft] def persistedPath(spark: SparkSession, name: String,
                                   dir: String): Option[String] =
    Option(persisted.get(key(spark, name, dir)))

  /** Drop a registration (spec isolation; files are left for the sweep). */
  private[graft] def invalidate(spark: SparkSession, name: String,
                                dir: String): Unit =
    persisted.remove(key(spark, name, dir)): Unit
}
