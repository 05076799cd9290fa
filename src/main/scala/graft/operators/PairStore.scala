package graft.operators

import java.util.concurrent.ConcurrentHashMap

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
  * exact defect this store removes: the producer query ([[refresh]])
  * persists the pairs to parquet, and every consumer ([[readOrCompute]])
  * plans a parquet scan of the candidates-sized relation instead of a
  * corpus-sized rebuild.
  *
  * Store shape: pairs are candidates-sized (near-dup rate × corpus),
  * orders of magnitude below the corpus, so the persisted relation is
  * small parquet and the write rides the producer's one materializing
  * action. Entries are keyed by (Spark application, producer name, source
  * dir) — the source tables are immutable per dir, so a persisted relation
  * never goes stale within an application; a new JVM starts empty. On a
  * cluster, point [[rootDir]] at shared storage (any Hadoop-FS URI) so
  * executors and the driver resolve the same files; the default is a
  * JVM-lifetime temp directory, right for local[] runs and tests.
  *
  * The streaming twin of this device is the pair store
  * [[graft.streaming.StreamPairStore]] that
  * [[graft.streaming.CurationStreams.dupComponents]] appends to — same
  * contract (persist verified pairs once, resolve from the store), with
  * appends per micro-batch instead of one batch write.
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

  private def key(spark: SparkSession, name: String, dir: String): String =
    spark.sparkContext.applicationId + "|" + name + "|" +
      new java.io.File(dir).getAbsolutePath

  private def pathFor(k: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"$rootDir/$hex"
  }

  /** Compute the pair relation NOW, persist it, register it, and return the
    * store-backed frame (a parquet scan — consumers of the returned frame
    * never re-plan the producing pipeline). The producer query calls this:
    * its cost IS the pair-pipeline cost plus one candidates-sized write.
    */
  def refresh(spark: SparkSession, name: String, dir: String)
             (compute: => DataFrame): DataFrame = {
    val k = key(spark, name, dir)
    val p = pathFor(k)
    compute.write.mode("overwrite").parquet(p)
    persisted.put(k, p)
    spark.read.parquet(p)
  }

  /** The consumer entry point: a parquet scan of the persisted relation
    * when the producer already ran in this application, else compute-and-
    * persist (standalone use keeps working; only the FIRST resolution call
    * pays the pipeline, and only when no producer preceded it).
    */
  def readOrCompute(spark: SparkSession, name: String, dir: String)
                   (compute: => DataFrame): DataFrame =
    Option(persisted.get(key(spark, name, dir))) match {
      case Some(p) => spark.read.parquet(p)
      case None => refresh(spark, name, dir)(compute)
    }

  /** The persisted path, if the producer ran (plan-gate hook for specs). */
  private[graft] def persistedPath(spark: SparkSession, name: String,
                                   dir: String): Option[String] =
    Option(persisted.get(key(spark, name, dir)))

  /** Drop a registration (spec isolation; files are left for the sweep). */
  private[graft] def invalidate(spark: SparkSession, name: String,
                                dir: String): Unit =
    persisted.remove(key(spark, name, dir)): Unit
}
