package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF layout for approximate vector search — the third index
  * lifecycle ([[AnnStore]] = PQ codes, [[Bm25Store]] = lexical postings,
  * this = coarse-quantized VECTOR partitions): fit centroids once, lay
  * the corpus out in per-cell parquet DIRECTORIES, and answer each query
  * by reading only its probed cells — partition pruning as the ANN
  * mechanism itself. The transient x43b entry re-assigns the corpus per
  * call; the store pays assignment once and converts `nprobe/nlist` from
  * a scored-row filter into a FILES-NOT-READ ratio, which is the form
  * that matters at 100 TB (a 4/64 probe reads ~6% of the bytes).
  *
  * Layout under `path`:
  *  - `centroids` — (cell, ce ARRAY<double>) rows, nlist total (tiny;
  *    collected on open — exact double round-trip, so reopened stores
  *    probe identically).
  *  - `vectors/cell=N/…` — (vec_id, embedding) partitioned by the
  *    map-only nearest-centroid assignment ([[Similarity.assignCells]]).
  *
  * Search is bit-identical to [[Similarity.ivfTopKWithCentroids]] with
  * this store's centroids (same probe ranking, same exact cosine within
  * probed cells — the spec asserts equality). Appends: new batches
  * assign against the FROZEN centroids map-only and land in their cell
  * directories; re-create refreshes centroids when the embedding
  * distribution drifts (same rolling contract as [[AnnStore]]).
  */
object IvfStore {

  private def centroidsPath(path: String) = s"$path/centroids"
  private def vectorsPath(path: String) = s"$path/vectors"

  /** Fit + assign + lay out; returns the fitted centroids. */
  def create(spark: SparkSession, path: String, corpus: DataFrame,
             nlist: Int = 16, kmeansIters: Int = 2): Array[Array[Double]] =
      graft.sources.MutationGuard.withGuard(spark, path) {
    import spark.implicits._
    // store lifetime and streaming-replay-mark lifetime are tied together
    // (the StreamMark contract): a recreated store starts a fresh lineage
    graft.sources.StreamMark.clearAt(spark, path)
    val cents = Similarity.kmeansCentroids(corpus, nlist, kmeansIters)
    cents.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }
      .toSeq.toDF("cell", "ce")
      .repartition(1)
      .write.mode("overwrite").parquet(centroidsPath(path))
    // null/ragged rows dead-letter at ingest — an unguarded null NPEs
    // assignCells and a ragged row would be SERVED with silently-wrong
    // prefix distances forever after (round-15 ragged battery)
    val clean = if (cents.isEmpty) corpus
      else Similarity.dropInvalidVecs(corpus, cents(0).length, None)
    Similarity.assignCells(clean, cents)
      .write.mode("overwrite").partitionBy("cell").parquet(vectorsPath(path))
    cents
  }

  /** The frozen centroid set (nlist rows — driver-tiny, exact doubles). */
  def centroids(spark: SparkSession, path: String): Array[Array[Double]] =
    spark.read.parquet(centroidsPath(path))
      .select(col("cell"), col("ce")).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)

  /** Assign a new batch against the frozen centroids and append its cell
    * partitions — map-only, batch-sized, no refit. The delta coalesces
    * before the partitioned write (the Bm25Store.append device: an
    * uncoalesced batch writes partitions × cells small files per append,
    * and file count is what degrades a daily-append store).
    */
  def append(spark: SparkSession, path: String, newCorpus: DataFrame,
             deltaPartitions: Int = 8): Unit =
    graft.sources.MutationGuard.withGuard(spark, path) {
      val cents = centroids(spark, path)
      val clean = if (cents.isEmpty) newCorpus
        else Similarity.dropInvalidVecs(newCorpus, cents(0).length, None)
      Similarity.assignCells(clean, cents)
        .coalesce(deltaPartitions)
        .write.mode("append").partitionBy("cell").parquet(vectorsPath(path))
    }

  /** INDEX-SIZED compaction: re-cluster the vector partitions to ~one
    * file per cell dir (daily appends accumulate a file per touched cell
    * per batch) — one index-sized exchange, no corpus access, centroids
    * untouched. Restores DISTINCT rows (the MinHashHistory.compact
    * device): a crashed-epoch streaming replay re-appends a batch
    * verbatim, and the duplicate (vec_id, embedding) rows each take a
    * top-k seat until compaction collapses them. Shares
    * [[graft.sources.SwapDir]]'s write-sibling-then-swap device (and its
    * single-mutating-writer contract) with [[Bm25Store.compact]]; on a
    * duplicate-free store search answers are bit-identical (spec-gated).
    */
  def compact(spark: SparkSession, path: String): Unit =
    graft.sources.MutationGuard.withGuard(spark, path) {
      graft.sources.SwapDir(spark, vectorsPath(path)) { tmp =>
        spark.read.parquet(vectorsPath(path))
          .dropDuplicates()
          .repartition(col("cell"))
          .write.partitionBy("cell").parquet(tmp)
      }
    }

  /** Top-k by exact cosine within each query's `nprobe` probed cells,
    * reading ONLY those cells' directories.
    */
  def search(spark: SparkSession, path: String, queries: DataFrame,
             k: Int, nprobe: Int = 4): DataFrame = {
    import spark.implicits._
    val cents = centroids(spark, path)
    // ragged/null queries take no seat (prefix cosine would silently lie)
    val q = if (cents.isEmpty) queries
      else queries.filter(col("qe").isNotNull &&
        size(col("qe")) === cents(0).length)
    val probes = Similarity.probeCells(q, cents, nprobe)
    val probedCells = probes.select(col("cell")).distinct().as[Long].collect()
    val vecs = spark.read.parquet(vectorsPath(path))
      .filter(col("cell").isin(probedCells.toIndexedSeq: _*))
    val scored = vecs.join(broadcast(probes), "cell")
      .withColumn("cos_sim", Similarity.cosine(col("embedding"), col("qe")))
    Similarity.rank(scored, k)
  }
}
