package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index for the BM25 path ([[Bm25]]) — the index-vs-scan
  * trade the transient x92 entry cannot make: x92 pays one corpus scan per
  * query BATCH (right for one-off decontamination sweeps); a store that
  * serves retrieval continuously builds the postings ONCE and answers each
  * query from the index alone — no corpus scan at query time at all.
  *
  * Layout under `path` (plain parquet, manifest-free: the index is a
  * derived artifact — rebuild, don't repair):
  *  - `postings/bucket=N/…` — (tok, doc_id, tf, dl) rows, hash-partitioned
  *    into `nBuckets` directories by pmod(xxhash64(tok), nBuckets). A query
  *    computes its terms' buckets and reads ONLY those directories
  *    (partition pruning skips every other file — the Z-range device
  *    applied to the lexical axis), then pushes the tok equality into the
  *    pruned scan.
  *  - `df/bucket=N/…` — (tok, df) exact document frequencies, same
  *    bucketing.
  *  - `meta` — one row: (n_buckets, n_docs, sum_dl). n_buckets rides in
  *    the store because the query side must hash terms with the SAME
  *    modulus; both sides compute the bucket via Spark's own xxhash64, so
  *    hash parity is by construction.
  *
  * Query cost at 100 TB: matched buckets × (postings bytes / nBuckets) +
  * a vocabulary-bounded df lookup + a one-row stats read — independent of
  * corpus-scan cost. Scoring reuses [[Bm25.contribution]] verbatim and
  * the two-phase bucketed rank, so store answers are bit-identical to
  * the transient scan's (the spec asserts exactly that; df over ALL
  * tokens restricted to query terms equals x92's candidate-relation df by
  * definition).
  *
  * Appends are BATCH-SIZED, not rebuilds: every index relation is
  * additive — postings rows are per-(doc, tok) (new docs append into
  * their hash-matched bucket directories), df is a per-token COUNT
  * (append the batch's delta rows; readers sum per token over the pruned
  * buckets — segment-merge deferred to query time, where it touches only
  * the query's own terms), and meta's n_docs/sum_dl are scalars (append
  * a segment row; readers sum). n_buckets is the one frozen datum — the
  * append re-reads it from meta so the hash modulus always matches the
  * layout. A 100 TB corpus ingesting daily pays one batch scan per day;
  * [[create]] remains the compaction path when segment counts grow.
  * Appended docs must be NEW doc_ids (dedup upstream — x86's exact job);
  * re-appending an existing doc would double its postings.
  */
object Bm25Store {

  private def postingsPath(path: String) = s"$path/postings"
  private def dfPath(path: String) = s"$path/df"
  private def metaPath(path: String) = s"$path/meta"

  /** Pinned schemas for the two PARTITIONED relations (the IvfStore
    * device): an empty-corpus store writes no part files under a
    * partitionBy dir, and inference then throws UNABLE_TO_INFER_SCHEMA
    * on the first query — the pinned layout makes an empty store answer
    * empty. `meta` needs no pin: its global aggregate always emits one
    * row, even over an empty corpus.
    */
  private val PostingsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("doc_id", LongType), StructField("dl", LongType),
      StructField("tok", StringType), StructField("tf", LongType),
      StructField("bucket", LongType)))
  }
  private val DfSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("tok", StringType), StructField("df", LongType),
      StructField("bucket", LongType)))
  }

  private def readPostings(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(PostingsSchema).parquet(postingsPath(path))

  private def readDf(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(DfSchema).parquet(dfPath(path))

  // ---- session registry (the HashHistory/PairStore device, path-shaped):
  // a producer step (createFor) builds the index ONCE per (application,
  // corpus dir); query entries then answer from the store and fall back to
  // the transient corpus scan when no producer ran (standalone
  // correctness). Keyed by applicationId so a new application never trusts
  // a previous run's files blindly — createFor overwrites.

  /** (appId|dir) -> store path, present after [[createFor]]. */
  private val stores = new ConcurrentHashMap[String, String]()

  private def key(spark: SparkSession, dir: String): String =
    spark.sparkContext.applicationId + "|" +
      new java.io.File(dir).getAbsolutePath

  /** Deterministic store path for a corpus dir (tmp-rooted: the index is a
    * derived artifact — rebuild, don't back up).
    */
  def pathFor(dir: String): String = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(new java.io.File(dir).getAbsolutePath.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/graft_bm25_store_$hex"
  }

  /** Producer step: build (overwrite) the index for `dir`'s corpus and
    * register it for this application. Callers treat failure as
    * "no store" — query entries keep their transient fallback.
    */
  def createFor(spark: SparkSession, dir: String, docs: DataFrame,
                nBuckets: Int = 64): Unit = {
    create(spark, pathFor(dir), docs, nBuckets)
    stores.put(key(spark, dir), pathFor(dir)): Unit
  }

  /** The registered store path for `dir`, if a producer ran here. */
  def registered(spark: SparkSession, dir: String): Option[String] =
    Option(stores.get(key(spark, dir)))

  private[graft] def invalidate(): Unit = stores.clear()

  /** One corpus scan → bucketed postings + df + stats. */
  def create(spark: SparkSession, path: String, docs: DataFrame,
             nBuckets: Int = 64): Unit =
      graft.sources.MutationGuard.withGuard(spark, path) {
    val tokUdf = udf((t: String) => Kernels.tokenCounts(t, Bm25.MinTokenLen))
    val postings = docs
      .select(col("doc_id"), tokUdf(lower(col("text"))).as("m"))
      .select(col("doc_id"),
        aggregate(map_values(col("m")), lit(0L), (a, x) => a + x).as("dl"),
        explode(col("m")).as(Seq("tok", "tf")))
      .withColumn("bucket", pmod(xxhash64(col("tok")), lit(nBuckets)))
    postings.write.mode("overwrite")
      .partitionBy("bucket").parquet(postingsPath(path))
    val p = readPostings(spark, path)
    p.groupBy(col("bucket"), col("tok")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").partitionBy("bucket").parquet(dfPath(path))
    // stats from the postings' per-doc dl (first row per doc); n_docs from
    // the corpus so zero-token docs still count toward N like Bm25.scores
    val dlUdf = udf((t: String) => Kernels.tokenCount(t, Bm25.MinTokenLen))
    docs.select(dlUdf(lower(col("text"))).as("dl0"))
      .agg(lit(nBuckets).as("n_buckets"), count(lit(1)).as("n_docs"),
        sum(col("dl0")).as("sum_dl"))
      .coalesce(1).write.mode("overwrite").parquet(metaPath(path))
  }

  /** Batch-sized incremental append: the batch's postings land in their
    * hash-matched bucket directories, its df DELTA rows append alongside
    * the existing ones (readers sum per token), and one meta segment row
    * records the batch's n_docs/sum_dl contribution. One batch scan, no
    * read of existing postings. See the object scaladoc for the additive
    * argument and the new-doc_ids precondition.
    */
  def append(spark: SparkSession, path: String, newDocs: DataFrame,
             deltaPartitions: Int = 8): Unit =
      graft.sources.MutationGuard.withGuard(spark, path) {
    // the frozen modulus — appends must bucket with the layout's hash
    val nBuckets = spark.read.parquet(metaPath(path))
      .select(max(col("n_buckets"))).collect().head.getInt(0)
    val tokUdf = udf((t: String) => Kernels.tokenCounts(t, Bm25.MinTokenLen))
    // deltas COALESCE before the partitioned write: every input partition
    // writes a file into every bucket dir it touches, so an uncoalesced
    // batch fans into partitions × buckets small files per append — file
    // count, not bytes, is what degrades a store that appends daily (and
    // it dominated the measured append wall at 100×: 7.9 s → 3.0 s for a
    // 5k-doc batch with this bound, vs a 13.6 s full rebuild). 100 TB deployments size this to the
    // batch (files of ~128 MB per touched bucket).
    val postings = newDocs
      .select(col("doc_id"), tokUdf(lower(col("text"))).as("m"))
      .select(col("doc_id"),
        aggregate(map_values(col("m")), lit(0L), (a, x) => a + x).as("dl"),
        explode(col("m")).as(Seq("tok", "tf")))
      .withColumn("bucket", pmod(xxhash64(col("tok")), lit(nBuckets)))
      .coalesce(deltaPartitions)
      .persist()
    try {
      postings.write.mode("append")
        .partitionBy("bucket").parquet(postingsPath(path))
      postings.groupBy(col("bucket"), col("tok")).agg(count(lit(1)).as("df"))
        .coalesce(deltaPartitions)
        .write.mode("append").partitionBy("bucket").parquet(dfPath(path))
    } finally postings.unpersist(): Unit
    val dlUdf = udf((t: String) => Kernels.tokenCount(t, Bm25.MinTokenLen))
    newDocs.select(dlUdf(lower(col("text"))).as("dl0"))
      .agg(lit(nBuckets).as("n_buckets"), count(lit(1)).as("n_docs"),
        sum(col("dl0")).as("sum_dl"))
      .coalesce(1).write.mode("append").parquet(metaPath(path))
  }

  /** INDEX-SIZED compaction — the third lifecycle verb (create = corpus
    * scan, append = batch scan, compact = index scan, NO corpus access):
    * rewrites each relation to one segment — postings re-clustered to ~one
    * file per bucket dir (appends accumulate a file per touched bucket per
    * batch; file count is the store-health axis), df segments merged per
    * (bucket, token) so readers' query-time segment-sum sees one row
    * again, meta collapsed to a single row. Each relation writes to a
    * `_compact` sibling first and swaps in via delete+rename
    * ([[graft.sources.SwapDir]] — see its single-mutating-writer contract:
    * an append racing a compact loses its files), so reads stay consistent
    * until the swap; a crash mid-swap leaves a rebuildable store (the
    * object scaladoc's manifest-free contract — the index is a derived
    * artifact). Query answers are bit-identical before and after
    * (spec-gated).
    */
  def compact(spark: SparkSession, path: String): Unit =
      graft.sources.MutationGuard.withGuard(spark, path) {
    def swap(dir: String)(write: String => Unit): Unit =
      graft.sources.SwapDir(spark, dir)(write)
    swap(postingsPath(path)) { tmp =>
      // hash-cluster by bucket so each task owns whole buckets -> ~one
      // file per bucket dir (an index-sized exchange, the compaction bill)
      readPostings(spark, path)
        .repartition(col("bucket"))
        .write.partitionBy("bucket").parquet(tmp)
    }
    swap(dfPath(path)) { tmp =>
      readDf(spark, path)
        .groupBy(col("bucket"), col("tok")).agg(sum(col("df")).as("df"))
        .repartition(col("bucket"))
        .write.partitionBy("bucket").parquet(tmp)
    }
    swap(metaPath(path)) { tmp =>
      meta(spark, path).coalesce(1).write.parquet(tmp)
    }
  }

  /** Segment-count TRIGGER STATISTIC for [[compact]] — the store-health
    * axis the object scaladoc names (appends accumulate a postings file
    * per touched bucket per batch and a df/meta segment row per batch;
    * readers merge segments at query time, so per-query work grows
    * linearly in segments until a compact): per-bucket postings FILE
    * counts from one directory listing — no data read — plus the meta
    * segment count (one tiny scalar relation, one row per
    * create/append). `meanFilesPerBucket` ≈ appends since the last
    * compact + 1; DEDUP_TUNING §5.1 documents the threshold
    * (mean ≥ ~8 → compact). A fresh or just-compacted store reads ~1
    * file per bucket.
    */
  final case class SegmentStat(buckets: Long, postingsFiles: Long,
      maxFilesPerBucket: Long, meanFilesPerBucket: Double,
      metaSegments: Long)

  def segmentStat(spark: SparkSession, path: String): SegmentStat = {
    val p = new org.apache.hadoop.fs.Path(postingsPath(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val perBucket: Seq[Long] =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
        .map(d => fs.listStatus(d.getPath)
          .count(f => f.isFile && f.getPath.getName.startsWith("part-")).toLong)
    val files = perBucket.sum
    val nb = perBucket.size.toLong
    // raw segment ROWS (one per create/append) — meta() would aggregate
    // them to its one-row broadcast frame. A health stat must describe a
    // broken store, not crash on it: a meta dir with no parquet yet
    // (crash between mkdir and commit) reads as 0 segments, not an
    // unable-to-infer-schema failure
    val mp = new org.apache.hadoop.fs.Path(metaPath(path))
    val metaSegments =
      if (!fs.exists(mp)) 0L
      else
        try spark.read.parquet(metaPath(path)).count()
        catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    SegmentStat(nb, files,
      if (perBucket.isEmpty) 0L else perBucket.max,
      if (nb == 0L) 0.0 else files.toDouble / nb,
      metaSegments)
  }

  /** (n_buckets, n_docs, sum_dl) as a one-row broadcastable frame —
    * n_docs/sum_dl summed over the create + append segment rows (a
    * single-segment store reads back exactly what create wrote).
    */
  def meta(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(metaPath(path))
      .agg(max(col("n_buckets")).as("n_buckets"),
        sum(col("n_docs")).cast(org.apache.spark.sql.types.LongType).as("n_docs"),
        sum(col("sum_dl")).cast(org.apache.spark.sql.types.LongType).as("sum_dl"))

  /** Top-k per query, answered from the index alone — bit-identical to
    * [[Bm25.topK]] over the corpus the store was built from.
    */
  def query(spark: SparkSession, path: String,
            queries: Seq[(Int, String)], k: Int,
            rankBuckets: Int = 32): DataFrame = {
    import spark.implicits._
    val m = meta(spark, path).collect().head
    val nBuckets = m.getInt(0)
    val qterms = Bm25.queryTerms(queries)
    val termSet = qterms.map(_._2).distinct.sorted
    // term → bucket through Spark's own xxhash64: parity with the writer
    val termBuckets = termSet.toDF("tok")
      .select(pmod(xxhash64(col("tok")), lit(nBuckets)).as("b"))
      .distinct().as[Long].collect().toSeq
    def pruned(base: DataFrame): DataFrame = base
      .filter(col("bucket").isin(termBuckets: _*) &&
        col("tok").isin(termSet: _*))
    val tf = pruned(readPostings(spark, path))
      .select(col("tok"), col("doc_id"), col("tf"), col("dl"))
    // segment-merge at query time: df rows are per-(segment, token)
    // deltas, summed here over the PRUNED buckets only — query-terms-sized
    // work, never an index-wide pass (one segment → sum of one row, the
    // pre-append value exactly)
    val dfRel = pruned(readDf(spark, path))
      .groupBy(col("tok")).agg(sum(col("df")).as("df"))
    val stats = meta(spark, path).select(col("n_docs"), col("sum_dl"))
    val qRel = qterms.toDF("query_id", "tok")
    val scored = tf
      .join(broadcast(dfRel), "tok")
      .join(broadcast(qRel), "tok")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), Bm25.contribution.as("c"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("score_scaled"))
    Bm25.rankTopK(scored, k, rankBuckets)
  }
}
