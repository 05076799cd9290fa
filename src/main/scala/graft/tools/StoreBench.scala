package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Index-vs-scan micro-bench for the three persisted index lifecycles
  * (AnnStore / Bm25Store / IvfStore): build each store once at the given
  * SF, then time the STORE query path against the equivalent transient
  * (scan-per-call) path — the steady-state accounting the stores exist
  * for. Emits one compact JSON line; stamps loadavg (numbers from a
  * loaded box are noise — discard, re-run quiet).
  *
  * Usage: runMain graft.tools.StoreBench [sfDir] [runs]
  */
object StoreBench {

  private def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val load0 = loadAvg()
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 3
    // optional 3rd arg: replica factor — generate (once) and bench the
    // ScaleProbe-scaled corpus instead, where the bytes-not-read ratio is
    // visible above parquet footer overhead
    val factor = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators._
    val benchDir = if (factor <= 1) sfDir else {
      val dir = s"/tmp/graft_storebench_${factor}x"
      if (!new java.io.File(s"$dir/embeddings.parquet/_SUCCESS").exists())
        ScaleProbe.generate(spark, sfDir, dir, factor)
      dir
    }

    // task-level input-bytes accounting: the pruning win is BYTES NOT
    // READ, which local wall at a 2 MB SF cannot show (per-file open
    // overhead dominates there)
    val bytesRead = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
      })
    def bytesOf(f: => org.apache.spark.sql.DataFrame): Long = {
      bytesRead.set(0L)
      f.collect()
      Thread.sleep(600) // listener bus drain
      bytesRead.get()
    }

    val root = java.nio.file.Files.createTempDirectory("storebench").toFile
    root.deleteOnExit()
    def p(name: String) = s"${root.getAbsolutePath}/$name"

    // force full materialization: count() alone can prune joins
    def timed(f: => org.apache.spark.sql.DataFrame): Double = {
      val samples = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        f.collect()
        (System.nanoTime() - t0) / 1e9
      }
      samples.sorted.apply(runs / 2)
    }

    // NOT cached: the comparison is store-read vs corpus-scan, both from
    // storage — caching the corpus would hand the transient side an
    // in-memory copy the 100 TB case does not have
    val docs = graft.queries.Tables.documents(spark, benchDir)
    val emb = graft.queries.Tables.embeddings(spark, benchDir)
    val queries = emb.filter(col("vec_id").isin(1L, 2L, 3L))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe")).cache()
    queries.count()
    val bm25Queries = graft.queries.CurationOps.Bm25QuerySet

    // ---- build (timed once: the amortized side of the accounting)
    def buildTimed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val bm25Build = buildTimed(Bm25Store.create(spark, p("bm25"), docs))
    val annBuild = buildTimed(AnnStore.create(spark, p("ann"), emb))
    val ivfCents = Similarity.kmeansCentroids(emb, 16, 2)
    val ivfBuild = buildTimed(IvfStore.create(spark, p("ivf"), emb, nlist = 16))

    // ---- append vs rebuild (the daily-ingest accounting): base = ~99%,
    // batch = ~1%. The rebuild cost IS the full-corpus build above; the
    // append row is what a store pays per ingest batch instead. Each
    // append store is created from the base slice first (untimed — that
    // build is the amortized one-off).
    // the batch slices are MATERIALIZED first and read back: a production
    // ingest batch arrives as its own (batch-sized) files — deriving it
    // lazily from the corpus would charge every append action a full
    // corpus scan and drown the batch-sized claim in harness artifact
    docs.filter(col("doc_id") % 100 === 0)
      .write.mode("overwrite").parquet(p("docbatch"))
    val docBatch = spark.read.parquet(p("docbatch"))
    val docBase = docs.filter(col("doc_id") % 100 =!= 0)
    Bm25Store.create(spark, p("bm25i"), docBase)
    val bm25Append = buildTimed(Bm25Store.append(spark, p("bm25i"), docBatch))
    emb.filter(col("vec_id") % 100 === 0)
      .write.mode("overwrite").parquet(p("embbatch"))
    val embBatch = spark.read.parquet(p("embbatch"))
    val embBase = emb.filter(col("vec_id") % 100 =!= 0)
    IvfStore.create(spark, p("ivfi"), embBase, nlist = 16)
    val ivfAppend = buildTimed(IvfStore.append(spark, p("ivfi"), embBatch))
    AnnStore.create(spark, p("anni"), embBase)
    val annAppend = buildTimed(AnnStore.append(spark, p("anni"), embBatch))
    // compaction (the third lifecycle verb): index-sized, no corpus scan —
    // run on the stores that just absorbed an append
    val bm25Compact = buildTimed(Bm25Store.compact(spark, p("bm25i")))
    val ivfCompact = buildTimed(IvfStore.compact(spark, p("ivfi")))

    // ---- query: store vs transient
    val bm25Store = timed(Bm25Store.query(spark, p("bm25"), bm25Queries, k = 10))
    val bm25Scan = timed(Bm25.topK(docs, bm25Queries, k = 10))
    val annStore = timed(AnnStore.search(spark, p("ann"), emb, queries, k = 10))
    val annScan = timed(Pq.pqTopKRefined(emb, queries, k = 10))
    val ivfStore = timed(IvfStore.search(spark, p("ivf"), queries, k = 10, nprobe = 4))
    val ivfScan = timed(Similarity.ivfTopKWithCentroids(emb, queries, k = 10, ivfCents, nprobe = 4))
    // the x94b end-to-end claim: the HYBRID query (BM25 + exact vector
    // RRF) served from the index vs re-running the transient chain — the
    // vector side is identical in both, so the delta is pure index win
    def hybrid(bm: org.apache.spark.sql.DataFrame) =
      graft.queries.CurationOps.hybridRrf(spark, benchDir, bm)
    val hybStore = timed(hybrid(
      Bm25Store.query(spark, p("bm25"), bm25Queries, k = 10)))
    val hybScan = timed(hybrid(
      Bm25.topK(docs, bm25Queries, k = 10)))
    val bm25StoreB = bytesOf(Bm25Store.query(spark, p("bm25"), bm25Queries, k = 10))
    val bm25ScanB = bytesOf(Bm25.topK(docs, bm25Queries, k = 10))
    val annStoreB = bytesOf(AnnStore.search(spark, p("ann"), emb, queries, k = 10))
    val annScanB = bytesOf(Pq.pqTopKRefined(emb, queries, k = 10))
    val ivfStoreB = bytesOf(IvfStore.search(spark, p("ivf"), queries, k = 10, nprobe = 4))
    val ivfScanB = bytesOf(Similarity.ivfTopKWithCentroids(emb, queries, k = 10, ivfCents, nprobe = 4))

    val json =
      f"""{"metric":"storebench","sf":"$benchDir","runs":$runs,""" +
      f""""bm25":{"build":$bm25Build%.3f,"store_query":$bm25Store%.3f,"scan_query":$bm25Scan%.3f,"store_bytes":$bm25StoreB,"scan_bytes":$bm25ScanB},""" +
      f""""hybrid_rrf":{"store_query":$hybStore%.3f,"scan_query":$hybScan%.3f},""" +
      f""""ann_pq":{"build":$annBuild%.3f,"store_query":$annStore%.3f,"scan_query":$annScan%.3f,"store_bytes":$annStoreB,"scan_bytes":$annScanB},""" +
      f""""ivf":{"build":$ivfBuild%.3f,"store_query":$ivfStore%.3f,"scan_query":$ivfScan%.3f,"store_bytes":$ivfStoreB,"scan_bytes":$ivfScanB},""" +
      f""""append_1pct":{"bm25_append":$bm25Append%.3f,"bm25_rebuild":$bm25Build%.3f,"ivf_append":$ivfAppend%.3f,"ivf_rebuild":$ivfBuild%.3f,"ann_append":$annAppend%.3f,"ann_rebuild":$annBuild%.3f,"bm25_compact":$bm25Compact%.3f,"ivf_compact":$ivfCompact%.3f},""" +
      f""""load_start":$load0%.2f,"load_end":${loadAvg()}%.2f}"""
    println(json)
    spark.stop()
  }
}
