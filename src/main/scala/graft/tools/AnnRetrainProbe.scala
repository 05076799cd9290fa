package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Codebook-drift accounting for [[graft.operators.AnnStore
  * .retrainCodebooks]] — the measurement behind its BASELINE row, and
  * [[RebalanceProbe]]'s PQ-level sibling.
  *
  * The drift scenario the verb exists for: codebooks are TRAINED and
  * frozen on a base corpus, then sustained appends land in a directional
  * cap the fit never saw ([[RebalanceProbe]]'s drift device — a ~19° cap
  * around an alternating-sign unit direction, shifted per growth slice).
  * append() encodes the drift against the stale codebooks, so its
  * vectors quantize into the few codewords nearest the cap: per-subspace
  * code-occupancy entropy drops ([[graft.operators.AnnStore.skewStat]] —
  * the no-data-read trigger) and ADC shortlist recall for drift-region
  * queries decays.
  *
  * Measured, per phase (frozen codebooks / after retrain):
  *   - skewStat's min/mean occupancy-entropy ratio (the §5.1 trigger),
  *   - search wall (median of 3) + recall@10 vs exact brute force for a
  *     16-query drift-region panel,
  *   - the verb's wall vs a from-scratch create() on the grown corpus
  *     (the alternative it replaces — retrain should cost the same;
  *     what it saves is knowing the original training parameters), and
  *   - the store/transient equivalence gate re-checked at scale:
  *     store search ≡ Pq.pqTopKRefined with the retrained parameters.
  *
  * Usage: runMain graft.tools.AnnRetrainProbe [sfDir] [growFactor]
  * Numbers from a loaded box are noise — loadavg is stamped; re-run quiet.
  */
object AnnRetrainProbe {

  private def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val load0 = loadAvg()
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val growFactor = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("ann-retrain-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{AnnStore, Pq, Similarity}

    val root = java.nio.file.Files.createTempDirectory("annretrain").toFile
    root.deleteOnExit()
    val path = s"${root.getAbsolutePath}/ann"

    val emb = graft.queries.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val n0 = emb.count()

    val M = 16; val Ksub = 32; val Iters = 4; val Sample = 512
    val tBuild = timed1 {
      AnnStore.create(spark, path, emb, dim = 64, m = M, ksub = Ksub,
        iters = Iters, sampleSize = Sample): Unit
    }

    // RebalanceProbe's drift device: per growth unit a ~19° directional
    // cap (atan 0.35) around an alternating-sign unit direction the base
    // fit never saw, shifted per copy so the caps differ
    val invSqrtD = 0.125 // 1/sqrt(64)
    val drift = (0 until growFactor).map { i =>
      emb.select((col("vec_id") + lit(50000000L * (i + 1))).as("vec_id"),
        expr(s"transform(embedding, (v, j) -> CAST(" +
          s"IF((j + $i) % 2 = 0, $invSqrtD, -$invSqrtD) + 0.35 * v AS FLOAT))")
          .as("embedding"))
    }.reduce(_ unionAll _)
    drift.write.mode("overwrite").parquet(s"${root.getAbsolutePath}/drift")
    val driftRead = spark.read.parquet(s"${root.getAbsolutePath}/drift")
    val tAppend = timed1 { AnnStore.append(spark, path, driftRead) }

    val grown = emb.union(driftRead.select(col("vec_id"), col("embedding")))
      .persist()
    grown.count(): Unit

    // drift-region query panel: 16 drift vectors, ids outside the store's
    // id space (Similarity.rank drops vec_id == query_id)
    val queries = driftRead
      .orderBy(xxhash64(col("vec_id")).asc, col("vec_id").asc).limit(16)
      .select((col("vec_id") + 900000000L).as("query_id"),
        col("embedding").as("qe"))
      .cache()
    queries.count(): Unit
    val exact = topSets(Similarity.bruteForceTopK(grown, queries, 10))

    def phase(): (Double, Double, Double, Double) = {
      val (minH, meanH, _) = AnnStore.skewStat(spark, path)
      val wall = timedMedian3 {
        AnnStore.search(spark, path, grown, queries, k = 10).collect()
      }
      val rec = recallOf(
        topSets(AnnStore.search(spark, path, grown, queries, k = 10)), exact)
      (minH, meanH, wall, rec)
    }

    val (minHB, meanHB, wallB, recB) = phase()

    val tRetrain = timed1 {
      AnnStore.retrainCodebooks(spark, path, grown,
        iters = Iters, sampleSize = Sample): Unit
    }
    val (minHA, meanHA, wallA, recA) = phase()

    // equivalence gate at scale: store ≡ transient on the retrained
    // parameters (same deterministic sample → same codebooks)
    val gotA = pairs(AnnStore.search(spark, path, grown, queries, k = 10))
    val transient = pairs(Pq.pqTopKRefined(grown, queries, k = 10,
      m = M, ksub = Ksub, iters = Iters, sampleSize = Sample))
    val equiv = gotA == transient
    assert(equiv, "retrained store search != transient PQ on same params")

    // the alternative retrain replaces: a from-scratch create() on the
    // grown corpus (same bill, but requires re-supplying the parameters)
    val tRebuild = timed1 {
      AnnStore.create(spark, s"${root.getAbsolutePath}/rebuilt", grown,
        dim = 64, m = M, ksub = Ksub, iters = Iters, sampleSize = Sample): Unit
    }

    println(
      f"""{"metric":"ann_retrain_probe","sf":"$sfDir","n_base":$n0,"grow_factor":$growFactor,""" +
      f""""build_s":$tBuild%.2f,"append_s":$tAppend%.2f,""" +
      f""""before":{"min_entropy":$minHB%.4f,"mean_entropy":$meanHB%.4f,"search_s":$wallB%.2f,"recall10":$recB%.4f},""" +
      f""""retrain_s":$tRetrain%.2f,"rebuild_s":$tRebuild%.2f,""" +
      f""""after":{"min_entropy":$minHA%.4f,"mean_entropy":$meanHA%.4f,"search_s":$wallA%.2f,"recall10":$recA%.4f},""" +
      f""""store_equiv_transient":$equiv,"load_start":$load0%.2f,"load_end":${loadAvg()}%.2f}""")
    spark.stop()
  }

  private def timed1(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def timedMedian3(f: => Unit): Double = {
    val xs = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    xs.sorted.apply(1)
  }

  private def topSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recallOf(got: Map[Long, Set[Long]],
                       exact: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, ex) =>
      if (ex.isEmpty) 1.0
      else (got.getOrElse(q, Set.empty) & ex).size.toDouble / ex.size
    }
    if (per.isEmpty) 1.0 else per.sum / per.size
  }
}
