package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cross-scale probe for the video frame-overlap axis (x107/x108) — the
  * video sibling of [[AudioProbe]]: frame fingerprinting is map-only (~F
  * expected), the matcher's per-hash pair generation grows with frame-hash
  * bucket occupancy, and the production form is the CAPPED one
  * (`maxPerHash`, unbiased, conservative — spec-gated in MultimodalSpec).
  * Per factor this records:
  *
  *  - distinct (video, frame-hash) rows + extraction wall (expect ~F),
  *  - capped-matcher wall + surviving pair count + counted drops,
  *  - RECALL: the fraction of re-encoded variant videos PAIRED with
  *    their original above the Jaccard cut (dHash absorbs the re-encode
  *    level shift, so only the one artifact-crossing frame differs —
  *    Jaccard (k−1)/(k+1) stays over the 0.5 cut for k ≥ 3 sampled
  *    frames). Pair-EXISTS, not top-match, is the dedup-relevant
  *    property: the pairs feed Components, where any edge suffices — and
  *    on this corpus a top-match criterion is confounded by design (the
  *    engineered near-dup DOCUMENTS yield frame-identical videos at
  *    Jaccard 1.0, legitimately outscoring a variant's (k−1)/(k+1);
  *    measured: top-match 0.771 vs pair-exists recall at the same cut).
  *    HARD-FAILS below `MinRecall` on the BASE corpus only (scaled
  *    corpora measure the same ~31-word clique confound as the audio
  *    rows — BASELINE round-12 density progression — and are REPORTED).
  *
  * Usage: runMain graft.tools.VideoProbe [dirs...]
  * (defaults: /root/testdata/sf0.1 /tmp/graft_scale10 /tmp/graft_scale100)
  */
object VideoProbe {

  def MinRecall: Double =
    sys.env.getOrElse("VIDEO_MIN_RECALL", "0.95").toDouble

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_scale10",
        "/tmp/graft_scale100")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("video-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[video-probe] loadavg ${graft.Bench.loadAvg()}")
    for (d <- dirs) {
      val media = graft.operators.Multimodal.withReencodedVariants(
        graft.operators.Multimodal.syntheticMedia(
          graft.queries.Tables.documents(spark, d)))
      val t0 = System.nanoTime()
      val frames = graft.operators.Multimodal.frameFingerprints(media)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nFrames = frames.count()
      val wallFp = (System.nanoTime() - t0) / 1e9
      val occ = frames.groupBy("phash").count()
        .agg(max("count"), avg("count")).collect()(0)
      val acc = spark.sparkContext.longAccumulator("videoDrops")
      val t1 = System.nanoTime()
      val pairs = graft.operators.Multimodal.videoNearDups(
        frames, maxPerHash = 64, droppedAcc = Some(acc))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nPairs = pairs.count()
      val wallMatch = (System.nanoTime() - t1) / 1e9
      // recall: variant videos PAIRED with their original above the cut
      // (pair-exists — see the scaladoc; variant id = original + 10^7
      // per replica)
      val hitRows = pairs
        .filter(col("media_b") - col("media_a") === 10000000L)
        .select(col("media_b").as("vid")).distinct()
      // material floor: originals with < MinMatchableFrames distinct
      // frames cannot stay over the Jaccard cut after the artifact frame
      // ((k−1)/(k+1) < 0.5 for k < 3) — documented, like the audio floor
      val counts = frames.groupBy("media_id").count()
      val variants = media.filter(col("kind") === "video")
        .filter(pmod(col("media_id"), lit(1000000000L)) >= 10000000L)
        .select(col("media_id").as("vid"))
        .join(counts.select((col("media_id") + lit(10000000L)).as("vid"),
          col("count").as("_k")), "vid")
        .filter(col("_k") >=
          graft.operators.Multimodal.Kernels.MinMatchableFrames)
        .select("vid")
      val total = variants.count()
      val hits = variants.join(hitRows, "vid").count()
      val recall = if (total == 0) 0.0 else hits.toDouble / total
      println(f"VIDEO $d cap=64 frame_rows=$nFrames wall_fp=$wallFp%.2f s " +
        f"max_bucket=${occ.getLong(0)} avg_bucket=${occ.getDouble(1)}%.1f " +
        f"pairs=$nPairs dropped=${acc.value} wall_match=$wallMatch%.2f s " +
        f"variant_recall=$recall%.4f ($hits/$total)")
      if (d == dirs.head) assert(recall >= MinRecall,
        f"VIDEO RECALL GATE FAILED at $d: $recall%.4f < $MinRecall")
      frames.unpersist(); pairs.unpersist(); ()

      // x116 scale contract (the x113 device for the video axis): probe
      // cost must be BATCH-sized — a FIXED base-corpus batch probed
      // against this dir's (growing) persisted FrameHistory store. Wall
      // should stay ~flat as the history grows 1× → 100×.
      {
        import graft.queries.VectorOps
        graft.sources.MutationGuard.clear(spark, graft.sources.Bucketing
          .guardBase(spark, graft.sources.FrameHistory.tableFor(d)))
        graft.sources.FrameHistory.create(spark, d,
          graft.operators.Multimodal.frameFingerprints(
            VectorOps.x109Media(spark, d)))
        val (hf, hs) = graft.sources.FrameHistory.scanOrCompute(spark, d)(
          sys.error("unreachable"))
        val baseDir = dirs.head
        val batchFrames = graft.operators.Multimodal.frameFingerprints(
          VectorOps.x109Media(spark, baseDir)
            .filter(!VectorOps.x109IsOriginal ||
              VectorOps.x109MediaBucket >= 60))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        batchFrames.count()
        val t2 = System.nanoTime()
        val nProbe = graft.operators.Multimodal
          .incrementalVideoNearDups(batchFrames, hf, hs).count()
        val wallProbe = (System.nanoTime() - t2) / 1e9
        println(f"VIDEO-X116 $d fixed_batch=$baseDir " +
          f"probe_rows=$nProbe wall_probe=$wallProbe%.2f s")
        batchFrames.unpersist()
        graft.sources.FrameHistory.invalidate(spark, d)
      }
    }
    spark.stop()
  }
}
