package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end MULTIMODAL rehearsal — the payload-axis twin of
  * [[PipelineRehearsal]] (whose text-side shakedown caught two
  * composition-only bugs): the composed multimodal dedup pipeline run
  * ONCE over a scaled corpus as materialized stages, exactly the
  * checkpoint-between-jobs shape a 100 TB run has:
  *
  *  1. ingest   — synthetic media + re-encoded variants, written to
  *     parquet (the binary payload column through a real sink/scan).
  *  2. identity — x103 payload dHash → x104b linear dup edges → x110
  *     components → one representative per identity cluster (the
  *     AudioPipelineProbe posture, all kinds).
  *  3. cluster-aware matchers (the round-15 composed defaults, per-axis;
  *     capped production forms) — x108 frame-overlap over one member per
  *     DISTINCT frame set per component
  *     ([[graft.operators.Multimodal.componentSetRepresentatives]]) and
  *     x112 landmark votes over the per-component tuple-level union
  *     ([[graft.operators.Multimodal.componentFingerprintUnion]]): the
  *     partial-match layer where identity cannot answer, with absorbed
  *     divergent members still matchable.
  *  4. resolve + summary — identity components ∪ both matcher pair
  *     relations → global components → final keepers; per-kind summary
  *     written as the artifact.
  *
  * Cross-modal gate: for every re-encoded variant, the FINAL resolution
  * must place it with its original — reported per kind, hard-gated
  * >= [[MinComposedRecall]] per kind (the composed contract; per-stage
  * gates live in AudioProbe/VideoProbe/PhashProbe).
  *
  * Usage: runMain graft.tools.MultimodalRehearsal [dir] [workDir]
  * (defaults: /tmp/graft_scale10 /tmp/graft_mm_rehearsal)
  */
object MultimodalRehearsal {

  def MinComposedRecall: Double =
    sys.env.getOrElse("MM_MIN_RECALL", "0.95").toDouble

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale10")
    val work = args.lift(1).getOrElse("/tmp/graft_mm_rehearsal")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("multimodal-rehearsal").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[mm-rehearsal] loadavg ${graft.Bench.loadAvg()} corpus=$dir")
    import graft.operators.{Components, Multimodal}

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mm-rehearsal] $name%-10s wall=${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // ---- stage 1: ingest (payload column through a real parquet sink)
    val mediaPath = s"$work/media"
    timed("ingest") {
      Multimodal.withReencodedVariants(
          Multimodal.syntheticMedia(graft.queries.Tables.documents(spark, dir)))
        .write.mode("overwrite").parquet(mediaPath)
    }
    val media = spark.read.parquet(mediaPath)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nMedia = media.count()

    // ---- stage 2: identity grouping over EVERY kind
    val comp = timed("identity") {
      val edges = Multimodal.payloadDupEdges(media, maxPerBucket = 64)
        .select(col("media_a").as("doc_a"), col("media_b").as("doc_b"))
      val c = Components.connectedComponents(edges)
        .select(col("node").as("media_id"), col("component"))
      c.write.mode("overwrite").parquet(s"$work/identity_components")
      spark.read.parquet(s"$work/identity_components")
    }
    val repOf = media.select(col("media_id"), col("kind"))
      .join(comp, Seq("media_id"), "left")
      .select(col("media_id"), col("kind"),
        coalesce(col("component"), col("media_id")).as("rep"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nResidual =
      repOf.filter(col("media_id") === col("rep")).count()

    // ---- stage 3: matchers over one member per DISTINCT fingerprint
    // set per component (the round-15 composed default —
    // Multimodal.componentSetRepresentatives): absorbed members with
    // divergent sets stay matchable as themselves — the round-14
    // residual form lost every partial-overlap pair anchored on one
    // (PartialOverlapProbe: video full-panel 0.588 at 100×) — while
    // true replicas collapse to one probe row; member-level pairs feed
    // stage 4's components, where the identity edges subsume the roll-up
    val vPairs = timed("video") {
      val p = Multimodal.videoNearDups(
        Multimodal.componentSetRepresentatives(
          Multimodal.frameFingerprints(media), comp), maxPerHash = 64)
        .select(col("media_a"), col("media_b"))
      p.write.mode("overwrite").parquet(s"$work/video_pairs")
      spark.read.parquet(s"$work/video_pairs")
    }
    val aPairs = timed("audio") {
      // AUDIO takes the tuple-level union (votes are intersection-based;
      // per-member inputs saturate the landmark space — helper scaladocs)
      // cap 256 at the composed layer: union buckets are component-
      // granular but still clique-sized at scale (PartialOverlapProbe:
      // 0.9966 vs 0.9899 at 128, 100×)
      val p = Multimodal.audioNearDups(
        Multimodal.componentFingerprintUnion(
          Multimodal.audioFingerprints(media, window = 32, triples = true),
          comp), maxPerHash = 256)
        .select(col("media_a"), col("media_b"))
      p.write.mode("overwrite").parquet(s"$work/audio_pairs")
      spark.read.parquet(s"$work/audio_pairs")
    }

    // ---- stage 4: global resolution + per-kind summary artifact
    val summary = timed("resolve") {
      val allEdges = comp
        .select(col("media_id").as("doc_a"), col("component").as("doc_b"))
        .unionByName(vPairs.select(col("media_a").as("doc_a"),
          col("media_b").as("doc_b")))
        .unionByName(aPairs.select(col("media_a").as("doc_a"),
          col("media_b").as("doc_b")))
      val finalComp = Components.connectedComponents(allEdges)
        .select(col("node").as("media_id"), col("component"))
      val finalRep = media.select(col("media_id"), col("kind"))
        .join(finalComp, Seq("media_id"), "left")
        .select(col("media_id"), col("kind"),
          coalesce(col("component"), col("media_id")).as("rep"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val s = finalRep.groupBy(col("kind")).agg(
        count(lit(1)).as("n_media"),
        sum(when(col("media_id") =!= col("rep"), 1L).otherwise(0L))
          .as("n_dup_members"),
        countDistinct(col("rep")).as("n_keepers"))
      s.write.mode("overwrite").parquet(s"$work/summary")
      // cross-modal composed gate: every variant resolves WITH its
      // original (variant id = original + 10^7 within each replica)
      val reps = finalRep.select(col("media_id"), col("kind"), col("rep"))
      val variants = reps
        .filter(pmod(col("media_id"), lit(1000000000L)) >= 10000000L)
        .select(col("media_id").as("vid"), col("kind"), col("rep").as("rv"))
        .join(reps.select((col("media_id") + lit(10000000L)).as("vid"),
          col("rep").as("ro")), "vid")
      val byKind = variants.groupBy(col("kind")).agg(
        count(lit(1)).as("n"),
        sum(when(col("rv") === col("ro"), 1L).otherwise(0L)).as("hits"))
        .collect()
      byKind.foreach { r =>
        val (kind, n, hits) =
          (r.getString(0), r.getLong(1), r.getLong(2))
        val rec = if (n == 0) 1.0 else hits.toDouble / n
        println(f"[mm-rehearsal] composed recall $kind%-6s $rec%.4f ($hits/$n)")
        assert(rec >= MinComposedRecall,
          f"COMPOSED $kind RECALL GATE FAILED: $rec%.4f < $MinComposedRecall")
      }
      finalRep.unpersist()
      s
    }
    println(s"[mm-rehearsal] corpus=$nMedia residual=$nResidual " +
      s"video_pairs=${vPairs.count()} audio_pairs=${aPairs.count()}")
    summary.orderBy("kind").collect().foreach { r =>
      println(s"[mm-rehearsal] summary kind=${r.getString(0)} " +
        s"n_media=${r.getLong(1)} n_dup_members=${r.getLong(2)} " +
        s"n_keepers=${r.getLong(3)}")
    }
    spark.stop()
  }
}
