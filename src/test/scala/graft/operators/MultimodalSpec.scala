package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.Tables

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(Tables.documents(spark, Sf)).cache()

  test("synthetic media has the declared multimodal schema") {
    val f = media.schema
    assert(f("content").dataType.typeName == "binary")
    assert(f("meta").dataType.typeName == "struct")
    assert(media.count() == 500)
    val kinds = media.select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction: one deterministic fixed-dim vector per row, no binary in output") {
    val feats = Multimodal.extractFeatures(media, batchSize = 32)
    assert(feats.count() == 500)
    assert(!feats.schema.fields.exists(_.dataType.typeName == "binary"),
      "binary payload leaked into the feature output")
    val rows = feats.orderBy("media_id").limit(5).collect()
    rows.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("feature")
      assert(v.length == Multimodal.Kernels.FeatureDim)
      assert(math.abs(v.sum - 1.0f) < 1e-3, "histogram features must sum to ~1")
    }
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, batchSize = 7)
      .orderBy("media_id").limit(5).collect()
    assert(rows.zip(again).forall { case (a, b) =>
      a.getAs[scala.collection.Seq[Float]]("feature") == b.getAs[scala.collection.Seq[Float]]("feature")
    }, "batch size must not change results")
  }

  test("resize rewrites image payload size and metadata, leaves audio/video alone") {
    val resized = Multimodal.resizeImages(media, 32, 8)
    val img = resized.filter(col("kind") === "image").limit(3).collect()
    img.foreach { r =>
      assert(r.getAs[Array[Byte]]("content").length == 32 * 8)
      val meta = r.getAs[org.apache.spark.sql.Row]("meta")
      assert(meta.getAs[Int]("width") == 32 && meta.getAs[Int]("height") == 8)
    }
    val audioBefore = media.filter(col("kind") === "audio")
      .select(length(col("content"))).as[Int].collect().sorted
    val audioAfter = resized.filter(col("kind") === "audio")
      .select(length(col("content"))).as[Int].collect().sorted
    assert(audioBefore.toSeq == audioAfter.toSeq)
  }

  test("frame sampling explodes video rows with stride") {
    val frames = Multimodal.sampleVideoFrames(media, stride = 2)
    assert(frames.columns.toSeq == Seq("media_id", "frame_no", "frame"))
    val perVideo = frames.groupBy("media_id").count()
    val expected = media.filter(col("kind") === "video")
      .select(col("media_id"), ((col("meta.nFrames") + 1) / 2).cast("long").as("want"))
    val joined = perVideo.join(expected, "media_id")
      .filter(col("count") =!= col("want"))
    assert(joined.count() == 0, "stride-2 sampling must emit ceil(nFrames/2) frames")
  }

  // ------------------------------------------- payload perceptual dedup

  test("dHash64: deterministic, empty-safe, brightness-invariant") {
    val bytes = "the quick brown fox jumps over the lazy dog " * 8
    val a = Multimodal.Kernels.dHash64(bytes.getBytes("UTF-8"))
    assert(a == Multimodal.Kernels.dHash64(bytes.getBytes("UTF-8")))
    assert(Multimodal.Kernels.dHash64(null) == 0L)
    assert(Multimodal.Kernels.dHash64(Array.emptyByteArray) == 0L)
    // uniform brightness shift preserves every gradient → identical hash
    // (ASCII bytes never saturate at +7)
    val shifted = bytes.getBytes("UTF-8").map(b => (b + 7).toByte)
    assert(Multimodal.Kernels.dHash64(shifted) == a,
      "dHash must be invariant to a uniform non-saturating brightness shift")
  }

  test("stubReencode lands within Hamming 2 of the original payload") {
    val payloads = media.orderBy("media_id").limit(50)
      .select("content").as[Array[Byte]].collect()
    payloads.foreach { p =>
      val h0 = Multimodal.Kernels.dHash64(p)
      val h1 = Multimodal.Kernels.dHash64(Multimodal.Kernels.stubReencode(p))
      val d = java.lang.Long.bitCount(h0 ^ h1)
      assert(d <= 2, s"re-encoded variant at Hamming $d > 2")
    }
  }

  test("payloadNearDups equals the exhaustive all-pairs answer (pigeonhole completeness)") {
    val corpus = Multimodal.withReencodedVariants(
      media.filter(col("media_id") < 100), everyNth = 5)
    val banded = Multimodal.payloadNearDups(corpus, maxPerBucket = 0)
      .as[(Long, Long, Int)].collect().toSet
    val fp = Multimodal.payloadFingerprints(corpus)
      .as[(Long, Long)].collect()
    val exhaustive = (for {
      (ia, ha) <- fp; (ib, hb) <- fp if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(banded == exhaustive,
      s"banded=${banded.size} exhaustive=${exhaustive.size}")
    assert(exhaustive.nonEmpty, "fixture produced no near-dup pairs")
  }

  test("payload pairs feed the Components resolution chain") {
    val corpus = Multimodal.withReencodedVariants(media, everyNth = 10)
    val pairs = Multimodal.payloadNearDups(corpus, maxPerBucket = 0)
      .select(col("media_a").as("doc_a"), col("media_b").as("doc_b"))
    val comps = Components.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    // every variant resolves into the same component as its original
    val variantIds = corpus.filter(col("media_id") >= 10000000L)
      .select("media_id").as[Long].collect()
    assert(variantIds.nonEmpty)
    variantIds.foreach { v =>
      val orig = v - 10000000L
      assert(comps.contains(v) && comps.get(orig) == comps.get(v),
        s"variant $v not in its original's component")
    }
  }

  test("payloadDupEdges: same components as the full pair relation, linear edge count on cliques") {
    // clique fixture: every payload re-encoded, PLUS exact duplicates of
    // every 7th payload — identical fingerprints form multi-member groups
    val corpus = Multimodal.withReencodedVariants(media, everyNth = 2)
      .unionByName(media.filter(col("media_id") % 7 === 0)
        .withColumn("media_id", col("media_id") + lit(20000000L)))
    val pairs = Multimodal.payloadNearDups(corpus, maxPerBucket = 0)
      .select(col("media_a").as("doc_a"), col("media_b").as("doc_b")).cache()
    val edges = Multimodal.payloadDupEdges(corpus, maxPerBucket = 0)
      .select(col("media_a").as("doc_a"), col("media_b").as("doc_b")).cache()
    try {
      val compPairs = Components.connectedComponents(pairs)
        .as[(Long, Long)].collect().toMap
      val compEdges = Components.connectedComponents(edges)
        .as[(Long, Long)].collect().toMap
      assert(compPairs == compEdges,
        s"component disagreement: ${(compPairs.toSet diff compEdges.toSet).take(5)} / " +
          s"${(compEdges.toSet diff compPairs.toSet).take(5)}")
      // the edge relation must be at most pair-sized, and strictly smaller
      // as soon as any identical-fingerprint group has >= 3 members
      val (np, ne) = (pairs.count(), edges.count())
      assert(ne <= np, s"edges $ne > pairs $np")
      assert(ne < np, s"clique fixture produced no compression ($ne == $np)")
    } finally { pairs.unpersist(); edges.unpersist(); () }
  }

  test("payload near-dup plan never shuffles the binary column") {
    // AQE wraps the plan before execution; disable it so the exchanges are
    // visible statically (same device as the store-probe plan gates)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try Multimodal.payloadNearDups(media).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty, "expected at least the chunk-keyed exchange")
    exchanges.foreach { e =>
      // the capped-members aggregate legitimately ships its binary partial
      // BUFFER (16 B/member of ids+hashes); the gate is on the payload
      assert(!e.output.exists(_.name == "content"),
        s"binary payload crosses a shuffle: ${e.output.map(_.name)}")
    }
  }

  test("payloadDecontaminate flags exact and re-encoded benchmark leaks, distinct-counts matches") {
    import graft.operators.Multimodal.Kernels
    def ramp: Array[Byte] = Array.tabulate(600)(i => ((i / 3) % 200).toByte)
    def other: Array[Byte] = Array.tabulate(600)(i => ((i * 37 + 97) % 251).toByte)
    def novel: Array[Byte] = Array.tabulate(600)(i => ((i * i * 13 + 5) % 241).toByte)
    val bench = Seq((1L, ramp), (2L, other)).toDF("media_id", "content")
    val corpus = Seq(
      (10L, ramp),                       // exact leak of bench 1
      (11L, Kernels.stubReencode(ramp)), // re-encoded leak (d = 1)
      (12L, novel)                       // clean
    ).toDF("media_id", "content")
    val got = graft.operators.Multimodal.payloadDecontaminate(
        graft.operators.Multimodal.payloadFingerprints(corpus),
        graft.operators.Multimodal.payloadFingerprints(bench))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got(10L) == ((1L, 1)) && got(11L) == ((1L, 1)), got.toString)
    assert(got(12L) == ((0L, 0)), got.toString)
    // distinct-match semantics: two bench copies of one payload count 2
    // (distinct bench MEDIA, not distinct fingerprints)
    val bench2 = Seq((1L, ramp), (2L, ramp)).toDF("media_id", "content")
    val got2 = graft.operators.Multimodal.payloadDecontaminate(
        graft.operators.Multimodal.payloadFingerprints(
          Seq((10L, ramp)).toDF("media_id", "content")),
        graft.operators.Multimodal.payloadFingerprints(bench2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2(10L) == 2L, got2.toString)
  }

  // ------------------------------------------- video frame-level near-dup

  test("videoNearDups: variants above the overlap cut all pair with their originals") {
    val corpus = Multimodal.withReencodedVariants(media, everyNth = 10)
    val frames = Multimodal.frameFingerprints(corpus).cache()
    try {
      val pairs = Multimodal.videoNearDups(frames, maxPerHash = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getAs[Double]("jaccard"))).toSeq
      val local = frames.as[(Long, Long)].collect()
        .groupBy(_._1).map { case (id, hs) => id -> hs.map(_._2).toSet }
      // variants exist only for video media_ids divisible by 10
      val variantVideos = corpus
        .filter(col("media_id") >= 10000000L && col("kind") === "video")
        .select("media_id").as[Long].collect()
      assert(variantVideos.nonEmpty, "fixture produced no video variants")
      // a tiny video has only a handful of distinct frame hashes, so the
      // one-cell dropout can legitimately push its variant below the 0.5
      // cut (frame-set Jaccard is noisy for tiny sets — real video dedup
      // requires minimum frame counts for the same reason). The contract
      // is: exactly the variants whose TRUE overlap clears the cut pair.
      val aboveCut = variantVideos.filter { v =>
        val (a, b) = (local(v - 10000000L), local(v))
        val m = (a & b).size
        m.toDouble / (a.size + b.size - m) >= 0.5
      }
      assert(aboveCut.length * 2 >= variantVideos.length,
        "fixture degenerated: most variants fell below the overlap cut")
      aboveCut.foreach { v =>
        val hit = pairs.find(p => p._1 == v - 10000000L && p._2 == v)
        assert(hit.isDefined, s"variant video $v did not pair with its original")
        assert(hit.get._3 >= 0.5, s"pair $hit below the jaccard cut")
      }
      // pairs are ordered, deduplicated, and never self-referential
      assert(pairs.forall(p => p._1 < p._2))
      assert(pairs.map(p => (p._1, p._2)).distinct.size == pairs.size)
    } finally { frames.unpersist(); () }
  }

  test("videoNearDups matches a local reference computation exactly") {
    val corpus = Multimodal.withReencodedVariants(
      media.filter(col("media_id") < 200), everyNth = 5)
    val frames = Multimodal.frameFingerprints(corpus)
    val got = Multimodal.videoNearDups(frames, maxPerHash = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2), r.getAs[Double]("jaccard"))).toSet
    val local = frames.as[(Long, Long)].collect()
      .groupBy(_._1).map { case (id, hs) => id -> hs.map(_._2).toSet }
    val want = (for {
      (a, ha) <- local; (b, hb) <- local if a < b
      m = (ha & hb).size if m > 0
      j = m.toDouble / (ha.size + hb.size - m) if j >= 0.5
    } yield (a, b, m, math.rint(j * 10000) / 10000)).toSet
    assert(got == want, s"got-only: ${got -- want}; want-only: ${want -- got}")
    assert(want.nonEmpty, "fixture produced no video near-dup pairs")
  }

  test("videoNearDups cap is conservative: capped pairs are a subset, drops are counted") {
    val corpus = Multimodal.withReencodedVariants(media, everyNth = 10)
    val frames = Multimodal.frameFingerprints(corpus).cache()
    try {
      val exact = Multimodal.videoNearDups(frames, maxPerHash = 0)
        .select("media_a", "media_b").as[(Long, Long)].collect().toSet
      val acc = spark.sparkContext.longAccumulator("dropped")
      val capped = Multimodal.videoNearDups(frames, maxPerHash = 8,
          droppedAcc = Some(acc))
        .select("media_a", "media_b").as[(Long, Long)].collect().toSet
      // n_match can only shrink under the cap while set sizes stay exact,
      // so the capped cut under-reports and NEVER invents pairs
      assert((capped -- exact).isEmpty,
        s"capped produced pairs the exact form lacks: ${capped -- exact}")
      // and any loss is visible in the overflow accumulator, never silent
      if (capped != exact)
        assert(acc.value > 0, "pairs lost without any counted bucket drop")
    } finally { frames.unpersist(); () }
  }

  test("extracted features feed the ANN operator end-to-end") {
    val feats = Multimodal.extractFeatures(media)
      .select(col("media_id").as("vec_id"), col("feature").as("embedding"))
    val q = feats.filter(col("vec_id") === 1)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val top = Similarity.bruteForceTopK(feats, q, k = 5).collect()
    assert(top.length == 5 && top.forall(_.getAs[Double]("cos_sim") <= 1.0001))
  }

  // ------------------------------------------------------- audio landmarks

  test("audioLandmarks: deterministic, unique rows, DC-shift invariant, short-payload safe") {
    val payload = "the quick brown fox jumps over the lazy dog " * 8
    val bytes = payload.getBytes("UTF-8")
    val lm1 = Multimodal.Kernels.audioLandmarks(bytes)
    val lm2 = Multimodal.Kernels.audioLandmarks(bytes.clone())
    assert(lm1 == lm2, "landmarks must be deterministic")
    assert(lm1.nonEmpty, "a sentence-length payload must yield landmarks")
    assert(lm1.distinct == lm1, "landmark (hash, t) rows must be unique per payload")
    // mean-centering per window absorbs a uniform non-saturating level
    // shift exactly (the audio analog of dHash's gradient invariance)
    val shifted = bytes.map(b => math.min(255, (b & 0xff) + 7).toByte)
    assert(Multimodal.Kernels.audioLandmarks(shifted) == lm1,
      "landmarks must be invariant to a uniform non-saturating level shift")
    // hash packing stays inside 12 bits; t inside 16
    lm1.foreach { case (h, t) =>
      assert(h >= 0 && h < 4096, s"hash $h outside the 12-bit pack")
      assert(t >= 0 && t < 65536)
    }
    assert(Multimodal.Kernels.audioLandmarks(Array.emptyByteArray).isEmpty)
    assert(Multimodal.Kernels.audioLandmarks(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.Kernels.audioLandmarks(null).isEmpty)
  }

  test("audio near-dup: above the material floor, every variant's top match is its original at offset 0") {
    // triples = the registry form; the pair form's recall is gated by
    // AudioProbe (BASELINE round-12 audio rows: pair 0.985 / triplet
    // 0.948 at sf0.1, cap 128)
    val corpus = Multimodal.withReencodedVariants(media, everyNth = 5)
    val lms = Multimodal.audioFingerprints(corpus, triples = true).cache()
    try {
      // only audio rows are fingerprinted; binary never reaches the output
      assert(!lms.schema.fields.exists(_.dataType.typeName == "binary"))
      val counts = lms.groupBy("media_id").count()
        .as[(Long, Long)].collect().toMap
      val pairs = Multimodal.audioNearDups(lms, minVotes = 5, maxPerHash = 0)
        .collect()
      val variantIds = corpus.filter(col("media_id") >= 10000000L)
        .filter(col("kind") === "audio")
        .select("media_id").as[Long].collect()
      assert(variantIds.nonEmpty)
      // the documented minimum-material constraint: recall is gated only
      // for tracks whose original yields enough landmarks — and the floor
      // must not quietly exclude the corpus (it covers the large majority)
      val gated = variantIds.filter(v => counts.getOrElse(v - 10000000L, 0L)
        >= Multimodal.Kernels.MinMatchableLandmarks3)
      assert(gated.length * 10 >= variantIds.length * 7,
        s"material floor excludes too much: ${gated.length}/${variantIds.length}")
      gated.foreach { v =>
        val orig = v - 10000000L
        val best = pairs.filter(r =>
            r.getAs[Long]("media_a") == v || r.getAs[Long]("media_b") == v)
          .maxByOption(_.getAs[Int]("n_votes"))
        assert(best.isDefined, s"variant $v matched nothing")
        val b = best.get
        val other = if (b.getAs[Long]("media_a") == v) b.getAs[Long]("media_b")
                    else b.getAs[Long]("media_a")
        assert(other == orig,
          s"variant $v's top match is $other, not its original $orig")
        assert(b.getAs[Int]("best_off") == 0,
          s"variant $v aligns at offset ${b.getAs[Int]("best_off")}, not 0")
      }
    } finally { lms.unpersist(); () }
  }

  test("audio near-dup finds an embedded clip at a NONZERO offset where payload identity cannot") {
    // the landmark matcher's unique value over the identity family: a
    // track containing another track's content at an OFFSET is nothing
    // like it at whole-payload level, but its landmarks agree at one
    // coherent time shift (prefix bytes / hop windows)
    val contentA = Array.tabulate(1200)(i =>
      (((i * 2654435761L) >> 5) & 0xff).toByte)
    val junk = Array.tabulate(400)(i =>
      ((((i + 131) * 40503L) >> 3) & 0xff).toByte)
    val contentB = junk ++ contentA
    // premise 1: the payloads are NOT identity-matchable (dHash far)
    val d = java.lang.Long.bitCount(
      Multimodal.Kernels.dHash64(contentA) ^ Multimodal.Kernels.dHash64(contentB))
    assert(d > 3, s"premise broken: payloads identity-match at d=$d")
    val audio = Seq((1L, contentA), (2L, contentB))
      .toDF("media_id", "content")
      .select(col("media_id"), lit("audio").as("kind"), col("content"),
        struct(lit(0).as("width"), lit(0).as("height"),
          lit(16000).as("sampleRate"), lit(0).as("nFrames"),
          lit("").as("mime")).as("meta"))
    val lms = Multimodal.audioFingerprints(audio, window = 32, triples = true)
    // premise 2: both tracks clear the material floor
    val counts = lms.groupBy("media_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ >= Multimodal.Kernels.MinMatchableLandmarks3),
      counts.toString)
    val pairs = Multimodal.audioNearDups(lms, maxPerHash = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2), r.getInt(3))).toList
    assert(pairs.map(p => (p._1, p._2)) == List((1L, 2L)),
      s"embedded clip not matched: $pairs")
    // off = t_a − t_b for matching hashes; B carries A's content shifted
    // by prefixBytes/hop = 400/4 = 100 windows → best_off = −100
    assert(pairs.head._4 == -100, s"wrong offset: ${pairs.head}")
    assert(pairs.head._3 >= 5, s"too few votes: ${pairs.head}")
    // ...and the payload identity stage indeed sees nothing
    val idPairs = Multimodal.payloadNearDups(
      Seq((1L, contentA), (2L, contentB)).toDF("media_id", "content")
        .select(col("media_id"), lit("audio").as("kind"), col("content"),
          struct(lit(0).as("width"), lit(0).as("height"),
            lit(16000).as("sampleRate"), lit(0).as("nFrames"),
            lit("").as("mime")).as("meta")),
      maxPerBucket = 0).count()
    assert(idPairs == 0L, "identity stage unexpectedly matched the clip")
  }

  test("audioLandmarks3: deterministic, unique, zone-local, and ~2^20-packed") {
    val payload = ("pack my box with five dozen liquor jugs " * 10).getBytes("UTF-8")
    val lm = Multimodal.Kernels.audioLandmarks3(payload)
    assert(lm.nonEmpty && lm == Multimodal.Kernels.audioLandmarks3(payload.clone()))
    assert(lm.distinct == lm, "triplet (hash, t) rows must be unique per payload")
    lm.foreach { case (h, t) =>
      assert(h >= 0 && h < 16 * 16 * 16 * 16 * 16, s"hash $h outside the triplet pack")
      assert(t >= 0 && t < 65536)
    }
    // zone locality: destroying one region's peaks must not change
    // landmarks anchored well before it (no pairing ripple)
    val damaged = payload.clone()
    java.util.Arrays.fill(damaged, 300, 340, 0.toByte)
    val lmD = Multimodal.Kernels.audioLandmarks3(damaged).toSet
    val wellBefore = lm.filter { case (_, t) => t * 4 + 32 + 15 * 4 < 290 }
    assert(wellBefore.nonEmpty)
    wellBefore.foreach(l => assert(lmD.contains(l),
      s"landmark $l anchored before the damage was lost — pairing rippled"))
    // level-shift invariance carries over from the shared peak front half
    val shifted = payload.map(b => math.min(255, (b & 0xff) + 7).toByte)
    assert(Multimodal.Kernels.audioLandmarks3(shifted) == lm)
  }

  test("autoAudioWindow: steps with density, respects the window bound") {
    // this corpus is far below saturation for the triplet space → base
    assert(Multimodal.autoAudioWindow(media) == 32)
    // an absurdly low occupancy target forces steps, clamped at maxWindow
    assert(Multimodal.autoAudioWindow(media, targetOccupancy = 0,
      maxWindow = 128) == 128)
    // a non-power-of-two bound is never overshot
    assert(Multimodal.autoAudioWindow(media, targetOccupancy = 0,
      maxWindow = 200) <= 200)
    // the pair form's 2^12 space saturates earlier than the triplet's
    assert(Multimodal.autoAudioWindow(media, triples = false) >=
      Multimodal.autoAudioWindow(media))
  }

  test("audio pairs feed the Components resolution chain") {
    val corpus = Multimodal.withReencodedVariants(media, everyNth = 5)
    val lms = Multimodal.audioFingerprints(corpus, triples = true).cache()
    try {
      val counts = lms.groupBy("media_id").count()
        .as[(Long, Long)].collect().toMap
      val pairs = Multimodal.audioNearDups(lms, maxPerHash = 0)
        .select(col("media_a").as("doc_a"), col("media_b").as("doc_b"))
      val comp = Components.connectedComponents(pairs)
        .as[(Long, Long)].collect().toMap
      // every above-floor variant resolves into its original's component
      // (the pair source is pluggable — same contract x89/x110 rely on)
      val gated = corpus.filter(col("media_id") >= 10000000L)
        .filter(col("kind") === "audio")
        .select("media_id").as[Long].collect()
        .filter(v => counts.getOrElse(v - 10000000L, 0L)
          >= Multimodal.Kernels.MinMatchableLandmarks3)
      assert(gated.nonEmpty)
      gated.foreach { v =>
        assert(comp.get(v).isDefined && comp(v) == comp(v - 10000000L),
          s"variant $v not in its original's component")
      }
    } finally { lms.unpersist(); () }
  }

  test("audio near-dup: capped form is conservative and observable") {
    val corpus = Multimodal.withReencodedVariants(media, everyNth = 5)
    val lms = Multimodal.audioFingerprints(corpus).cache()
    try {
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))
      val exact = Multimodal.audioNearDups(lms, minVotes = 1,
          minCoverage = 0.0, maxPerHash = 0)
        .collect().map(r => key(r) -> r.getAs[Int]("n_votes")).toMap
      val acc = spark.sparkContext.longAccumulator("audioDrop")
      val capped = Multimodal.audioNearDups(lms, minVotes = 1,
          minCoverage = 0.0, maxPerHash = 4, droppedAcc = Some(acc))
        .collect().map(r => key(r) -> r.getAs[Int]("n_votes")).toMap
      // votes can only shrink under the cap: no invented pairs, no
      // inflated scores
      capped.foreach { case (k, v) =>
        assert(exact.contains(k), s"capped invented pair $k")
        assert(v <= exact(k), s"capped inflated votes for $k: $v > ${exact(k)}")
      }
      if (capped != exact)
        assert(acc.value > 0, "votes lost without any counted bucket drop")
    } finally { lms.unpersist(); () }
  }

  test("COMPOSED partial-overlap recovery: identity stage finds 0 planted clips, the landmark stage finds all at exact offsets") {
    // the PartialOverlapProbe device at fixture size, through the FULL
    // composed production posture (identity grouping → components →
    // matcher on the residual) — regression-gates the round-14 scale
    // measurement's mechanism: an embedded clip is invisible to payload
    // identity (dHash far) and recoverable ONLY by offset-coherent voting
    def junk(id: Long, len: Int): Array[Byte] = Array.tabulate(len)(i =>
      ((((i + 131) * 40503L + id * 2654435761L) >> 3) & 0xff).toByte)
    val base = media.filter(col("kind") === "audio")
      .orderBy(length(col("content")).desc, col("media_id")).limit(8)
      .select("media_id", "kind", "content", "meta").as[
        (Long, String, Array[Byte], Multimodal.MediaMeta)].collect()
    val plantedIds = base.take(2).map(_._1 + 40000000L).toSet
    val plants = base.take(2).map { case (id, k, c, m) =>
      // hop-aligned prefix (hop 4) — landmarks align at −prefix/4 windows
      (id + 40000000L, k, junk(id, 400) ++ c, m)
    }
    val all = spark.createDataFrame((base ++ plants).toSeq)
      .toDF("media_id", "kind", "content", "meta")
    // stage 1: identity MUST see nothing for the planted pairs
    val edges = Multimodal.payloadDupEdges(all)
      .select(col("media_a").as("doc_a"), col("media_b").as("doc_b"))
    val comp = Components.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    plants.foreach { case (pid, _, _, _) =>
      val oid = pid - 40000000L
      assert(!(comp.contains(pid) && comp.contains(oid) &&
        comp(pid) == comp(oid)),
        s"identity stage matched the planted clip $pid — premise broken")
    }
    // stage 2 on the residual: both planted pairs recovered, offset −100
    val residual = all.select("media_id")
      .join(spark.createDataset(comp.toSeq).toDF("media_id", "rep"),
        Seq("media_id"), "left")
      .select(coalesce(col("rep"), col("media_id")).as("media_id"))
      .distinct()
    val lms = Multimodal.audioFingerprints(all, triples = true)
      .join(residual, Seq("media_id"), "left_semi")
    val pairs = Multimodal.audioNearDups(lms, maxPerHash = 128)
      .collect().map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"),
        r.getAs[Int]("best_off")))
    plantedIds.foreach { pid =>
      val oid = pid - 40000000L
      val hit = pairs.find(p => (p._1 == oid && p._2 == pid) ||
        (p._1 == pid && p._2 == oid))
      assert(hit.isDefined, s"landmark stage missed planted clip $pid: " +
        pairs.mkString(", "))
      val expOff = if (hit.get._1 == oid) -100 else 100
      assert(hit.get._3 == expOff,
        s"clip $pid matched at offset ${hit.get._3}, expected $expOff")
    }
  }

  test("componentSetRepresentatives VIDEO: a partial-overlap pair anchored on an ABSORBED member is lost by the residual form and recovered per-member; identical-set replicas collapse") {
    // the round-15 fix's mechanism at fixture size (PartialOverlapProbe's
    // 100× finding: 106/106 full-panel video misses were representative
    // substitution): identity clusters original O with a payload-close
    // member V whose FRAME set diverges and V becomes the representative;
    // the residual form loses the plant↔O pair, while the
    // set-representative form keeps O matchable as itself (per-member
    // x108 Jaccard denominators) and collapses W — a true replica with
    // O's exact frame set — onto O.
    def frameFill(seed: Long, len: Int): Array[Byte] = Array.tabulate(len)(
      i => ((((i + 17) * 31337L + seed * 2654435761L) >> 2) & 0xff).toByte)
    def video(id: Long, seeds: Seq[Long]) =
      (id, "video", seeds.toArray.flatMap(s => frameFill(s, 64)),
        Multimodal.MediaMeta(8, 8, 0, seeds.length, "video/x-raw"))
    val v = video(10L, 900L to 903L)              // the representative
    val o = video(20L, 100L to 111L)              // the absorbed member
    val w = video(30L, 100L to 111L)              // true replica of O
    val p = video(40000020L, Seq(800L, 801L) ++ (100L to 111L)) // plant on O
    val all = spark.createDataFrame(Seq(v, o, w, p))
      .toDF("media_id", "kind", "content", "meta")
    val frames = Multimodal.frameFingerprints(all)
    // fixture sanity: per-frame hashes stay distinct (stride-2 sampling:
    // V 2 of 4, O/W 6 of 12, plant 1 junk + O's 6)
    val sizes = frames.groupBy("media_id").count()
      .as[(Long, Long)].collect().toMap
    assert(sizes == Map(10L -> 2L, 20L -> 6L, 30L -> 6L, 40000020L -> 7L),
      s"fixture frame sets collapsed: $sizes")
    val comp = Seq((10L, 10L), (20L, 10L), (30L, 10L))
      .toDF("node", "component")
    def pairsOf(fps: org.apache.spark.sql.DataFrame) =
      Multimodal.videoNearDups(fps, maxPerHash = 0)
        .select("media_a", "media_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSeq
    // round-14 residual form: the representative's own frames only — lost
    val residual = pairsOf(
      frames.filter(col("media_id") =!= 20L && col("media_id") =!= 30L))
    assert(!residual.exists(r => r._2 == 40000020L),
      s"residual form unexpectedly matched: $residual")
    // round-15 form: O survives as itself (min id of its set group), W's
    // identical set collapses onto it, V's divergent set survives
    val kept = Multimodal.componentSetRepresentatives(frames, comp)
    val keptIds = kept.select("media_id").distinct().as[Long].collect().toSet
    assert(keptIds == Set(10L, 20L, 40000020L),
      s"set representatives wrong: $keptIds")
    val pairs = pairsOf(kept)
    val hit = pairs.find(r => r._1 == 20L && r._2 == 40000020L)
    assert(hit.isDefined, s"per-member form missed the absorbed pair: $pairs")
    // x108's PER-MEMBER Jaccard denominator: 6 / (7 + 6 - 6)
    assert(math.abs(hit.get._3 - 6.0 / 7.0) < 1e-3,
      s"jaccard ${hit.get._3}, expected ${6.0 / 7.0}")
  }

  test("componentFingerprintUnion AUDIO: an embedded clip of an ABSORBED track is recovered under the component's key at the exact offset") {
    def junk(id: Long, len: Int): Array[Byte] = Array.tabulate(len)(i =>
      ((((i + 131) * 40503L + id * 2654435761L) >> 3) & 0xff).toByte)
    val base = media.filter(col("kind") === "audio")
      .orderBy(length(col("content")).desc, col("media_id")).limit(2)
      .select("media_id", "kind", "content", "meta").as[
        (Long, String, Array[Byte], Multimodal.MediaMeta)].collect()
    val Array(vRow, oRow) = base
    // O (absorbed) carries the content the plant embeds; V (representative)
    // is an unrelated track; the plant's prefix is hop-aligned (hop 4)
    val plant = (oRow._1 + 40000000L, oRow._2,
      junk(oRow._1, 400) ++ oRow._3, oRow._4)
    val all = spark.createDataFrame(Seq(vRow, oRow, plant))
      .toDF("media_id", "kind", "content", "meta")
    val lms = Multimodal.audioFingerprints(all, triples = true)
    val comp = Seq((oRow._1, vRow._1), (vRow._1, vRow._1))
      .toDF("node", "component")
    def pairsOf(l: org.apache.spark.sql.DataFrame) =
      Multimodal.audioNearDups(l, maxPerHash = 128)
        .select("media_a", "media_b", "best_off")
        .as[(Long, Long, Int)].collect().toSeq
    val residual = pairsOf(lms.filter(col("media_id") =!= oRow._1))
    assert(!residual.exists(r => r._1 == plant._1 || r._2 == plant._1),
      s"residual form unexpectedly matched: $residual")
    // the audio composed default (tuple-level union): O's landmarks stay
    // matchable under V's component key with O's OWN timeline (members of
    // a payload-identity cluster are byte-aligned), so the offset is
    // still the exact −prefix/hop
    val pairs = pairsOf(Multimodal.componentFingerprintUnion(lms, comp))
    val hit = pairs.find(r => Set(r._1, r._2) == Set(vRow._1, plant._1))
    assert(hit.isDefined, s"union form missed the absorbed clip: $pairs")
    val expOff = if (hit.get._1 == vRow._1) -100 else 100
    assert(hit.get._3 == expOff,
      s"clip matched at offset ${hit.get._3}, expected $expOff")
  }
}
