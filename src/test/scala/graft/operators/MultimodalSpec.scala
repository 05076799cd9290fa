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

  test("extracted features feed the ANN operator end-to-end") {
    val feats = Multimodal.extractFeatures(media)
      .select(col("media_id").as("vec_id"), col("feature").as("embedding"))
    val q = feats.filter(col("vec_id") === 1)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val top = Similarity.bruteForceTopK(feats, q, k = 5).collect()
    assert(top.length == 5 && top.forall(_.getAs[Double]("cos_sim") <= 1.0001))
  }
}
