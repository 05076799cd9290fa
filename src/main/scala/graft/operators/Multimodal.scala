package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video ride through DataFrames as
  * opaque `BINARY` columns plus a typed metadata struct; decode/featurize/
  * resize/frame-sample run as partition-local batched kernels over a typed
  * Dataset (`mapPartitions` with case-class Encoders — the Scala analog of
  * a vectorized Python UDF: rows are processed in bounded batches so a real
  * decoder could amortize model/codec setup per batch).
  *
  * IMPORTANT — STUBBED DECODERS: no imaging/audio libraries exist in this
  * environment, so [[Kernels.decodeToFloats]] and friends are clearly-marked
  * DETERMINISTIC FAKES (byte-histogram features, byte-slice "frames"). The
  * Spark-side contract — schema, batch shape, partitioning, kernel
  * signature — is real and tested; swapping in a real codec changes only the
  * function body.
  *
  * Scale posture: binary payloads are the widest column by far, so every
  * plan here selects/prunes metadata BEFORE touching `content`, keeps binary
  * out of shuffles (features are extracted partition-locally, only the
  * small feature vectors move), and batches kernel calls.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, sampleRate: Int,
                             nFrames: Int, mime: String)
  final case class MediaRow(media_id: Long, kind: String,
                            content: Array[Byte], meta: MediaMeta)
  final case class MediaFeature(media_id: Long, kind: String,
                                feature: Array[Float])

  /** Deterministic synthetic media derived from `documents` (text bytes as
    * payload) — stands in for real blobs so the plumbing is testable against
    * shared fixtures.
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("n_chars") % 480 + 1).cast("int").as("height"),
        lit(16000).as("sampleRate"),
        (col("n_chars") % 30 + 1).cast("int").as("nFrames"),
        concat(lit("fake/"), col("lang")).as("mime")).as("meta"))

  /** Partition-local kernels. Each takes a BATCH of rows (the batch shape a
    * real vectorized decoder needs) and returns one output per input.
    */
  object Kernels {

    val FeatureDim = 16

    /** STUB — deterministic fake decode: a real implementation would decode
      * the image/audio payload here (e.g. via javax.imageio / a JNI codec).
      * The fake is a normalized 16-bin byte histogram: deterministic,
      * content-sensitive, dimension-stable — enough to exercise every
      * downstream consumer (ANN search, dedup) honestly.
      */
    def decodeToFloats(batch: Seq[MediaRow]): Seq[MediaFeature] =
      batch.map { r =>
        val content = if (r.content == null) Array.emptyByteArray else r.content
        val hist = new Array[Float](FeatureDim)
        content.foreach(b => hist((b & 0xff) / FeatureDim) += 1f)
        val n = math.max(1, content.length).toFloat
        MediaFeature(r.media_id, r.kind, hist.map(_ / n))
      }

    /** STUB — fake resize: truncates/pads the payload to w*h bytes and
      * rewrites the metadata (a real kernel would rescale pixels).
      */
    def resize(r: MediaRow, w: Int, h: Int): MediaRow = {
      val target = w * h
      val content = if (r.content == null) Array.emptyByteArray else r.content
      val out = java.util.Arrays.copyOf(content, target)
      r.copy(content = out, meta = r.meta.copy(width = w, height = h))
    }

    /** STUB — fake frame sampling: returns every `stride`-th byte-slice as a
      * "frame" (a real kernel would demux the container).
      */
    def sampleFrames(r: MediaRow, stride: Int): Seq[Array[Byte]] = {
      val content = if (r.content == null) Array.emptyByteArray else r.content
      val n = r.meta.nFrames
      val frameLen = math.max(1, content.length / math.max(1, n))
      (0 until n by stride).map { i =>
        content.slice(i * frameLen, math.min((i + 1) * frameLen, content.length))
      }
    }
  }

  /** Batched feature extraction: one kernel invocation per `batchSize` rows,
    * partition-local, binary never shuffled.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(b => Kernels.decodeToFloats(b.toSeq)))
      .toDF()
  }

  /** Resize every image row to (w, h); other kinds pass through. */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow]
      .map(r => if (r.kind == "image") Kernels.resize(r, w, h) else r)
      .toDF()
  }

  /** Explode sampled frames of video rows: (media_id, frame_no, frame). */
  def sampleVideoFrames(media: DataFrame, stride: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow]
      .filter(_.kind == "video")
      .flatMap { r =>
        Kernels.sampleFrames(r, stride).zipWithIndex.map { case (f, i) =>
          (r.media_id, i, f)
        }
      }
      .toDF("media_id", "frame_no", "frame")
  }
}
