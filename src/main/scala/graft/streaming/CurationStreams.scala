package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Streaming twin of the batch curation surface (x41/x48/q31): documents
  * arrive as an unbounded stream and pass through quality gates, language
  * ID and bounded-state exact dedup in ONE continuous pipeline.
  *
  * Stage order is deliberate: the stateless gates run first so the only
  * stateful operator (dedup) keys as few rows as possible; its state is
  * bounded by the watermark horizon via `dropDuplicatesWithinWatermark`,
  * never by stream length. Every stage is a per-row expression — no
  * windows, no joins — so the pipeline scales with input partitions.
  */
object CurationStreams {

  val DocSchema: String =
    "doc_id LONG, ts TIMESTAMP, text STRING, lang STRING, source STRING"

  /** File-source streaming ingest of documents-shaped NDJSON. */
  def docStream(spark: SparkSession, dir: String,
                maxFilesPerTrigger: Int = 2): DataFrame =
    spark.readStream
      .schema(DocSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Quality gate + language ID + within-watermark exact dedup.
    *
    * Output keeps the input columns plus `pred_lang`, `n_tokens`,
    * `punct_ratio`, `content_hash`. Documents failing the quality gate are
    * dropped; documents whose content hash was already admitted within the
    * watermark horizon are dropped as duplicates (cross-horizon dedup is
    * the batch layer's job — q31).
    */
  def curate(docs: DataFrame,
             watermark: String = "30 minutes",
             minTokens: Int = 5,
             maxPunctRatio: Double = 0.2): DataFrame = {
    val len = length(col("text"))
    val nTok = size(split(col("text"), "\\s+"))
    val punct = (len - length(regexp_replace(col("text"), "[.,!?;:]", "")))
      .cast("double") / len
    val (pred, _) = TextAnalysis.langColumns(col("text"))
    docs
      .withColumn("n_tokens", nTok)
      .withColumn("punct_ratio", punct)
      .filter(col("n_tokens") >= minTokens &&
        col("punct_ratio") <= maxPunctRatio)
      .withColumn("pred_lang", pred)
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
  }
}
