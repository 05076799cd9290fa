package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe for the payload-dHash banding: bucket occupancy and
  * uncapped pair counts per SF — the feasibility evidence for running
  * x104 UNCAPPED on the driver surface (recorded in BASELINE.md).
  */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("phash-probe").getOrCreate()
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val media = graft.operators.Multimodal.withReencodedVariants(
        graft.operators.Multimodal.syntheticMedia(
          graft.queries.Tables.documents(spark, d)))
      val fp = graft.operators.Multimodal.payloadFingerprints(media).cache()
      val n = fp.count()
      val distinct = fp.select("phash").distinct().count()
      val chunked = fp.select(col("phash"),
        posexplode(array((0 until 4).map(c =>
          shiftright(col("phash"), c * 16).bitwiseAND(lit(0xffffL))): _*))
          .as(Seq("chunk", "ck")))
      val buckets = chunked.groupBy("chunk", "ck").count()
      val top = buckets.orderBy(desc("count")).limit(5).collect()
        .map(r => r.getLong(2)).mkString(",")
      val t0 = System.nanoTime()
      val pairs = graft.operators.Multimodal.payloadNearDups(media, maxPerBucket = 0).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $sf docs=$n distinct_phash=$distinct top_buckets=[$top] uncapped_pairs=$pairs wall=$secs%.2f s")
      // where do TEXT near-dup pairs land in payload-dHash distance?
      val textPairs = graft.queries.TextOps
        .lshNearDupPairsOf(graft.queries.Tables.documents(spark, d))
        .select(col("doc_a"), col("doc_b"))
      val a = fp.select(col("media_id").as("doc_a"), col("phash").as("pa"))
      val b = fp.select(col("media_id").as("doc_b"), col("phash").as("pb"))
      val dist = textPairs.join(a, "doc_a").join(b, "doc_b")
        .select(bit_count(col("pa").bitwiseXOR(col("pb"))).as("h"))
      val hist = dist.groupBy(floor(col("h") / 4).as("bin")).count()
        .orderBy("bin").collect()
        .map(r => s"${r.getLong(0) * 4}-${r.getLong(0) * 4 + 3}:${r.getLong(1)}")
        .mkString(" ")
      println(s"PROBE $sf text-near-dup phash-hamming hist: $hist")
      fp.unpersist()
    }
    spark.stop()
  }
}
