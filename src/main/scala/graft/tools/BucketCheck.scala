package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: report max LSH bucket occupancy on the documents corpus, to
  * confirm the default hot-bucket cap does not bite at test SFs.
  */
object BucketCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Tables.documents(spark, sfDir)
    val arrs = graft.operators.Dedup.shingleArrays(docs, 5)
      .filter(size(col("shs")) > 0)
    val sigs = graft.operators.Dedup.minHashSignaturesFromArrays(arrs, 128)
    val over = graft.operators.Dedup.lshBucketOverflow(sigs, 32, 128, 64)
    println(s"[bucketcheck] buckets over 64: ${over.count()}")
    val top = graft.operators.Dedup.lshBucketOverflow(sigs, 32, 128, 1)
      .orderBy(col("bucket_size").desc).limit(5).collect()
    top.foreach(r => println(s"[bucketcheck] band=${r.get(0)} size=${r.get(2)}"))
    // do capped candidates lose any verified near-dup pair?
    def pairs(cap: Int) = graft.operators.Dedup
      .lshCandidates(sigs, 32, 128, cap)
      .join(arrs.select(col("doc_id").as("doc_a"), col("shs").as("_sha")), "doc_a")
      .join(arrs.select(col("doc_id").as("doc_b"), col("shs").as("_shb")), "doc_b")
      .withColumn("inter", udf((a: Array[String], b: Array[String]) =>
        graft.operators.Kernels.intersectCount(a, b)).apply(col("_sha"), col("_shb")).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("_sha")).cast("long") + size(col("_shb")).cast("long") - col("inter")))
      .filter(col("jaccard") >= 0.8).select("doc_a", "doc_b")
    val uncapped = pairs(0).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairs(64).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[bucketcheck] verified pairs uncapped=${uncapped.size} capped=${capped.size} lost=${(uncapped -- capped).size}")
    spark.stop()
  }
}
