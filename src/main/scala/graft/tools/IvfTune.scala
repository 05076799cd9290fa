package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Dev tool: measure IVF recall on the real corpus for seeding/iter configs. */
object IvfTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.queries.Tables.embeddings(spark, sfDir)
    val qids = Seq(1L, 7L, 99L, 150L, 230L, 301L, 404L, 480L)
    val q = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    def sets(df: DataFrame) = df.select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val exact = sets(graft.operators.Similarity.bruteForceTopK(emb, q, 10))
    def recall(df: DataFrame): Double = {
      val got = sets(df)
      val rs = exact.map { case (k, ex) =>
        got.getOrElse(k, Set.empty[Long]).intersect(ex).size.toDouble / ex.size }
      rs.sum / rs.size
    }
    // seeding A/B at the defaults: hash-ordered vs lowest-id kmeans sample
    for (hash <- Seq(true, false)) {
      val cents = graft.operators.Similarity.kmeansCentroids(emb, 16,
        iters = 2, hashOrderedSample = hash)
      val r = recall(graft.operators.Similarity.ivfTopKWithCentroids(
        emb, q, 10, cents, nprobe = 4))
      println(f"[ivftune] seeding=${if (hash) "hash" else "lowest-id"} " +
        f"iters=2 nprobe=4 recall=$r%.4f")
    }
    for (iters <- Seq(2, 3, 4); np <- Seq(4, 6, 8); ss <- Seq(256, 500)) {
      val cents = graft.operators.Similarity.kmeansCentroids(emb, 16,
        iters = iters, sampleSize = ss)
      val r = recall(graft.operators.Similarity.ivfTopKWithCentroids(
        emb, q, 10, cents, nprobe = np))
      println(f"[ivftune] iters=$iters nprobe=$np sample=$ss recall=$r%.4f")
    }
    spark.stop()
  }
}
