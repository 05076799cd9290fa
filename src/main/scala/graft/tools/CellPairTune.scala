package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev tool: measure the cell-bounded pair search
  * ([[graft.operators.Similarity.cellBoundedTopPairs]] — the linear-scale
  * embedding pair producer) against the exact chunked search it
  * approximates: pair recall@20 and wall time per (nlist, probes) config.
  * The registry config for x42b is pinned from this sweep.
  */
object CellPairTune {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    dirs.foreach { d =>
      val emb = graft.queries.Tables.embeddings(spark, d)
        .select(col("vec_id").cast(LongType), col("label").cast(IntegerType),
          col("embedding"))
        .as[(Long, Int, Array[Float])]
      def top20(df: org.apache.spark.sql.DataFrame) = df
        .orderBy(col("cos_sim").desc, col("id_a").asc, col("id_b").asc)
        .limit(20).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val t0 = System.nanoTime()
      val exact = top20(
        graft.operators.Similarity.topPairsByLabel(emb, 20, targetChunk = 256))
      val exactS = (System.nanoTime() - t0) / 1e9
      println(f"[cellpairtune] $d exact top-20: $exactS%.2fs")
      for (nlist <- Seq(8, 16); probes <- Seq(1, 2, 3)) {
        val cents = graft.operators.Similarity.kmeansCentroids(
          spark.read.parquet(s"$d/embeddings.parquet"),
          nlist = nlist, iters = 3, sampleSize = 512)
        val t1 = System.nanoTime()
        val approx = top20(graft.operators.Similarity.cellBoundedTopPairs(
          emb, 20, cents, probes = probes, targetChunk = 256))
        val dt = (System.nanoTime() - t1) / 1e9
        val recall = (approx & exact).size.toDouble / exact.size
        println(f"[cellpairtune] $d nlist=$nlist probes=$probes " +
          f"recall@20=$recall%.3f wall=$dt%.2fs")
      }
      // the AUTO (size-derived nlist) production form — the one whose work
      // per vector is bounded regardless of corpus size
      for (cell <- Seq(64, 128, 256); probes <- Seq(2, 3)) {
        val t1 = System.nanoTime()
        val approx = top20(graft.operators.Similarity.cellBoundedTopPairsAuto(
          emb, 20, targetCellSize = cell, probes = probes, targetChunk = 256))
        val dt = (System.nanoTime() - t1) / 1e9
        val recall = (approx & exact).size.toDouble / exact.size
        println(f"[cellpairtune] $d AUTO cell=$cell probes=$probes " +
          f"recall@20=$recall%.3f wall=$dt%.2fs (incl fit)")
      }
    }
    spark.stop()
  }
}
