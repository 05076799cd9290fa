package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc: repeated same-session builds of the LM-memo entries — the
  * second+ build must hit [[graft.operators.UnigramLm.trainCached]]
  * (dev tool, not part of the driver contract).
  */
object MemoCheck {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).appName("memo-check").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("x117_curation_v3")(spark, d).count()
      println(f"[memo] x117 build$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("x115_percentile_gate")(spark, d).count()
      println(f"[memo] x115 build$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
