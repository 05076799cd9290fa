package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-evidence dumper (round-18 optimization deliverable): writes
  * `.explain("formatted")` for named registry entries to
  * `plans/r18/<name>_<suffix>.txt`, with the incremental stores built
  * exactly as [[graft.Bench]] builds them (so probe plans show the
  * store-served shape, not the derived fallback).
  * Usage: tools/quietbench.sh graft.tools.ExplainDump <sfDir> <suffix> [names...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val suffix = args(1)
    val names: Seq[String] =
      if (args.length > 2) args.drop(2).toSeq else graft.SparkEntry.queries.keys.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.HashHistory.create(spark, sfDir,
      graft.queries.TextOps.x86HistoryHashes(spark, sfDir))
    graft.sources.GramHistory.create(spark, sfDir,
      graft.queries.TextOps.x86Split(spark, sfDir)._1,
      graft.queries.TextOps.DupGramK)
    graft.sources.PhashHistory.create(spark, sfDir,
      graft.queries.VectorOps.x109HistoryFps(spark, sfDir))
    graft.sources.LandmarkHistory.create(spark, sfDir,
      graft.queries.VectorOps.x113HistoryLms(spark, sfDir))
    graft.sources.FrameHistory.create(spark, sfDir,
      graft.queries.VectorOps.x116HistoryFrames(spark, sfDir))
    graft.sources.MinHashHistory.create(spark, sfDir,
      graft.queries.TextOps.x123HistoryBands(spark, sfDir),
      graft.queries.TextOps.x123HistoryShingles(spark, sfDir))
    val dir = java.nio.file.Paths.get("plans", "r18")
    java.nio.file.Files.createDirectories(dir)
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(dir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"[explain] wrote ${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
