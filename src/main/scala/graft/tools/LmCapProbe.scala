package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the x97 bigram-LM PRODUCTION mitigation at scale: the registry
  * entry self-scores with an UNCAPPED bigram model so the oracle can replay
  * it exactly, which makes the model broadcast grow with the corpus's
  * distinct-bigram count — fine to 30×, but at 100× (500k docs) the
  * broadcast + three broadcast joins hit heap/serialization pressure and
  * the wall goes superlinear. Production caps the model (`bigramCap`,
  * KenLM-pruning behavior: the dropped tail scores through the cb=0
  * backoff); this probe times capped vs uncapped on the same corpus so
  * BASELINE.md can record the mitigation's measured effect, not a claim.
  *
  * Usage: runMain graft.tools.LmCapProbe [dir] [cap] [runs]
  */
object LmCapProbe {
  def main(args: Array[String]): Unit = {
    val load0 = graft.Bench.loadAvg()
    val dir = if (args.length > 0) args(0) else "/tmp/graft_scale100"
    val cap = if (args.length > 1) args(1).toInt else 200000
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Tables.documents(spark, dir)
    val nBigrams = graft.operators.BigramLm.trainBigrams(docs).count()
    def median(f: => Long): (Double, Long) = {
      var rows = 0L
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        rows = f
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (ts(runs / 2), rows)
    }
    val (tCap, rCap) = median(
      graft.operators.BigramLm.selfScore(docs, bigramCap = Some(cap)).count())
    val (tFull, rFull) = median(
      graft.operators.BigramLm.selfScore(docs).count())
    println(
      f"""{"metric":"lmcap","dir":"$dir","distinct_bigrams":$nBigrams,""" +
        f""""cap":$cap,"capped_s":$tCap%.2f,"uncapped_s":$tFull%.2f,""" +
        f""""rows_capped":$rCap,"rows_uncapped":$rFull,""" +
        f""""load_start":$load0%.2f,"load_end":${graft.Bench.loadAvg()}%.2f}""")
    spark.stop()
  }
}
