package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the x114 substring-removal premium as a function of DUP
  * DENSITY — the claim the Dedup scaladoc argues and round-13 could not
  * show: the scaled testdata corpora have dup density ≈ 1.0 (nearly
  * every position of every doc is corpus-duplicated), so x114's hits
  * relation — "dup-density-sized" by design — was corpus-sized by
  * construction and the measured 100× wall (F/1.8, load-banded) is the
  * worst case, not the expected case.
  *
  * This probe builds corpora with CONTROLLED single-digit duplication:
  * every doc is 60 globally-unique tokens, and every `dupEvery`-th doc
  * has tokens 20–31 replaced by a shared 12-token boilerplate span →
  * char-level dup density ≈ (12/60)/dupEvery (≈ 4% at dupEvery 5; the
  * only corpus-duplicated grams are the boilerplate's). At each scale it
  * times the x99 audit and the x114 removal over (a) the unique-heavy
  * corpus and reports the removal premium (x114 − x99 ≈ the hits
  * exchange + rewrite), the audited dup mass, and the removed chars —
  * against the same doc counts where the ≈1.0-density rows live.
  *
  * Usage: runMain graft.tools.DupDensityProbe [factors...] [dupEvery]
  * (defaults: factors 10 100, dupEvery 5 → 4% density; corpora cached
  * under /tmp/graft_dens<factor>_<dupEvery>)
  */
object DupDensityProbe {

  /** 500k-doc base shape matched to /tmp/graft_scale100: factor × 5000
    * docs of 60 tokens each.
    */
  val DocsPerFactor = 5000L

  def synth(spark: SparkSession, factor: Int, dupEvery: Int,
            out: String): Unit = {
    val n = DocsPerFactor * factor
    val bp = (0 until 12).map(i => s"bpshared$i").mkString(" ")
    val toks = transform(sequence(lit(0), lit(59)),
      i => concat_ws("", lit("u"), col("doc_id"), lit("x"), i))
    spark.range(1L, n + 1L).select(col("id").as("doc_id"))
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(dupEvery)) === 0,
          concat_ws(" ",
            array_join(slice(toks, 1, 20), " "), lit(bp),
            array_join(slice(toks, 33, 28), " ")))
          .otherwise(array_join(toks, " ")).as("text"),
        lit("en").as("lang"), lit("synthdens").as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  private def time2(label: String, df: => DataFrame): (Double, Long) = {
    var rows = 0L
    var best = Double.MaxValue
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      rows = df.count()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[dens] $label run$i: $w%.2f s rows=$rows")
      best = math.min(best, w)
    }
    (best, rows)
  }

  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.toSeq.init.map(_.toInt)
      else Seq(10, 100)
    val dupEvery = if (args.nonEmpty) args.last.toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("dup-density-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[dup-density-probe] loadavg ${graft.Bench.loadAvg()} " +
      s"factors=$factors dupEvery=$dupEvery")
    for (f <- factors) {
      val dir = s"/tmp/graft_dens${f}_$dupEvery"
      if (!new java.io.File(s"$dir/documents.parquet/_SUCCESS").exists()) {
        println(s"[dens] generating ${f}x corpus at $dir")
        synth(spark, f, dupEvery, dir)
      }
      val docs = graft.queries.Tables.documents(spark, dir)
      val nDocs = docs.count()
      val k = graft.queries.TextOps.DupGramK
      val (w99, _) = time2(s"${f}x x99_audit",
        graft.SparkEntry.queries("x99_dupgrams")(spark, dir))
      val (w114, _) = time2(s"${f}x x114_removal",
        graft.SparkEntry.queries("x114_remove_dup_spans")(spark, dir))
      // measured density = corpus-duplicated char mass / total chars,
      // from the removal relation itself
      val d = graft.operators.Dedup.removeDupSpans(docs, k)
        .agg(sum(col("removed_chars")).as("rm"),
          sum(col("total_chars")).as("tot")).collect()(0)
      val removed = d.getLong(0)
      val dens = removed.toDouble / math.max(1L, d.getLong(1))
      val loadNow = graft.Bench.loadAvg()
      println(f"DENSITY $dir docs=$nDocs density=$dens%.4f " +
        f"x99=$w99%.2f s x114=$w114%.2f s premium=${w114 - w99}%.2f s " +
        f"removed_chars=$removed load=$loadNow%.2f")
    }
    spark.stop()
  }
}
