package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Benchmark-decontamination core, shared VERBATIM by the batch x70 query
  * ([[graft.queries.CurationOps]]) and its streaming twin
  * ([[graft.streaming.CurationStreams.decontaminate]]): per-doc word-trigram
  * overlap with an eval suite, computed as a broadcast-bloom map-side prune
  * followed by an EXACT equi-join with the suite's distinct-trigram relation
  * (bloom false positives are resolved by the join, so scores are exact).
  *
  * Scale shape: the eval suite is the bounded side — its trigram relation
  * stays DISTRIBUTED (nothing suite-sized ever lands in driver memory; the
  * driver holds only the ~12 MB-at-1%-FPP bloom bits), the corpus/stream
  * side is pruned BEFORE the join exchange so the shuffle carries only
  * probable matches, and per-doc counting is one map-side-combined
  * aggregation. The reference for the shape is the batch x70 plan the
  * round-3 review settled on.
  */
object Decontaminate {

  /** The prepared eval-suite side: its distinct-trigram relation (kept
    * distributed), the broadcast bloom over it (None for an empty suite —
    * Spark's sketch agg yields a null buffer there), and the trigram count.
    * Build ONCE per suite and reuse across calls / micro-batches; a changed
    * suite means rebuilding (for a streaming query: restart with a new
    * side). `trigrams` is returned CACHED (it served the count + bloom
    * build and every [[score]] joins it); call [[BenchSide.release]] when
    * the suite-sized cache should stop pinning executor storage — lazy
    * plans built before the release simply recompute the small relation at
    * execution.
    */
  final case class BenchSide(trigrams: DataFrame,
                             bloom: Option[Broadcast[BloomFilter]],
                             n: Long) {
    def release(): Unit = trigrams.unpersist(false)
  }

  /** Distinct word trigrams of the eval suite + the broadcast bloom. */
  def benchSide(benchDocs: DataFrame, textCol: String = "text",
                fpp: Double = 0.01): BenchSide = {
    val trigU = udf((t: String) => Kernels.wordTrigramSet(t))
    val trigs = benchDocs.select(explode(trigU(col(textCol))).as("sh"))
      .distinct().cache()
    val n = trigs.count()
    val bloom =
      if (n == 0L) None
      else Some(benchDocs.sparkSession.sparkContext.broadcast(
        trigs.stat.bloomFilter(col("sh"), n, fpp)))
    BenchSide(trigs, bloom, n)
  }

  /** Score `docs` against the suite: (doc_id, n_overlap, contaminated) for
    * EVERY input doc (zero-overlap docs included — left join back). The
    * trigram explode, bloom prune, exact join, and count are the batch x70
    * plan; `docs` may be a batch relation or one micro-batch of a stream.
    */
  def score(docs: DataFrame, bench: BenchSide, threshold: Int = 5,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val trigU = udf((t: String) => Kernels.wordTrigramSet(t))
    val sh = docs.select(col(idCol).as("doc_id"),
      explode(trigU(col(textCol))).as("sh"))
    val pruned = bench.bloom match {
      case Some(bc) =>
        val mightContain =
          udf((t: String) => t != null && bc.value.mightContainString(t))
        sh.filter(mightContain(col("sh"))) // map-side, BEFORE the exchange
      case None => sh // empty suite: the join below yields zero overlaps
    }
    val overlap = pruned.join(bench.trigrams, "sh")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
    docs.select(col(idCol).as("doc_id"))
      .join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("contaminated",
        when(col("n_overlap") >= threshold, 1).otherwise(0))
  }
}
