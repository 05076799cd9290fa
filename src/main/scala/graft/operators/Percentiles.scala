package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT distributed order statistics over integer-scaled score columns —
  * the device that turns "production derives the gate from a percentile"
  * (x101's scaladoc) into a derived scalar the curation gate can consume
  * (x115).
  *
  * Shape: the same two-phase trick as [[TokenBudget]]'s budget cut, keyed
  * by VALUE instead of hash. Phase 0 collapses the corpus to its
  * distinct-value histogram with ONE map-combined aggregation — the only
  * corpus-scale exchange, and it carries at most one row per distinct
  * scaled value (a 6-dp-scaled nll in [0, ~20] has ≤ 2e7 distinct values
  * REGARDLESS of corpus size, so the histogram is bounded at 100 TB).
  * Phase 1 windows per-bucket subtotals over the tiny bucket grid
  * (`value >> bucketShift` — monotone, so bucket order = value order) into
  * exclusive prefix offsets; phase 2 collects only the TARGET buckets'
  * histogram slices (one job for every requested rank; each slice is
  * bounded by 2^bucketShift distinct values — value-range-bounded like
  * the grid, never corpus-sized) and walks the within-bucket cumulative
  * count driver-side. The threshold is the smallest value whose
  * cumulative count reaches the target rank — no corpus-wide sort, no
  * single-partition window over the histogram.
  *
  * Exactness: rank m = ceil(pNum/pDen · N) in pure integer arithmetic;
  * the value at rank m is well-defined under ties (any tie order yields
  * the same value at that rank), which is what lets DuckDB replay it with
  * a one-window ROW_NUMBER.
  */
object Percentiles {

  /** The value at rank ceil(pNum/pDen · N) (1-based, ascending) of
    * `valueCol` (LongType). Runs two small jobs (N, then the threshold) —
    * a PRODUCER-style derivation like [[Pq]]'s codebook or
    * [[TokenBudget]]'s offsets, not a per-row transform. Requires
    * 0 < pNum ≤ pDen and a non-empty input; [[exactThresholdOpt]] is the
    * empty-tolerant form (a percentile of nothing is None — the gate
    * consumers degrade to an empty result without an extra probe job,
    * since N falls out of the phase-1 offsets anyway).
    */
  def exactThreshold(scores: DataFrame, valueCol: String,
                     pNum: Long, pDen: Long, bucketShift: Int = 16): Long =
    exactThresholdOpt(scores, valueCol, pNum, pDen, bucketShift)
      .getOrElse(throw new IllegalArgumentException(
        s"exactThreshold: no rows in $valueCol"))

  def exactThresholdOpt(scores: DataFrame, valueCol: String,
                        pNum: Long, pDen: Long,
                        bucketShift: Int = 16): Option[Long] =
    exactQuantiles(scores, valueCol, Seq((pNum, pDen)), bucketShift)
      .headOption.map(_._3)

  /** SEVERAL exact order statistics from ONE histogram pass: the
    * distinct-value histogram and the bucket-grid offsets are computed
    * once (the corpus-scale work), then each requested rank costs one
    * bucket-pruned scan of the persisted histogram — the profiling shape
    * (p50/p90/p99 in one sweep). Returns (pNum, pDen, value) per
    * requested fraction, empty when the input is empty.
    */
  def exactQuantiles(scores: DataFrame, valueCol: String,
                     fractions: Seq[(Long, Long)],
                     bucketShift: Int = 16): Seq[(Long, Long, Long)] = {
    fractions.foreach { case (pNum, pDen) =>
      require(pNum > 0 && pNum <= pDen, s"need 0 < $pNum/$pDen <= 1") }
    val hist = scores.groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("bucket", shiftright(col("v"), bucketShift))
      .persist()
    try {
      // bucket grid: tiny (range >> shift rows) — its global-ordered
      // window is the x87 grid trade, nothing like a corpus- or
      // histogram-wide sort
      val gridW = Window.orderBy(col("obucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = hist.groupBy(col("bucket").as("obucket"))
        .agg(sum(col("c")).as("t"))
        .withColumn("off", coalesce(sum(col("t")).over(gridW), lit(0L)))
      val offRows = off.select(col("obucket"), col("t"), col("off")).collect()
      val n = offRows.map(_.getAs[Long]("t")).sum
      if (n == 0) return Seq.empty
      // each target rank lands in exactly one bucket: off < m <= off + t.
      // Resolve ALL requested ranks from ONE job: collect just the target
      // buckets' histogram slices (bounded — ≤ 2^bucketShift distinct
      // values per bucket × the ≤|fractions| distinct target buckets,
      // value-range-bounded like the grid itself, never corpus-sized) and
      // walk each slice's cumulative count driver-side. One scan instead
      // of one job per rank — the fixed job overhead dominated the
      // per-rank cost, the arithmetic is unchanged.
      val wanted = fractions.map { case (pNum, pDen) =>
        // ceil(pNum·N/pDen) in BigInt: x122 passes rank-scale fractions
        // (pNum≈pDen≈N), so the pNum·n product overflows Long past ~3e9
        // rows — the 100 TB regime this derivation exists for.
        val m = ((BigInt(pNum) * n + pDen - 1) / pDen).toLong
        val tgt = offRows.find(r =>
          r.getAs[Long]("off") < m &&
            m <= r.getAs[Long]("off") + r.getAs[Long]("t")).get
        (pNum, pDen, m, tgt.getAs[Long]("obucket"), tgt.getAs[Long]("off"))
      }
      val buckets = wanted.map(_._4).distinct
      val slices = hist.filter(col("bucket").isin(buckets: _*))
        .select(col("bucket"), col("v"), col("c")).collect()
        .groupBy(_.getAs[Long]("bucket"))
        .map { case (b, rows) =>
          b -> rows.map(r => (r.getAs[Long]("v"), r.getAs[Long]("c")))
            .sortBy(_._1)
        }
      wanted.map { case (pNum, pDen, m, bucket, base) =>
        // cumulative within the bucket + the grid offset; smallest v
        // whose cumulative count reaches rank m
        var cum = base
        val slice = slices(bucket)
        var i = 0
        while (i < slice.length && cum + slice(i)._2 < m) {
          cum += slice(i)._2; i += 1
        }
        (pNum, pDen, slice(i)._1)
      }
    } finally { hist.unpersist(false): Unit }
  }
}
