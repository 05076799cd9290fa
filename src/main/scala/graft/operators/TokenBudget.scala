package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Token-budget corpus cut: keep documents, in a deterministic hash order,
  * until each group's running token total reaches a budget — "give me B
  * tokens per language" is how training mixes are actually specified
  * (source/language budgets, not row counts).
  *
  * Semantics: within each group, order docs by (md5(doc_id), doc_id) — the
  * same stable, corpus-growth-insensitive order as x67/x68/x80 — and keep a
  * doc iff the running token sum INCLUDING it is <= budget.
  *
  * Scale shape — exact two-phase running sum, no per-group serialization:
  * the naive plan (`SUM OVER (PARTITION BY grp ORDER BY h)`) sorts each
  * group into ONE reducer, and one language can be half a 100 TB corpus.
  * Instead the hash order is split at its first two hex chars (256 range
  * buckets, monotonic with the full hash order since a fixed-width
  * lowercase-hex prefix sorts identically as string and as integer):
  *
  *  - phase 1: per-(group, bucket) token totals — one map-combined
  *    aggregate; the result is groups x 256 rows, collected and turned into
  *    EXCLUSIVE prefix offsets per group (driver work bounded by the tiny
  *    grid, never the corpus);
  *  - phase 2: the running sum within each (group, bucket) — 256-way
  *    parallel window sorts — plus the bucket's offset, broadcast-joined
  *    back.
  *
  * The result is bit-identical to the single-window plan (the spec asserts
  * exactly that); only the parallelism differs.
  */
object TokenBudget {

  /** Kept docs under a per-group token budget:
    * (doc_id, <groupCol>, n_tokens, cum_tokens). See class doc for the
    * order and the two-phase plan.
    */
  def budgetCut(docs: DataFrame, budget: Long, groupCol: String = "lang",
                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(
        col(idCol).cast(LongType).as("doc_id"),
        col(groupCol).as("grp"),
        size(split(col(textCol), "\\s+")).cast(LongType).as("n_tokens"),
        md5(col(idCol).cast(StringType)).as("h"))
      .withColumn("bucket",
        conv(substring(col("h"), 1, 2), 16, 10).cast(IntegerType))
    // phase 1: per-(group, bucket) totals -> exclusive prefix offsets.
    // groups x 256 rows — bounded by the grid, not the corpus.
    val grid = base.groupBy(col("grp"), col("bucket"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Int]("bucket"), r.getAs[Long]("t")))
    val offsets = grid.groupBy(_._1).toSeq.flatMap { case (g, cells) =>
      var acc = 0L
      cells.sortBy(_._2).map { case (_, b, t) =>
        val off = acc; acc += t; (g, b, off)
      }
    }
    val offDf = offsets.toDF("grp", "bucket", "off")
    // phase 2: 256-way-parallel within-bucket running sums + the offset
    val w = Window.partitionBy(col("grp"), col("bucket"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(offDf), Seq("grp", "bucket"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w) + col("off"))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("grp").as(groupCol),
        col("n_tokens"), col("cum_tokens"))
  }

  /** The naive one-window-per-group plan — the semantics oracle for
    * [[budgetCut]] (one reducer per group; test/verification use only).
    */
  def budgetCutNaive(docs: DataFrame, budget: Long, groupCol: String = "lang",
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val base = docs.select(
      col(idCol).cast(LongType).as("doc_id"),
      col(groupCol).as("grp"),
      size(split(col(textCol), "\\s+")).cast(LongType).as("n_tokens"),
      md5(col(idCol).cast(StringType)).as("h"))
    val w = Window.partitionBy(col("grp")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("grp").as(groupCol),
        col("n_tokens"), col("cum_tokens"))
  }
}
