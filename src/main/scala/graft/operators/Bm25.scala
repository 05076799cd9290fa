package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BM25 retrieval: the top-k documents per query over a whitespace-token
  * corpus — the ranked-retrieval primitive a training-data pipeline runs
  * for benchmark decontamination triage ("which corpus docs does this eval
  * question retrieve?"), targeted quality audits, and seed-set expansion.
  * (The tank reference has no text retrieval; this extends the x71 TF-IDF
  * surface with the standard Okapi scorer — Robertson & Spärck Jones'
  * published formula with the `ln(1 + (N-df+0.5)/(df+0.5))` idf, k1=1.2,
  * b=0.75.)
  *
  * Scale shape (what survives a 100 TB corpus):
  *
  *  - ONE corpus scan produces the term-frequency relation already filtered
  *    to query terms: the per-doc token map is built by the shared
  *    [[Kernels.tokenCounts]] kernel and `map_filter`ed against the tiny
  *    broadcast term set BEFORE `explode`, so the exploded relation is
  *    candidate-sized (docs x matched-terms), never corpus-token-sized.
  *    The doc length rides along from the same map (`aggregate` over its
  *    values) — no corpus-sized doc-length join.
  *  - Corpus stats (N, total token count) come from a second map-only scan
  *    reduced to ONE row; document frequencies from a map-combined groupBy
  *    of the candidate relation. Both join back as broadcasts.
  *  - Per-query top-k is the two-phase bucketed rank (same device as x87's
  *    token-budget cut): a first `row_number` over (query, doc-hash-bucket)
  *    keeps k per bucket in parallel, the global rank then orders only
  *    buckets x k survivors — no one-reducer-per-query corpus sort. The
  *    result is bit-identical to the naive single-window rank (union of
  *    per-bucket top-k is a superset of the global top-k); Bm25Spec asserts
  *    exactly that.
  *
  * Determinism contract with the DuckDB oracle: per-term contributions are
  * computed with a textually-mirrored operation sequence (identical
  * literals and association on both sides) and integer-scaled to BIGINT
  * per term, so the per-(query, doc) score is an exact, order-independent
  * integer sum — same device as x73's distances. Ties rank by doc_id.
  */
object Bm25 {

  /** Minimum token length (code points) — matches x71's tokenizer filter. */
  val MinTokenLen = 4

  /** Per-term BM25 contribution, integer-scaled. Column inputs: `tf`, `dl`,
    * `df`, `n_docs`, `sum_dl`. Literals (2.2 = k1+1, 1.2 = k1,
    * 0.25 = 1-b, 0.75 = b, 1000000 = scale) and association are mirrored
    * verbatim by the oracle SQL in
    * [[graft.queries.CurationOps.x92_bm25]] — change either side only in
    * lockstep.
    */
  private[graft] def contribution: Column = {
    val avgdl = col("sum_dl").cast(DoubleType) / col("n_docs")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = col("tf") * lit(2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
    round(idf * tfNorm * lit(1000000)).cast(LongType)
  }

  /** (query_id, doc_id, score_scaled, rn) — top `k` docs per query, scores
    * as exact integer-scaled BIGINTs, rn dense from 1 ordered by
    * (score desc, doc_id).
    */
  def topK(docs: DataFrame, queries: Seq[(Int, String)], k: Int,
           buckets: Int = 32): DataFrame =
    rankTopK(scores(docs, queries), k, buckets)

  /** Query-term normalization — the ONE definition both the transient
    * scan ([[scores]]) and the persisted index ([[Bm25Store.query]]) use,
    * which MUST stay bit-identical to the postings-side `lower()`:
    * UTF8String.toLowerCase = Spark's locale-independent `lower`; Java's
    * String.toLowerCase is default-locale-sensitive (Turkish 'I' →
    * dotless ı would silently match zero postings).
    */
  def queryTerms(queries: Seq[(Int, String)]): Seq[(Int, String)] =
    queries.flatMap { case (qid, q) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(q)
        .toLowerCase.toString.split("\\s+").toSeq.distinct.map(t => (qid, t))
    }

  /** Exact per-(query, doc) scores for every doc matching >= 1 query term. */
  def scores(docs: DataFrame, queries: Seq[(Int, String)]): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    val qterms = queryTerms(queries)
    val termSet = qterms.map(_._2).distinct.sorted
    val terms = typedlit(termSet)
    val tokUdf = udf((t: String) => Kernels.tokenCounts(t, MinTokenLen))
    val dlUdf = udf((t: String) => Kernels.tokenCount(t, MinTokenLen))

    // Candidate relation: one corpus scan, term filter INSIDE the map
    // (pre-explode), doc length from the same kernel output.
    val tf = docs
      .select(col("doc_id"), tokUdf(lower(col("text"))).as("m"))
      .select(
        col("doc_id"),
        aggregate(map_values(col("m")), lit(0L), (a, x) => a + x).as("dl"),
        explode(map_filter(col("m"), (t, _) => array_contains(terms, t)))
          .as(Seq("tok", "tf")))

    // Corpus stats: map-only scan reduced to one broadcastable row.
    val stats = docs
      .select(dlUdf(lower(col("text"))).as("dl0"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl0")).as("sum_dl"))

    // Document frequency per query term: candidate-sized, map-combined.
    val dfRel = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val qRel = qterms.toDF("query_id", "tok")

    tf.join(broadcast(dfRel), "tok")
      .join(broadcast(qRel), "tok")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), contribution.as("c"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("score_scaled"))
  }

  /** Two-phase top-k: per-(query, bucket) rank in parallel, then a global
    * rank over the buckets x k survivors. Bit-identical to [[rankNaive]].
    */
  private[graft] def rankTopK(scored: DataFrame, k: Int,
                              buckets: Int): DataFrame = {
    val wLocal = Window
      .partitionBy(col("query_id"), col("bucket"))
      .orderBy(col("score_scaled").desc, col("doc_id"))
    val survivors = scored
      .withColumn("bucket", pmod(col("doc_id"), lit(buckets)))
      .withColumn("lrn", row_number().over(wLocal))
      .filter(col("lrn") <= k)
    val wGlobal = Window
      .partitionBy(col("query_id"))
      .orderBy(col("score_scaled").desc, col("doc_id"))
    survivors
      .withColumn("rn", row_number().over(wGlobal))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("doc_id"), col("score_scaled"), col("rn"))
  }

  /** The one-window reference plan (oracle shape) — spec-only comparator:
    * one reducer sees every candidate of a query, which is exactly what
    * [[rankTopK]] exists to avoid.
    */
  private[graft] def rankNaive(scored: DataFrame, k: Int): DataFrame = {
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("score_scaled").desc, col("doc_id"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("doc_id"), col("score_scaled"), col("rn"))
  }
}
