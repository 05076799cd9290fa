package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Interpolated bigram language model — the order-2 step from [[UnigramLm]]
  * toward the 5-gram KenLM models CCNet-style perplexity filters actually
  * ship: p(w2|w1) interpolates an add-one-smoothed bigram conditional with
  * the unigram prior, and documents score by mean NLL over bigram
  * positions. The unigram side IS [[UnigramLm.train]]'s output — one model
  * family, one arithmetic contract.
  *
  * Model (all counts corpus totals, V/N from the unigram side):
  *   pb(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V + 1)     add-one over follows
  *   pu(w2)    = (c(w2) + 1) / (N + V + 1)            the x95 unigram
  *   p(w2|w1)  = λ·pb + (1−λ)·pu,  λ = [[BigramLm.Lambda]]
  * OOV w1/w2/bigram all reduce to the c=0 case of the same expressions, so
  * three broadcast LEFT joins + coalesce cover every path — no special
  * cases, and the DuckDB oracle replays the formula verbatim.
  *
  * Scale: identical posture to x95 — TRAIN is two map-side-combined
  * aggregations (the per-doc bigram kernel collapses positions to
  * distinct-bigrams-per-doc before the exchange; bigram vocabulary is the
  * heavy-tailed one, so `bigramCap` bounds the broadcast and the capped
  * tail backs off to c(bigram)=0, exactly KenLM pruning's behavior);
  * SCORE is map-only (three broadcast joins) + one map-combined
  * groupBy(doc_id). Per-position ln p is integer-scaled (×1e6, BIGINT) so
  * per-doc sums are exact in both engines.
  */
object BigramLm {

  /** Interpolation weight on the bigram conditional. */
  val Lambda = 0.75

  /** Per-doc (bg, w1, w2, tf) rows from the adjacent-pair kernel —
    * positions never cross a shuffle, the kernel pre-combines per doc.
    */
  def docBigramFreqs(docs: DataFrame): DataFrame = {
    val bigU = udf((t: String) => Kernels.bigramCounts(t))
    docs.select(col("doc_id"),
        explode(bigU(lower(col("text")))).as(Seq("bg", "tf")))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
  }

  /** Corpus bigram counts (bg, cb); `bigramCap` keeps only the top-cap
    * bigrams by (count desc, bg) — the dropped tail scores through the
    * cb=0 backoff path.
    */
  def trainBigrams(trainDocs: DataFrame, bigramCap: Option[Int] = None): DataFrame = {
    val counts = docBigramFreqs(trainDocs)
      .groupBy(col("bg")).agg(sum(col("tf")).as("cb"))
    bigramCap match {
      case None => counts
      case Some(cap) => counts.orderBy(col("cb").desc, col("bg")).limit(cap)
    }
  }

  /** Integer-scaled ln p(w2|w1); any of `cb`/`c1`/`c2` may be a left-join
    * miss (null → 0). Mirrored verbatim by [[oracleTermSql]].
    */
  def scaledLogProb(cb: Column, c1: Column, c2: Column,
                    nTotal: Column, v: Column): Column =
    round(log(
      lit(Lambda) * ((coalesce(cb, lit(0L)) + lit(1.0)) /
        (coalesce(c1, lit(0L)) + v + lit(1.0))) +
      lit(1.0 - Lambda) * ((coalesce(c2, lit(0L)) + lit(1.0)) /
        (nTotal + v + lit(1.0)))) * UnigramLm.LnScale)
      .cast(LongType)

  /** DuckDB twin of [[scaledLogProb]] — same operation tree. */
  def oracleTermSql(cb: String, c1: String, c2: String,
                    nTotal: String, v: String): String =
    s"CAST(ROUND(LN($Lambda * ((COALESCE($cb, 0) + 1.0) / (COALESCE($c1, 0) + $v + 1.0)) + " +
      s"${1.0 - Lambda} * ((COALESCE($c2, 0) + 1.0) / ($nTotal + $v + 1.0))) * " +
      s"${UnigramLm.LnScale}) AS BIGINT)"

  /** Score: (doc_id, n_bigrams, nll) — mean NLL in nats per bigram
    * position. Docs with fewer than two tokens have no positions and emit
    * no row (the oracle's GROUP BY agrees by construction).
    */
  def score(scoreDocs: DataFrame, bigrams: DataFrame,
            vocab: DataFrame, scalars: DataFrame): DataFrame = {
    val u1 = vocab.select(col("tok").as("w1"), col("c").as("c1"))
    val u2 = vocab.select(col("tok").as("w2"), col("c").as("c2"))
    val terms = docBigramFreqs(scoreDocs)
      .join(broadcast(bigrams), Seq("bg"), "left")
      .join(broadcast(u1), Seq("w1"), "left")
      .join(broadcast(u2), Seq("w2"), "left")
      .crossJoin(broadcast(scalars))
      .select(col("doc_id"), col("tf"),
        scaledLogProb(col("cb"), col("c1"), col("c2"),
          col("n_total"), col("v")).as("lp"))
    terms.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("lp")).as("sum_lp"))
      .select(col("doc_id"), col("n_bigrams"),
        round((-col("sum_lp")).cast(DoubleType) /
          (col("n_bigrams").cast(DoubleType) * UnigramLm.LnScale.toDouble), 6)
          .as("nll"))
  }

  /** Train-on/score-on the same corpus (the registry shape). */
  def selfScore(docs: DataFrame, bigramCap: Option[Int] = None,
                vocabCap: Option[Int] = None): DataFrame = {
    val (vocab, scalars) = UnigramLm.train(docs, vocabCap = vocabCap)
    score(docs, trainBigrams(docs, bigramCap), vocab, scalars)
  }
}
