package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-trained unigram language-model scoring — the CCNet/KenLM-style
  * "perplexity filter" of LLM-data curation, reduced to its Spark-native
  * core: train token frequencies on a reference corpus, score every
  * document by its mean negative log-likelihood, keep the low-perplexity
  * band. (Reference scope: the tank service has no text ops at all —
  * this extends SURVEY §2.7's curation family alongside x41/x63/x90.)
  *
  * Scale design:
  *  - TRAIN is one map-side-combined aggregation: the per-doc token-count
  *    kernel ([[Kernels.tokenCounts]]) collapses occurrences to
  *    (token, tf) rows BEFORE the exchange, so the shuffle carries
  *    per-doc-distinct tokens, never raw occurrences; the vocabulary
  *    relation that comes out is heavy-tailed-bounded (natural-language
  *    vocab grows ~O(corpus^0.5), Heaps' law) and `vocabCap` hard-bounds
  *    it for the 100 TB case — dropped tail tokens fall into the OOV
  *    probability path, which is exactly how CCNet's pruned KenLM models
  *    behave.
  *  - SCORE is map-only: the (token, ln p) relation broadcasts into the
  *    per-doc tf rows (left join + OOV coalesce), then one map-combined
  *    groupBy(doc_id) re-assembles per-doc sums. No corpus-sized shuffle
  *    carries more than (doc_id, tok, tf).
  *  - EXACTNESS: per-token log-probabilities are integer-scaled
  *    (round(ln p × 1e6) as BIGINT — the x73/x92 device) so the per-doc
  *    sum is exact integer arithmetic, order-independent across engines;
  *    only the final division back to a double is floating point, and it
  *    is a single deterministic op mirrored verbatim in the DuckDB oracle.
  *
  * Model: add-one (Laplace) smoothing over the training vocabulary —
  * p(tok) = (c(tok)+1)/(N+V+1), OOV mass p = 1/(N+V+1) — which is the
  * c=0 case of the same formula, so ONE left-join + coalesce(c, 0)
  * covers in-vocab and OOV tokens with a single expression.
  */
object UnigramLm {

  /** Integer scale for per-token ln p terms (6 decimal digits). */
  val LnScale = 1000000L

  /** Tokens shorter than this are ignored on BOTH the train and score
    * side (mirrors x71's vocabulary floor).
    */
  val MinTokenLen = 1

  /** Per-doc (tok, tf) rows from the lowercased whitespace tokenizer —
    * occurrences never cross a shuffle, the kernel pre-combines per doc.
    */
  def docTermFreqs(docs: DataFrame, minLen: Int = MinTokenLen): DataFrame = {
    val tokCounts = udf((t: String) => Kernels.tokenCounts(t, minLen))
    docs.select(col("doc_id"),
      explode(tokCounts(lower(col("text")))).as(Seq("tok", "tf")))
  }

  /** Train: (tok, c) vocabulary counts plus the (n_total, v) scalars the
    * smoothing formula needs, as a 2-element tuple of DataFrames. With
    * `vocabCap` set, only the top-`cap` tokens by (count desc, tok) keep
    * explicit entries — the tail scores through the OOV path — while
    * n_total / v are computed BEFORE the cap so capping never changes the
    * probability denominator, only which tokens get their own numerator.
    */
  def train(trainDocs: DataFrame, minLen: Int = MinTokenLen,
            vocabCap: Option[Int] = None): (DataFrame, DataFrame) = {
    val counts = docTermFreqs(trainDocs, minLen)
      .groupBy(col("tok")).agg(sum(col("tf")).as("c"))
    val scalars = counts.agg(
      sum(col("c")).as("n_total"), count(lit(1)).as("v"))
    val vocab = vocabCap match {
      case None => counts
      case Some(cap) =>
        // Global top-cap cut: ≤cap rows survive, so the single-partition
        // window runs over the SORTED-LIMITED prefix, not the full vocab.
        counts.orderBy(col("c").desc, col("tok")).limit(cap)
    }
    (vocab, scalars)
  }

  /** Integer-scaled ln p(tok) under add-one smoothing; `c` may be the
    * null of a left-join miss (OOV → c = 0). Mirrored verbatim by
    * [[oracleTermSql]] — edit both together.
    */
  def scaledLogProb(c: Column, nTotal: Column, v: Column): Column =
    round(log((coalesce(c, lit(0L)) + lit(1.0)) /
        (nTotal + v + lit(1.0))) * LnScale)
      .cast(LongType)

  /** DuckDB twin of [[scaledLogProb]]. */
  def oracleTermSql(c: String, nTotal: String, v: String): String =
    s"CAST(ROUND(LN((COALESCE($c, 0) + 1.0) / ($nTotal + $v + 1.0)) * $LnScale) AS BIGINT)"

  /** Score: per-doc token count and mean negative log-likelihood (nll,
    * nats/token — perplexity is exp(nll), monotone in it, so the FILTER
    * thresholds on nll directly and never computes the transcendental).
    * Output: (doc_id, n_toks, nll).
    */
  def score(scoreDocs: DataFrame, vocab: DataFrame, scalars: DataFrame,
            minLen: Int = MinTokenLen): DataFrame = {
    val terms = docTermFreqs(scoreDocs, minLen)
      .join(broadcast(vocab), Seq("tok"), "left")
      .crossJoin(broadcast(scalars))
      .select(col("doc_id"), col("tf"),
        scaledLogProb(col("c"), col("n_total"), col("v")).as("lp"))
    terms.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_toks"),
        sum(col("tf") * col("lp")).as("sum_lp"))
      .select(col("doc_id"), col("n_toks"),
        round((-col("sum_lp")).cast(DoubleType) /
          (col("n_toks").cast(DoubleType) * LnScale.toDouble), 6).as("nll"))
  }

  /** Train-on/score-on the same corpus (the registry shape). */
  def selfScore(docs: DataFrame, minLen: Int = MinTokenLen,
                vocabCap: Option[Int] = None): DataFrame = {
    val (vocab, scalars) = train(docs, minLen, vocabCap)
    score(docs, vocab, scalars, minLen)
  }

  /** Frozen model materialized driver-side for PER-ROW scoring — the
    * streaming-gate form: [[score]]'s join+groupBy shape would be a
    * stateful streaming aggregation, but with the (bounded — `vocabCap`)
    * model collected into a map, nll is a pure function of one row and
    * the stream stays stateless. Arithmetic is [[scaledLogProb]]'s,
    * mirrored in JVM code (same Math.log, same HALF_UP roundings), so
    * per-doc values are bit-identical to the batch [[score]] relation —
    * the spec asserts exactly that. Null for zero-token docs (the batch
    * relation omits them).
    */
  final case class FrozenModel(counts: Map[String, Long],
                               nTotal: Long, v: Long) extends Serializable {
    private def halfUp(x: Double, scale: Int): Double =
      BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

    private def term(c: Long): Long =
      BigDecimal(math.log((c + 1.0) / (nTotal + v + 1.0)) * LnScale)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact

    /** Mean NLL of one document (nats/token), or null if token-free. */
    def nll(text: String, minLen: Int = MinTokenLen): java.lang.Double = {
      if (text == null) return null
      val lowered = org.apache.spark.unsafe.types.UTF8String
        .fromString(text).toLowerCase.toString
      val tf = Kernels.tokenCounts(lowered, minLen)
      if (tf.isEmpty) return null
      var sum = 0L
      var n = 0L
      tf.foreach { case (tok, c) =>
        sum += c * term(counts.getOrElse(tok, 0L))
        n += c
      }
      halfUp(-sum.toDouble / (n.toDouble * LnScale), 6)
    }
  }

  /** Collect a trained (vocab, scalars) pair into a [[FrozenModel]] —
    * driver memory is bounded by `vocabCap` at train time.
    */
  def freeze(vocab: DataFrame, scalars: DataFrame): FrozenModel = {
    val s = scalars.collect().head
    FrozenModel(
      vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap,
      s.getLong(0), s.getLong(1))
  }

  // --------------------------------------------------- trained-model memo

  /** Session-scoped trained-model memo — the [[Bpe.trainCached]] device
    * applied to the unigram LM: training is a PRODUCER step, and
    * Verify/Bench invoke the registry entries that self-train (x115/x117/
    * x119) repeatedly over the same corpus, so the vocabulary aggregation
    * must not re-run per call. Key = application | corpus dir | variant |
    * params; `variant` distinguishes models trained on DERIVED text over
    * the same dir (x117 trains on span-REMOVED text — "cleaned-k5" — while
    * x115/x119 share the raw-corpus model).
    *
    * The memoized model is the COLLECTED (vocab, scalars) rows rebuilt
    * into local relations per call — driver residency is exactly the
    * bound [[score]]'s `broadcast(vocab)` already imposes (`vocabCap` at
    * 100 TB; the cap is part of the key), and rebuilt longs/strings are
    * bit-identical to the fresh relations, so a memo hit scores
    * identically to a fresh train (UnigramLmSpec asserts it).
    *
    * STALENESS WINDOW (same contract as [[Bpe.trainCached]], deliberate):
    * the key does not fingerprint corpus CONTENT — within one application
    * a hit ignores later appends to `dir`; the model is frozen at
    * first-training time (the production posture: LM filters are
    * versioned artifacts). Retrain = new application or [[invalidate]]
    * (store-mutating callers invalidate their dir — the x86-family
    * mutation verbs' posture; [[graft.server.TankServer.stop]] clears the
    * lot). Two bounds close the round-14 hygiene nits:
    *
    *  - the memo is a 32-entry access-ordered LRU, so a long-lived server
    *    session training many corpora cannot accumulate driver-resident
    *    vocab rows without end (each entry is already bounded by
    *    `vocabCap` when set);
    *  - a memo HIT through [[selfScoreCached]] (the strict-frame path
    *    every registry consumer uses) asserts the caller's
    *    training-relation SCHEMA equals the one the model was trained
    *    on — the key deliberately skips a content fingerprint (that
    *    would re-scan the corpus and defeat the memo), so an aliased
    *    (dir, variant) passing a differently-derived frame fails loudly
    *    instead of silently sharing one model. [[trainCached]]'s by-name
    *    thunk stays UNEVALUATED on a hit (its own spec-pinned contract),
    *    so the guard cannot run there.
    */
  private final case class Memo(docsSchema: StructType,
                                vocabRows: Array[org.apache.spark.sql.Row],
                                vocabSchema: StructType,
                                scalarRows: Array[org.apache.spark.sql.Row],
                                scalarSchema: StructType)

  private val MaxModels = 32

  private val models = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Memo](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Memo]): Boolean = size() > MaxModels
    })

  def trainCached(spark: org.apache.spark.sql.SparkSession, dir: String,
                  variant: String, docs: => DataFrame,
                  minLen: Int = MinTokenLen,
                  vocabCap: Option[Int] = None): (DataFrame, DataFrame) =
    trainCachedImpl(spark, dir, variant, docs, minLen, vocabCap, None)

  private def trainCachedImpl(spark: org.apache.spark.sql.SparkSession,
                              dir: String, variant: String,
                              docs: => DataFrame, minLen: Int,
                              vocabCap: Option[Int],
                              callerSchema: Option[StructType])
      : (DataFrame, DataFrame) = {
    val key = spark.sparkContext.applicationId + "|" +
      new java.io.File(dir).getAbsolutePath + "|" + variant + "|" + minLen +
      "|" + vocabCap.getOrElse(-1)
    val hit = models.get(key)
    val m = if (hit != null) {
      // cheapest observable that catches (dir, variant) aliasing — only
      // available on the strict-frame path (selfScoreCached); the by-name
      // path never evaluates its thunk on a hit
      callerSchema.foreach(cs => require(cs == hit.docsSchema,
        s"UnigramLm memo hit for ($dir, $variant) with a training " +
          s"relation of different schema — two call sites are aliasing " +
          s"one (dir, variant) key; pick distinct variant strings. " +
          s"memoized=${hit.docsSchema.simpleString} " +
          s"caller=${cs.simpleString}"))
      hit
    } else {
      val frame = docs
      val (vocab, scalars) = train(frame, minLen, vocabCap)
      val v = Memo(frame.schema, vocab.collect(), vocab.schema,
        scalars.collect(), scalars.schema)
      models.put(key, v)
      v
    }
    (spark.createDataFrame(
        java.util.Arrays.asList(m.vocabRows: _*), m.vocabSchema),
      spark.createDataFrame(
        java.util.Arrays.asList(m.scalarRows: _*), m.scalarSchema))
  }

  /** [[selfScore]] through the memo: train-on/score-on the same relation,
    * with the trained side cached per (application, dir, variant, params).
    */
  def selfScoreCached(spark: org.apache.spark.sql.SparkSession, dir: String,
                      variant: String, docs: DataFrame,
                      minLen: Int = MinTokenLen,
                      vocabCap: Option[Int] = None): DataFrame = {
    // corpus-kernel fan-out (round 18, util.Scans): every caller passes a
    // corpus-scale relation (raw documents or the cleaned-corpus
    // artifact), and both the memo-miss train pass and the per-call score
    // pass run the tokenize kernel over it — on the single-row-group
    // testdata that was 1 of N cores; a no-op on split inputs
    val fanned = graft.util.Scans.fanOutForKernels(docs)
    val (vocab, scalars) = trainCachedImpl(spark, dir, variant, fanned,
      minLen, vocabCap, Some(docs.schema))
    score(fanned, vocab, scalars, minLen)
  }

  private[graft] def invalidate(): Unit = models.clear()

  private[graft] def memoSize: Int = models.size()

  /** Drop every memoized model trained over `dir` (all variants/params) —
    * the hook a store-mutating verb calls so a post-append retrain sees
    * the new content (UnigramLmSpec gates the retrain).
    */
  private[graft] def invalidate(dir: String): Unit = {
    val seg = "|" + new java.io.File(dir).getAbsolutePath + "|"
    models.synchronized {
      models.keySet.removeIf(_.contains(seg)): Unit
    }
  }
}
