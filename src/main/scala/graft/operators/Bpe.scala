package graft.operators

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TRAINED byte-pair-encoding subword tokenizer — the tokenizer-token
  * denomination real training-data budgeting and packing are specified in
  * (x50's regex count approximates tokens; a trained merge table IS the
  * tokenizer). Sennrich et al.'s published BPE recipe, Spark-first:
  *
  *  - ONE corpus-scale shuffle total: the whitespace word-count aggregate
  *    ([[wordCounts]]). Everything after runs on the VOCABULARY relation
  *    (distinct words × counts — memory-bounded per partition, and orders
  *    of magnitude smaller than the corpus at any scale).
  *  - training = `numMerges` rounds; each round is one map-combined
  *    pair-count aggregation over the vocabulary relation plus a top-1 row
  *    to the driver (ties broken lexicographically → fully deterministic).
  *    Driver state is the merge table itself — K rows, never data.
  *  - encode = map-only with the BROADCAST merge table (the same
  *    corpus-model-broadcast shape as [[UnigramLm.score]]), with a
  *    per-task word→length memo (Zipf makes the memo hit rate ~1).
  *
  * Merges never cross word boundaries (words are whitespace-split, as in
  * the published recipe minus the end-of-word marker — a marker is one
  * extra initial symbol, nothing in the machinery changes). Pair counts
  * count overlapping occurrences ("aaa" holds (a,a) twice), as the
  * reference implementation does.
  *
  * The greedy rank-order encoder ([[encodeWord]]) and the naive
  * sequential-replay encoder ([[encodeWordSequential]]) provably agree on
  * TRAINED tables (a merge can only create pairs of LATER rank: a rule
  * referencing rule i's output symbol was necessarily learned after i), and
  * BpeSpec differential-gates exactly that — plus the distributed trainer
  * against a local reference trainer.
  */
object Bpe {

  /** One learned merge rule: at `rank`, adjacent (left, right) → left+right. */
  final case class Merge(rank: Int, left: String, right: String)

  // ------------------------------------------------------------- kernels

  /** A word's initial symbol sequence: one symbol per Unicode CODE POINT,
    * not per UTF-16 code unit — Spark's `split(w, "")` (Java regex) keeps
    * supplementary characters whole, so the local training/encoding paths
    * must too or the two trainers' symbol alphabets diverge on non-BMP
    * text (a lone-surrogate "symbol" also breaks round-tripping).
    */
  private[graft] def charSyms(word: String): IndexedSeq[String] = {
    val out = new ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toIndexedSeq
  }

  /** One left-to-right merge pass of (l, r) → l+r over a symbol sequence —
    * the single definition both encoders and the trainer's vocabulary
    * update share.
    */
  def applyMerge(syms: IndexedSeq[String], l: String,
                 r: String): IndexedSeq[String] = {
    if (syms.length < 2) return syms
    val out = new ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** PRODUCTION encoder: repeatedly merge the lowest-rank pair present
    * (all its occurrences, left-to-right) until no learned pair remains.
    * O(len · merges-applied), independent of table size K.
    */
  def encodeWord(word: String,
                 ranks: Map[(String, String), Int]): IndexedSeq[String] = {
    var syms: IndexedSeq[String] = charSyms(word)
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var bl: String = null
      var br: String = null
      var i = 0
      while (i + 1 < syms.length) {
        val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < best) { best = rk; bl = syms(i); br = syms(i + 1) }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        syms = applyMerge(syms, bl, br)
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** NAIVE REFERENCE encoder — replay every merge in rank order, one full
    * pass each (the training-time definition of the encoding; O(len · K)).
    * Exists to differential-gate [[encodeWord]].
    */
  def encodeWordSequential(word: String,
                           merges: Seq[Merge]): IndexedSeq[String] =
    merges.sortBy(_.rank).foldLeft(charSyms(word)) {
      case (s, m) => applyMerge(s, m.left, m.right)
    }

  // ------------------------------------------------------------- training

  /** (w, n) whitespace word counts — the ONE corpus-scale shuffle. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).cast(LongType).as("n"))

  /** Vocabulary size (distinct whitespace words) up to which the merge
    * loop runs driver-local on the collected vocabulary relation. This is
    * the published production architecture (SentencePiece / HF tokenizers:
    * distributed count, local merges) — the corpus-scale cost is the word
    * count, and a 100 TB English-ish corpus has ~1e7–1e8 distinct words,
    * most below any useful `minPairCount`. Above the cap the distributed
    * round path takes over; BpeSpec differential-gates the two paths equal.
    */
  private[graft] val MaxLocalVocab = 4_000_000L

  /** Train `numMerges` merge rules: ONE corpus-scale word-count shuffle,
    * then K greedy merge rounds over the VOCABULARY relation (ties broken
    * (count desc, left asc, right asc) → fully deterministic). Rounds run
    * driver-local when the vocabulary fits [[MaxLocalVocab]] (the standard
    * production shape — K rounds of O(vocab) map-reduce in memory, no
    * per-round job latency), else as distributed aggregations
    * ([[trainDistributedRounds]] — same recipe, gated identical). Stops
    * early when no pair reaches `minPairCount` (merging singleton noise
    * would just memorize the corpus).
    */
  def train(docs: DataFrame, numMerges: Int, minPairCount: Long = 2L,
            textCol: String = "text"): Seq[Merge] = {
    val wc = wordCounts(docs, textCol).persist()
    try {
      if (wc.count() <= MaxLocalVocab) {
        val vocab = wc.collect().map(r =>
          (charSyms(r.getString(0)), r.getLong(1)))
        trainVocabRounds(vocab, numMerges, minPairCount)
      } else trainDistributedRounds(wc, numMerges, minPairCount)
    } finally { wc.unpersist(false): Unit }
  }

  /** Tie-break collation for equal pair counts: Spark sorts strings in
    * UTF-8 BINARY order (UTF8String), while Java's `compareTo` is UTF-16
    * code-unit order — the two DISAGREE for supplementary characters
    * (U+10000+, UTF-16 surrogates 0xD800–0xDBFF) vs U+E000..U+FFFF. The
    * local rounds must tie-break on the UTF-8 byte order or the two
    * training paths (switched at [[MaxLocalVocab]]) could learn different
    * merge tables on non-BMP corpora (differential-gated in BpeSpec,
    * including a supplementary-plane fixture).
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  private def pairLtUtf8(a: (String, String), b: (String, String)): Boolean =
    if (a._1 != b._1) utf8Lt(a._1, b._1) else utf8Lt(a._2, b._2)

  /** The merge loop over an in-memory vocabulary: per round, one O(vocab)
    * overlapping-adjacent-pair count, argmax, merge. Exactly the recipe
    * [[trainDistributedRounds]] runs as Spark aggregations.
    */
  private[graft] def trainVocabRounds(vocab0: Array[(IndexedSeq[String], Long)],
                                      numMerges: Int,
                                      minPairCount: Long): Seq[Merge] = {
    var vocab = vocab0
    val merges = new ArrayBuffer[Merge]()
    var stop = false
    while (merges.length < numMerges && !stop) {
      val counts = new java.util.HashMap[(String, String), Long]()
      var vi = 0
      while (vi < vocab.length) {
        val (syms, n) = vocab(vi)
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.merge(k, n, (a, b) => a + b): Unit
          i += 1
        }
        vi += 1
      }
      var best: ((String, String), Long) = null
      counts.forEach { (k, c) =>
        if (best == null || c > best._2 ||
          (c == best._2 && pairLtUtf8(k, best._1)))
          best = (k, c)
      }
      if (best == null || best._2 < minPairCount) stop = true
      else {
        val (l, r) = best._1
        merges += Merge(merges.length, l, r)
        vocab = vocab.collect {
          case (syms, n) if syms.length >= 2 => (applyMerge(syms, l, r), n)
          case kept => kept
        }
      }
    }
    merges.toSeq
  }

  /** Distributed merge rounds over the vocabulary relation — the
    * above-[[MaxLocalVocab]] scale path. Each round: adjacent symbol pairs
    * via slice/zip_with (no corpus explode), weighted by word count, ONE
    * map-combined aggregation, top-1 to the driver, merge applied
    * executor-side. The updated vocabulary is `localCheckpoint`ed each
    * round — plan lineage MUST be truncated or K rounds nest K cached
    * plans deep and plan maintenance dominates (observed: OOM at K=40
    * from quadratic plan-string rendering alone).
    */
  private[graft] def trainDistributedRounds(wc: DataFrame, numMerges: Int,
                                            minPairCount: Long): Seq[Merge] = {
    // split("") can emit a trailing empty string (Java regex, limit -1) —
    // drop empties so initial symbols are exactly the characters
    var words = wc
      .select(filter(split(col("w"), ""), s => length(s) > 0).as("syms"),
        col("n"))
      .localCheckpoint(true)
    val merges = new ArrayBuffer[Merge]()
    var stop = false
    while (merges.length < numMerges && !stop) {
      val nMinus1 = size(col("syms")) - 1
      val top = words.filter(size(col("syms")) >= 2)
        .select(explode(zip_with(
          slice(col("syms"), lit(1), nMinus1),
          slice(col("syms"), lit(2), nMinus1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"), col("n"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getAs[Long]("cnt") < minPairCount) stop = true
      else {
        val l = top.head.getAs[String]("l")
        val r = top.head.getAs[String]("r")
        merges += Merge(merges.length, l, r)
        val mergeU = udf((syms: Seq[String]) =>
          applyMerge(syms.toIndexedSeq, l, r))
        words = words.select(mergeU(col("syms")).as("syms"), col("n"))
          .localCheckpoint(true)
      }
    }
    merges.toSeq
  }

  /** Session-scoped trained-model memo keyed by (application, corpus dir,
    * K) — training is a PRODUCER step like the index stores: Verify/Bench
    * run the registry entries repeatedly over the same corpus and must not
    * re-train per call. Invalidate-free by design: the key pins the corpus
    * dir, and a new application re-trains.
    *
    * STALENESS WINDOW (deliberate, like the index stores' producer
    * contract): the key does NOT fingerprint corpus CONTENT, so within one
    * application a hit ignores files appended to `dir` after the first
    * train (e.g. by a streaming sink) — the model is frozen at
    * first-training time, which is the production posture (tokenizers are
    * versioned artifacts, not live views; retrain = new application or
    * [[invalidate]]). The key also pins the DEFAULT `minPairCount`/
    * `textCol`: a caller needing non-default training parameters must call
    * [[train]] directly — routing them through this memo would silently
    * return a model trained with different parameters.
    */
  private val models = new ConcurrentHashMap[String, Seq[Merge]]()

  def trainCached(spark: SparkSession, dir: String, docs: => DataFrame,
                  numMerges: Int): Seq[Merge] = {
    val key = spark.sparkContext.applicationId + "|" +
      new java.io.File(dir).getAbsolutePath + "|" + numMerges
    models.computeIfAbsent(key, _ => train(docs, numMerges))
  }

  private[graft] def invalidate(): Unit = models.clear()

  // ------------------------------------------------------------- encoding

  /** Serializable per-task counting closure: the ranks table rides the
    * closure (K entries — broadcast-threshold small), the memo is
    * per-deserialized-instance (= per task) so no synchronization, bounded
    * at `MemoCap` entries (Zipf: the hot head is what matters).
    */
  private final class Counter(ranks: Map[(String, String), Int])
      extends (String => Int) with Serializable {
    @transient private lazy val memo =
      new java.util.HashMap[String, Integer]()
    private val MemoCap = 1 << 16
    def apply(text: String): Int = {
      if (text == null) return 0
      var total = 0
      val words = text.split("\\s+")
      var i = 0
      while (i < words.length) {
        val w = words(i)
        if (w.nonEmpty) {
          val cached = memo.get(w)
          if (cached != null) total += cached.intValue()
          else {
            val n = encodeWord(w, ranks).length
            if (memo.size < MemoCap) memo.put(w, Integer.valueOf(n)): Unit
            total += n
          }
        }
        i += 1
      }
      total
    }
  }

  private def ranksOf(merges: Seq[Merge]): Map[(String, String), Int] =
    merges.map(m => (m.left, m.right) -> m.rank).toMap

  /** Map-only per-doc BPE token counts: every column of `docs` except
    * `textCol`, plus `n_tokens`. The merge table rides to the executors in
    * the task closure; the text column is consumed by the kernel and never
    * shuffled.
    */
  def tokenCounts(docs: DataFrame, merges: Seq[Merge],
                  textCol: String = "text"): DataFrame = {
    val counter = new Counter(ranksOf(merges))
    val cnt = udf((text: String) => counter(text))
    val keep = docs.columns.filterNot(_ == textCol).map(col)
    docs.select(keep :+
      cnt(col(textCol)).cast(LongType).as("n_tokens"): _*)
  }

  /** The merge table as a DataFrame (rank, left, right) — the registry/
    * persistence shape of a trained tokenizer.
    */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("rank", "left", "right")
  }

  /** Persist a trained tokenizer (K-row parquet). A tokenizer outlives
    * the application that trained it — every later pipeline run must
    * encode with the SAME merges or token budgets shift silently.
    */
  def save(spark: SparkSession, path: String, merges: Seq[Merge]): Unit =
    mergeTable(spark, merges).coalesce(1)
      .write.mode("overwrite").parquet(path)

  /** Load a persisted merge table; ranks re-validated dense + ordered
    * (a hole would silently change every encoding downstream).
    */
  def load(spark: SparkSession, path: String): Seq[Merge] = {
    val merges = spark.read.parquet(path)
      .select(col("rank").cast(IntegerType), col("left"), col("right"))
      .collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_.rank).toSeq
    require(merges.map(_.rank) == merges.indices,
      s"corrupt merge table at $path: ranks not dense from 0")
    merges
  }
}
