package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for training-data pipelines: stopword-profile
  * language identification, winnowing document fingerprints, and BPE-style
  * regex tokenization — all single-scan plans (language-ID/tokenization as
  * codegen'd column expressions, fingerprints as a per-doc kernel).
  */
object TextAnalysis {

  /** Distinctive-stopword profiles (tiny, deterministic; a production system
    * would plug a trained n-gram model into the same argmax shape).
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "nicht", "das", "ist"),
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "los", "que", "y", "las", "una"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不"))

  /** Per-language stopword hit count over whitespace tokens. */
  private def langScore(textCol: Column, markers: Seq[String]): Column =
    size(filter(split(lower(textCol), " "), t => t.isin(markers: _*)))

  /** (pred_lang, score) columns for any text column — the stateless form,
    * reusable in batch and streaming plans alike. Argmax of profile scores
    * with first-profile-wins tie-break (profiles scored in declared order).
    */
  def langColumns(textCol: Column): (Column, Column) = {
    val scores = LangProfiles.map { case (lang, markers) =>
      lang -> langScore(textCol, markers)
    }
    val mx = greatest(scores.map(_._2): _*)
    val pred = scores.foldRight(lit(null).cast(StringType): Column) {
      case ((lang, sc), elseCol) => when(sc === mx, lit(lang)).otherwise(elseCol)
    }
    (pred, mx)
  }

  /** Language-ID: output (doc_id, pred_lang, score). */
  def languageId(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val (pred, mx) = langColumns(col(textCol))
    docs.select(col(idCol), pred.as("pred_lang"), mx.as("score"))
  }

  /** Per-doc stopword statistics against the doc's OWN language profile —
    * the Gopher-style quality rule ("a natural-language document contains
    * stopwords; keyword soup does not"): token count, stopword token
    * count (with multiplicity), their ratio, and the ≥2-stopwords gate.
    * One codegen'd map-only scan (the profile map is a literal; the token
    * filter runs as array HOFs inside the projection — no explode, no
    * shuffle). Languages without a profile score 0 hits — the gate then
    * fails, the production posture for unprofiled langs (route to manual
    * review, don't silently admit).
    */
  def stopwordStats(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id",
                    langCol: String = "lang"): DataFrame = {
    val profMap = map(LangProfiles.flatMap { case (l, ws) =>
      Seq(lit(l), array(ws.map(lit): _*))
    }: _*)
    val toks = filter(split(lower(col(textCol)), " "), t => length(t) > 0)
    val prof = coalesce(element_at(profMap, col(langCol)),
      array().cast("array<string>"))
    docs.select(col(idCol), col(langCol),
        size(toks).as("n_tokens"),
        size(filter(toks, t => array_contains(prof, t))).as("n_stop"))
      .select(col(idCol), col(langCol), col("n_tokens"), col("n_stop"),
        when(col("n_tokens") === 0, lit(null).cast(DoubleType))
          .otherwise(col("n_stop").cast(DoubleType) / col("n_tokens"))
          .as("stop_ratio"),
        when(col("n_stop") >= 2, 1).otherwise(0)
          .as("passes_stopword_gate"))
  }

  /** Winnowing fingerprints (Schleimer-Wilkerson-Aiken): hash every k-gram,
    * then keep the minimum hash of each sliding window of w consecutive
    * k-grams; the distinct kept hashes are the document's fingerprint set.
    *
    * Fingerprinting is a pure per-document function, so it runs as ONE
    * tight-loop kernel inside the scan ([[Kernels.winnowFps]]) — no k-gram
    * explode (~n_chars rows per doc), no shuffle, no window pass. Values are
    * bit-identical to an `xxhash64`-per-gram plan (same hash, same windows).
    * Output: (doc_id, fp) exploded fingerprint rows.
    */
  def winnowingFingerprints(docs: DataFrame, k: Int = 8, w: Int = 4,
                            textCol: String = "text",
                            idCol: String = "doc_id"): DataFrame =
    fingerprintArrays(docs, k, w, textCol, idCol)
      .select(col("doc_id"), explode(col("fps")).as("fp"))

  /** (doc_id, fps ARRAY<BIGINT>) distinct winnowing fingerprints per doc;
    * docs with no full gram window produce no row (matching the exploded
    * form's semantics).
    */
  def fingerprintArrays(docs: DataFrame, k: Int = 8, w: Int = 4,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val fpU = udf((text: String) => Kernels.winnowFps(text, k, w))
    docs.select(col(idCol).as("doc_id"), fpU(col(textCol)).as("fps"))
      .filter(size(col("fps")) > 0)
  }

  /** Aggregate fingerprint summary (bounded output for the driver gate) —
    * computed from the per-doc array with NO shuffle at all.
    */
  def fingerprintSummary(docs: DataFrame): DataFrame =
    fingerprintArrays(docs)
      .select(col("doc_id"), size(col("fps")).cast(LongType).as("n_fp"),
        array_min(col("fps")).as("min_fp"), array_max(col("fps")).as("max_fp"))

  /** Cross-document shared-span (boilerplate) statistics from winnowing
    * fingerprints: a fingerprint appearing in >= `minDocs` distinct docs
    * marks a SHARED span (license headers, templated pages, repeated
    * disclaimers — the substring-level duplication that document-level
    * dedup never sees). Output per doc:
    * (doc_id, n_fp, n_shared, shared_ratio) — the fraction of a document's
    * fingerprints lying on shared spans, the standard drop/trim signal for
    * substring-level curation.
    *
    * Plan shape at scale: fingerprints are a per-doc kernel (no gram
    * explode); the shared-fingerprint vocabulary is ONE map-combined
    * aggregation ((doc_id, fp) is distinct within a doc, so plain COUNT
    * counts distinct docs); marking is a broadcast join — the shared set
    * is the corpus's boilerplate vocabulary, bounded in practice (drop the
    * broadcast hint for a corpus where it is not); per-doc stats are a
    * second map-combined aggregation. `shared_ratio` is 4dp-rounded (the
    * division is the one non-integral output).
    */
  def sharedSpanStats(docs: DataFrame, minDocs: Int = 2,
                      k: Int = 8, w: Int = 4): DataFrame =
    sharedSpanStatsFromFps(winnowingFingerprints(docs, k, w), minDocs)

  /** [[sharedSpanStats]] over an ALREADY-FINGERPRINTED relation
    * (doc_id, fp) — the fingerprint-once entry point (round 18): both the
    * vocabulary and the scored side derive from ONE fp relation, so a
    * pipeline that persisted [[winnowingFingerprints]] (x81's registry
    * seat) pays two scans of 16-byte rows instead of two runs of the
    * winnowing kernel over the corpus text.
    */
  def sharedSpanStatsFromFps(fps: DataFrame, minDocs: Int = 2): DataFrame = {
    val vocab = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("fp"), lit(1).as("_sh"))
    fps.join(broadcast(vocab), Seq("fp"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(IntegerType).as("n_fp"),
        sum(coalesce(col("_sh"), lit(0))).cast(IntegerType).as("n_shared"))
      .withColumn("shared_ratio",
        round(col("n_shared").cast(DoubleType) / col("n_fp"), 4))
  }

  /** The shared-fingerprint vocabulary of a (reference) corpus: every
    * fingerprint appearing in >= `minDocs` distinct docs, as (fp, _sh=1)
    * rows ready for [[scoreAgainstVocab]]'s mark join. One map-combined
    * aggregation ((doc_id, fp) is distinct within a doc, so plain COUNT
    * counts distinct docs). For the streaming twin
    * ([[graft.streaming.CurationStreams.sharedSpans]]) build this ONCE
    * from the frozen reference corpus and reuse across micro-batches.
    */
  def sharedSpanVocab(refDocs: DataFrame, minDocs: Int = 2,
                      k: Int = 8, w: Int = 4): DataFrame =
    winnowingFingerprints(refDocs, k, w)
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("fp"), lit(1).as("_sh"))

  /** Score `docs` against a shared-span vocabulary: the mark join + per-doc
    * ratio shared VERBATIM by batch x82 and the streaming twin (`docs` may
    * be one micro-batch). Docs with no full gram window produce no row —
    * the fingerprint relation's own semantics.
    */
  def scoreAgainstVocab(docs: DataFrame, vocab: DataFrame,
                        k: Int = 8, w: Int = 4): DataFrame =
    winnowingFingerprints(docs, k, w)
      .join(broadcast(vocab), Seq("fp"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(IntegerType).as("n_fp"),
        sum(coalesce(col("_sh"), lit(0))).cast(IntegerType).as("n_shared"))
      .withColumn("shared_ratio",
        round(col("n_shared").cast(DoubleType) / col("n_fp"), 4))

  /** GPT-2-flavoured pretokenizer regex, restricted to constructs whose
    * semantics match between Java regex (Spark) and RE2 (DuckDB oracle).
    */
  val BpeTokenPattern: String = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  /** Token statistics under the BPE-ish pretokenizer:
    * (doc_id, n_tokens, n_unique).
    */
  def bpeTokenStats(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
        regexp_extract_all(col(textCol), lit(BpeTokenPattern), lit(0)).as("toks"))
      .select(col(idCol),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_unique"))
}
