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
