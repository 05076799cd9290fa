package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for training-data pipelines: stopword-profile
  * language identification, winnowing document fingerprints, and BPE-style
  * regex tokenization — all single-scan, codegen'd column expressions (the
  * fingerprint op adds one bounded window).
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

  /** Language-ID: argmax of profile scores with first-profile-wins tie-break
    * (profiles are scored in sorted language order). Output:
    * (doc_id, pred_lang, score).
    */
  def languageId(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val scored = LangProfiles.foldLeft(docs) { case (d, (lang, markers)) =>
      d.withColumn(s"_s_$lang", langScore(col(textCol), markers))
    }
    val mx = greatest(LangProfiles.map { case (l, _) => col(s"_s_$l") }: _*)
    val pred = LangProfiles.foldRight(lit(null).cast(StringType): Column) {
      case ((lang, _), elseCol) =>
        when(col(s"_s_$lang") === mx, lit(lang)).otherwise(elseCol)
    }
    scored.select(col(idCol), pred.as("pred_lang"), mx.as("score"))
  }

  /** Winnowing fingerprints (Schleimer-Wilkerson-Aiken): hash every k-gram,
    * then keep the minimum hash of each sliding window of w consecutive
    * k-grams; the distinct kept hashes are the document's fingerprint set.
    * One explode + one bounded window + one distinct — no cross-doc work,
    * so the plan scales linearly with corpus size.
    * Output: (doc_id, fp) exploded fingerprint rows.
    */
  def winnowingFingerprints(docs: DataFrame, k: Int = 8, w: Int = 4,
                            textCol: String = "text",
                            idCol: String = "doc_id"): DataFrame = {
    val grams = docs.filter(length(col(textCol)) >= k)
      .select(col(idCol).as("doc_id"),
        posexplode(expr(
          s"transform(sequence(1, length($textCol) - ${k - 1}), i -> substring($textCol, i, $k))"))
          .as(Seq("pos", "gram")))
      .withColumn("h", xxhash64(col("gram")))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, w - 1)
    grams
      .withColumn("wmin", min(col("h")).over(win))
      .withColumn("maxpos", max(col("pos")).over(Window.partitionBy(col("doc_id"))))
      .filter(col("pos") <= col("maxpos") - (w - 1)) // only full windows
      .select(col("doc_id"), col("wmin").as("fp"))
      .distinct()
  }

  /** Aggregate fingerprint summary (bounded output for the driver gate). */
  def fingerprintSummary(docs: DataFrame): DataFrame =
    winnowingFingerprints(docs)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fp"), min("fp").as("min_fp"), max("fp").as("max_fp"))

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
