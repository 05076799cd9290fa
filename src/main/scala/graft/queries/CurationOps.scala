package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Kernels

/** Training-data curation extensions x61–x66: text normalization, PII-style
  * redaction, within-doc repetition scoring (Gopher-style quality signal),
  * URL/domain extraction, per-label embedding centroids and int8 vector
  * quantization.
  *
  * The synthetic corpus contains no URLs/emails/decomposed unicode, so the
  * redaction/extraction/normalization queries derive deterministic
  * pattern-bearing text from existing columns (same device as the Q26–Q30
  * synthetic points, FIXTURES.md §B1) — the DuckDB oracle reproduces the
  * derivation with identical arithmetic, so the operators are exercised on
  * real matches and still hash-checked.
  *
  * Scale notes: x61/x62/x63/x66 are per-row kernels or codegen'd regex
  * expressions — one scan, no shuffle (x63's trigram stats come from a
  * tight-loop per-doc kernel, not a corpus-wide explode). x64 shuffles only
  * extracted URLs (rows ≈ matches, not tokens); x65 shuffles (label, pos)
  * partial aggregates — both map-side-combined groupBys that hold at 100 TB.
  */
object CurationOps {

  def defs: Seq[QueryDef] =
    Seq(x61_normalize, x62_redact, x63_repetition, x64_urls,
      x65_label_centroids, x66_quantize)

  // ---------------------------------------------------------------- x61
  /** Unicode NFC + whitespace normalization. The messy input wraps `text`
    * with leading blanks/tab, a trailing NBSP and a decomposed e+COMBINING
    * ACUTE so every normalization step observably fires.
    */
  val x61_normalize: QueryDef = QueryDef(
    "x61_normalize",
    Sql.canon(
      """SELECT doc_id, CAST(LENGTH(messy) AS INT) AS n_raw,
        |  CAST(LENGTH(norm) AS INT) AS n_norm,
        |  MD5(norm) AS norm_hash
        |FROM (
        |  SELECT doc_id, messy,
        |    TRIM(regexp_replace(nfc_normalize(messy),
        |      '[ '||chr(9)||chr(10)||chr(13)||chr(160)||']+', ' ', 'g')) AS norm
        |  FROM (SELECT doc_id,
        |          '  '||chr(9)||text||chr(160)||'cafe'||chr(769) AS messy
        |        FROM documents))""".stripMargin,
      Seq("doc_id", "n_raw", "n_norm", "norm_hash"))) { (s, d) =>
    val nfc = udf((t: String) =>
      if (t == null) null
      else java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC))
    // NBSP + decomposed e+COMBINING ACUTE: NFC composes, the regex eats NBSP
    val messy = concat(lit("  \t"), col("text"), lit("\u00A0cafe\u0301"))
    val norm = trim(regexp_replace(nfc(messy), "[ \t\n\r\u00A0]+", " "))
    Canon(Tables.documents(s, d).select(
      col("doc_id"),
      length(messy).as("n_raw"),
      length(norm).as("n_norm"),
      md5(norm).as("norm_hash")))
  }

  // ---------------------------------------------------------------- x62
  private val EmailRe = "[a-z0-9]+@[a-z0-9.]+[a-z]"
  private val IpRe = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
  private val PhoneRe = "555-[0-9]+"

  /** PII-style regex redaction: count and mask synthetic email/IP/phone
    * patterns. Character-class regexes only, identical under Java regex and
    * RE2.
    */
  val x62_redact: QueryDef = QueryDef(
    "x62_redact",
    Sql.canon(
      s"""SELECT doc_id,
         |  CAST(LEN(regexp_extract_all(aug, '$EmailRe')) AS INT) AS n_email,
         |  CAST(LEN(regexp_extract_all(aug, '$IpRe')) AS INT) AS n_ip,
         |  CAST(LEN(regexp_extract_all(aug, '$PhoneRe')) AS INT) AS n_phone,
         |  MD5(regexp_replace(regexp_replace(regexp_replace(aug,
         |    '$EmailRe', '<EMAIL>', 'g'),
         |    '$IpRe', '<IP>', 'g'),
         |    '$PhoneRe', '<PHONE>', 'g')) AS red_hash
         |FROM (SELECT doc_id,
         |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@' ||
         |    source || '.org from 10.' || CAST(doc_id % 256 AS VARCHAR) ||
         |    '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) ||
         |    ' call 555-01' || CAST(doc_id % 90 + 10 AS VARCHAR) AS aug
         |  FROM documents)""".stripMargin,
      Seq("doc_id", "n_email", "n_ip", "n_phone", "red_hash"))) { (s, d) =>
    val aug = concat(col("text"), lit(" contact user"),
      col("doc_id").cast(StringType), lit("@"), col("source"),
      lit(".org from 10."), (col("doc_id") % 256).cast(StringType),
      lit(".0."), ((col("doc_id") * 7) % 256).cast(StringType),
      lit(" call 555-01"), (col("doc_id") % 90 + 10).cast(StringType))
    val red = regexp_replace(regexp_replace(regexp_replace(aug,
      EmailRe, "<EMAIL>"), IpRe, "<IP>"), PhoneRe, "<PHONE>")
    Canon(Tables.documents(s, d).select(
      col("doc_id"),
      size(regexp_extract_all(aug, lit(EmailRe), lit(0))).as("n_email"),
      size(regexp_extract_all(aug, lit(IpRe), lit(0))).as("n_ip"),
      size(regexp_extract_all(aug, lit(PhoneRe), lit(0))).as("n_phone"),
      md5(red).as("red_hash")))
  }

  // ---------------------------------------------------------------- x63
  /** Within-doc word-trigram repetition (Gopher-style quality signal):
    * 1 − distinct/total trigrams, from a per-doc tight-loop kernel (one
    * scan, no explode). Single double division — deterministic cross-engine.
    */
  val x63_repetition: QueryDef = QueryDef(
    "x63_repetition",
    Sql.canon(
      """WITH tri AS (
        |  SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
        |  FROM (
        |    SELECT doc_id, toks,
        |      UNNEST(generate_series(1, GREATEST(LEN(toks) - 2, 0))) AS i
        |    FROM (SELECT doc_id, STR_SPLIT(text, ' ') AS toks FROM documents)
        |    WHERE LEN(toks) >= 3))
        |SELECT doc_id, COUNT(*) AS n_tri, COUNT(DISTINCT sh) AS n_uniq,
        |  1.0 - CAST(COUNT(DISTINCT sh) AS DOUBLE) / COUNT(*) AS rep_ratio
        |FROM tri GROUP BY doc_id""".stripMargin,
      Seq("doc_id", "n_tri", "n_uniq", "rep_ratio"))) { (s, d) =>
    val stats = udf((t: String) => Kernels.triStats(t))
    Canon(Tables.documents(s, d)
      .select(col("doc_id"), stats(col("text")).as("st"))
      .filter(size(col("st")) === 2)
      .select(col("doc_id"),
        col("st").getItem(0).as("n_tri"),
        col("st").getItem(1).as("n_uniq"))
      .withColumn("rep_ratio",
        lit(1.0) - col("n_uniq").cast(DoubleType) / col("n_tri")))
  }

  // ---------------------------------------------------------------- x64
  private val UrlRe = "https?://[a-z0-9./-]+"

  /** URL extraction + per-domain stats over deterministically augmented
    * text (two URLs injected per doc from `source`/`lang`/`doc_id`).
    */
  val x64_urls: QueryDef = QueryDef(
    "x64_urls",
    Sql.canon(
      s"""WITH urls AS (
         |  SELECT doc_id, UNNEST(regexp_extract_all(aug, '$UrlRe')) AS url
         |  FROM (SELECT doc_id,
         |      text || ' see https://' || source || '.example.com/p/' ||
         |      CAST(doc_id % 50 AS VARCHAR) || ' and http://mirror-' || lang ||
         |      '.example.net/d/' || CAST(doc_id % 7 AS VARCHAR) AS aug
         |    FROM documents))
         |SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS domain,
         |  COUNT(*) AS n_urls, COUNT(DISTINCT doc_id) AS n_docs
         |FROM urls GROUP BY domain""".stripMargin,
      Seq("domain", "n_urls", "n_docs"))) { (s, d) =>
    val aug = concat(col("text"), lit(" see https://"), col("source"),
      lit(".example.com/p/"), (col("doc_id") % 50).cast(StringType),
      lit(" and http://mirror-"), col("lang"), lit(".example.net/d/"),
      (col("doc_id") % 7).cast(StringType))
    Canon(Tables.documents(s, d)
      .select(col("doc_id"),
        explode(regexp_extract_all(aug, lit(UrlRe), lit(0))).as("url"))
      .select(col("doc_id"),
        regexp_extract(col("url"), "^https?://([^/]+)", 1).as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs")))
  }

  // ---------------------------------------------------------------- x65
  /** Per-label embedding centroids (the curation primitive behind cluster
    * sampling / balancing). Components are integer-scaled exact sums
    * (Canon protocol) so partial-aggregation order cannot ULP-drift the
    * result; output is one row per (label, dimension).
    */
  val x65_label_centroids: QueryDef = QueryDef(
    "x65_label_centroids",
    Sql.canon(
      s"""SELECT label, CAST(i - 1 AS INT) AS pos,
         |  ${Sql.scaledSum("CAST(embedding[i] AS DOUBLE)", 1000000L)}/COUNT(*) AS centroid
         |FROM (SELECT label, embedding, UNNEST(generate_series(1, 64)) AS i
         |      FROM embeddings)
         |GROUP BY label, i""".stripMargin,
      Seq("label", "pos", "centroid"))) { (s, d) =>
    Canon(Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg((Canon.scaledSum(col("v").cast(DoubleType), 1000000L) /
        count(lit(1))).as("centroid")))
  }

  // ---------------------------------------------------------------- x66
  /** Symmetric int8 quantization of every embedding (per-vector scale =
    * 127/max|x|), exploded to (vec_id, pos, q) rows. Per-row kernel — one
    * scan, no shuffle.
    */
  val x66_quantize: QueryDef = QueryDef(
    "x66_quantize",
    Sql.canon(
      """SELECT vec_id, CAST(i - 1 AS INT) AS pos,
        |  CASE WHEN m = 0 THEN 0
        |       ELSE CAST(FLOOR(CAST(embedding[i] AS DOUBLE)/m*127 + 0.5) AS INT)
        |  END AS q
        |FROM (
        |  SELECT vec_id, embedding,
        |    LIST_AGGREGATE(LIST_TRANSFORM(embedding,
        |      x -> ABS(CAST(x AS DOUBLE))), 'max') AS m,
        |    UNNEST(generate_series(1, 64)) AS i
        |  FROM embeddings)""".stripMargin,
      Seq("vec_id", "pos", "q"))) { (s, d) =>
    val qz = udf((e: Seq[Float]) => Kernels.quantizeInt8(e.toArray))
    Canon(Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(qz(col("embedding"))).as(Seq("pos", "q"))))
  }
}
