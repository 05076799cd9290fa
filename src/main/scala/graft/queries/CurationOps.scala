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
      x65_label_centroids, x66_quantize, x67_split, x68_balance,
      x69_pack, x69b_pack_bpe, x70_decontaminate, x71_tfidf,
      x73_cluster_assign,
      x74_pipeline, x80_source_mix, x83_chunk, x87_token_budget,
      x87b_token_budget_bpe,
      x88_train_order, x88b_train_order_sized, x90_curation_audit,
      x92_bm25, x94_hybrid_rrf, x94b_hybrid_rrf_store, x96_heavy_hitters,
      x98_source_kl,
      x101_curation_v2, x115_percentile_gate, x117_curation_v3,
      x119_nll_quantiles)

  // ---------------------------------------------------------------- x90
  /** Gate thresholds the x90 REGISTRY entry pins (and its oracle replays);
    * production calls [[curationAudit]] with its own corpus-derived values.
    * Small here so every gate fires at every verify SF.
    */
  private[graft] val AuditMinTokens = 25
  private[graft] val AuditMaxTokens = 90
  private[graft] val AuditMaxRepetition = 0.02

  /** Per-doc curation AUDIT operator: every gate's verdict for every
    * document in ONE scan — the explainable version of x74's composed
    * pipeline (which emits only survivors + a summary). Production curation
    * needs this relation to answer "why was doc X dropped" and to tune
    * thresholds from gate co-occurrence, without running N separate gate
    * scans — which is also why the thresholds are ARGUMENTS, not literals:
    * tuning loops re-run the audit at candidate settings.
    *
    * One projection evaluates all gates (token count from the split, the
    * repetition ratio from the per-doc trigram kernel — no explode, no
    * shuffle); `kept` is the conjunction.
    */
  def curationAudit(docs: org.apache.spark.sql.DataFrame,
                    minTokens: Int = AuditMinTokens,
                    maxTokens: Int = AuditMaxTokens,
                    maxRepetition: Double = AuditMaxRepetition)
      : org.apache.spark.sql.DataFrame = {
    val stats = udf((t: String) => Kernels.triStats(t))
    val base = docs.select(
      col("doc_id"), col("lang"),
      size(split(col("text"), "\\s+")).as("n_tokens"),
      stats(col("text")).as("st"))
    val rr = when(size(col("st")) === 2,
      lit(1.0) - col("st").getItem(1).cast(DoubleType) / col("st").getItem(0))
      .otherwise(lit(0.0))
    val tooShort = col("n_tokens") < minTokens
    val tooLong = col("n_tokens") > maxTokens
    val repetitive = rr > maxRepetition
    base.select(col("doc_id"), col("lang"), col("n_tokens"),
      tooShort.as("too_short"), tooLong.as("too_long"),
      repetitive.as("repetitive"),
      (!(tooShort || tooLong || repetitive)).as("kept"))
  }

  /** The x90 registry entry: [[curationAudit]] at the pinned thresholds.
    * The oracle replays the token arithmetic inline and the repetition gate
    * via x63's exploded-trigram form, LEFT-joined so <3-token docs audit as
    * non-repetitive (the kernel's empty-result contract).
    */
  val x90_curation_audit: QueryDef = QueryDef(
    "x90_curation_audit",
    Sql.canon(
      """WITH s AS (
        |  SELECT doc_id, lang,
        |    CAST(LEN(string_split_regex(text, '\s+')) AS INT) AS n_tokens
        |  FROM documents),
        |tri AS (
        |  SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
        |  FROM (
        |    SELECT doc_id, toks,
        |      UNNEST(generate_series(1, GREATEST(LEN(toks) - 2, 0))) AS i
        |    FROM (SELECT doc_id, STR_SPLIT(text, ' ') AS toks FROM documents)
        |    WHERE LEN(toks) >= 3)),
        |rep AS (
        |  SELECT doc_id,
        |    1.0 - CAST(COUNT(DISTINCT sh) AS DOUBLE) / COUNT(*) AS rr
        |  FROM tri GROUP BY doc_id)
        |SELECT s.doc_id, s.lang, s.n_tokens,
        |  s.n_tokens < 25 AS too_short,
        |  s.n_tokens > 90 AS too_long,
        |  COALESCE(rep.rr, 0.0) > 0.02 AS repetitive,
        |  NOT (s.n_tokens < 25 OR s.n_tokens > 90
        |       OR COALESCE(rep.rr, 0.0) > 0.02) AS kept
        |FROM s LEFT JOIN rep ON s.doc_id = rep.doc_id""".stripMargin,
      Seq("doc_id", "lang", "n_tokens", "too_short", "too_long", "repetitive",
        "kept"))) { (s, d) =>
    // delegate to the OPERATOR (defaults = the pinned constants) so the
    // oracle-verified harness exercises curationAudit itself — no second
    // inline copy to drift from it
    Canon(curationAudit(Tables.documents(s, d)))
  }

  // ---------------------------------------------------------------- x88
  /** Deterministic training-order sharding — the last materialization step
    * before writing training shards: every doc gets a (shard, pos) address
    * from a hash-derived global shuffle, so the training order is
    * reproducible from doc ids alone (no RNG state, stable under re-runs)
    * and any shard can be re-written independently.
    *
    * Shard = md5-bucket (the x67 device, mod `TrainShards`); pos =
    * row_number within the shard in (hash, doc_id) order. The operator is
    * [[graft.operators.Sharding]]: `trainOrder` (fixed count — the
    * registry pins 16 for the oracle) and `trainOrderBySize` (production —
    * derives the count as ceil(n/docsPerShard) via a broadcast one-row
    * aggregate, the x69 device).
    */
  private[graft] val TrainShards = 16

  val x88_train_order: QueryDef = QueryDef(
    "x88_train_order",
    Sql.canon(
      s"""SELECT doc_id, CAST(shard AS INT) AS shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
         |       AS INT) AS pos
         |FROM (SELECT doc_id, MD5(CAST(doc_id AS VARCHAR)) AS h,
         |  CAST(CAST('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8)
         |       AS BIGINT) % $TrainShards AS INT) AS shard
         |  FROM documents)""".stripMargin,
      Seq("doc_id", "shard", "pos"))) { (s, d) =>
    // delegate to the OPERATOR so the oracle-verified harness exercises
    // Sharding.trainOrder itself (x90's de-drift device)
    Canon(graft.operators.Sharding.trainOrder(
      Tables.documents(s, d), TrainShards))
  }

  /** docsPerShard the x88b REGISTRY entry pins (and its oracle replays);
    * production picks its own target size. 150 so the derived count is
    * plural at every verify SF (4 shards at 500 docs, 34 at 5000).
    */
  private[graft] val TrainDocsPerShard = 150L

  /** The PRODUCTION form of x88: the shard count is not pinned but derived
    * from a target shard SIZE — ceil(n / docsPerShard), the same derivation
    * x69 uses for pack shards. The oracle replays the derivation as a
    * scalar subquery; the Spark side is
    * [[graft.operators.Sharding.trainOrderBySize]]'s broadcast one-row
    * aggregate (no driver collect, no second keyed pass).
    */
  val x88b_train_order_sized: QueryDef = QueryDef(
    "x88b_train_order_sized",
    Sql.canon(
      s"""SELECT doc_id, CAST(shard AS INT) AS shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
         |       AS INT) AS pos
         |FROM (SELECT doc_id, MD5(CAST(doc_id AS VARCHAR)) AS h,
         |  CAST(CAST('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8)
         |       AS BIGINT)
         |    % (SELECT GREATEST(1, CAST(CEIL(COUNT(*) / $TrainDocsPerShard.0)
         |         AS BIGINT)) FROM documents) AS INT) AS shard
         |  FROM documents)""".stripMargin,
      Seq("doc_id", "shard", "pos"))) { (s, d) =>
    Canon(graft.operators.Sharding.trainOrderBySize(
      Tables.documents(s, d), TrainDocsPerShard))
  }

  // ---------------------------------------------------------------- x87
  /** Per-language token-budget cut ([[graft.operators.TokenBudget]]): keep
    * docs in deterministic (md5(doc_id), doc_id) order until each language
    * holds `TokenBudgetPerLang` tokens — training mixes are specified in
    * tokens per source/language, not rows. The production plan is the
    * two-phase exact running sum (256 hash-prefix range buckets, per-bucket
    * offsets from a window over the groups×256 grid — no driver collect,
    * TokenBudget.scala — 256-way-parallel window sorts); the oracle is the
    * semantically-identical one-window form.
    */
  private[graft] val TokenBudgetPerLang = 2000L

  /** x87's denomination shift: the SAME budget cut, but counted in TRAINED
    * tokenizer tokens ([[graft.operators.Bpe.tokenCounts]] over the x105
    * merge table) — training mixes are specified in tokenizer tokens, and
    * whitespace counts mis-budget by the compression ratio. The oracle
    * replays the one-window form over the exact counts the SAME Verify run
    * persisted as x106's output (`__VERIFY_OUT__` device), so the
    * budget/ordering arithmetic is fully oracle-checked even though the
    * encoder itself has no SQL twin.
    */
  private[graft] val TokenBudgetPerLangBpe = 8000L

  val x87b_token_budget_bpe: QueryDef = QueryDef(
    "x87b_token_budget_bpe",
    Sql.canon(
      s"""SELECT doc_id, lang, n_tokens, cum_tokens FROM (
         |  SELECT doc_id, lang, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM (SELECT doc_id, lang, n_tokens, MD5(CAST(doc_id AS VARCHAR)) AS h
         |        FROM read_parquet('__VERIFY_OUT__/x106_bpe_encode/*.parquet')))
         |WHERE cum_tokens <= $TokenBudgetPerLangBpe""".stripMargin,
      Seq("doc_id", "lang", "n_tokens", "cum_tokens"))) { (s, d) =>
    val merges = graft.operators.Bpe.trainCached(
      s, d, Tables.documents(s, d), TextOps.NumBpeMerges)
    val counts = graft.operators.Bpe.tokenCounts(
      Tables.documents(s, d).select("doc_id", "lang", "text"), merges)
    Canon(graft.operators.TokenBudget.budgetCutFromCounts(
      counts, TokenBudgetPerLangBpe))
  }

  val x87_token_budget: QueryDef = QueryDef(
    "x87_token_budget",
    Sql.canon(
      s"""SELECT doc_id, lang, n_tokens, cum_tokens FROM (
         |  SELECT doc_id, lang, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM (SELECT doc_id, lang,
         |    CAST(LEN(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens,
         |    MD5(CAST(doc_id AS VARCHAR)) AS h FROM documents))
         |WHERE cum_tokens <= $TokenBudgetPerLang""".stripMargin,
      Seq("doc_id", "lang", "n_tokens", "cum_tokens"))) { (s, d) =>
    Canon(graft.operators.TokenBudget.budgetCut(
      Tables.documents(s, d), TokenBudgetPerLang))
  }

  // ---------------------------------------------------------------- x83
  /** Long-document chunking with overlap — the window/stride split every
    * training pipeline runs before sequence packing (x69 packs pieces;
    * this CUTS long docs into max-`ChunkTokens` pieces with
    * `ChunkTokens - ChunkStride` tokens of overlap so no span is lost at a
    * boundary). Starts are `0, stride, 2·stride, …` up to the last window
    * that reaches the tail; a doc of <= ChunkTokens tokens yields exactly
    * one chunk. Map-only: tokenize + per-row sequence explode + slice —
    * no shuffle at any corpus size (the canonical ORDER BY is the driver-
    * compare artifact). The oracle replays the identical start arithmetic
    * (shared double-ceil form) and slicing.
    */
  private[graft] val ChunkTokens = 64
  private[graft] val ChunkStride = 48

  val x83_chunk: QueryDef = QueryDef(
    "x83_chunk",
    Sql.canon(
      s"""SELECT doc_id, CAST(i AS INT) AS chunk_id,
         |  CAST(i * $ChunkStride AS INT) AS start_tok,
         |  CAST(LEN(toks[i * $ChunkStride + 1 : i * $ChunkStride + $ChunkTokens]) AS INT) AS n_tokens,
         |  ARRAY_TO_STRING(toks[i * $ChunkStride + 1 : i * $ChunkStride + $ChunkTokens], ' ') AS chunk_text
         |FROM (
         |  SELECT doc_id, toks,
         |    UNNEST(generate_series(0,
         |      CASE WHEN LEN(toks) <= $ChunkTokens THEN 0
         |           ELSE CAST(CEIL((LEN(toks) - $ChunkTokens) / CAST($ChunkStride AS DOUBLE)) AS INT) END)) AS i
         |  FROM (SELECT doc_id, STR_SPLIT(text, ' ') AS toks FROM documents))""".stripMargin,
      Seq("doc_id", "chunk_id", "start_tok", "n_tokens", "chunk_text"))) { (s, d) =>
    Canon(chunkWithOverlap(Tables.documents(s, d), ChunkTokens, ChunkStride))
  }

  /** The operator itself: (doc_id, chunk_id, start_tok, n_tokens,
    * chunk_text) windows of `window` whitespace tokens every `stride`.
    */
  def chunkWithOverlap(docs: org.apache.spark.sql.DataFrame,
                       window: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(stride > 0 && window >= stride,
      s"need 0 < stride ($stride) <= window ($window) so chunks tile the doc")
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("_n", size(col("toks")))
      .select(col("doc_id"), col("toks"),
        explode(expr(
          s"""sequence(0, CASE WHEN _n <= $window THEN 0
             |  ELSE CAST(ceil((_n - $window) / CAST($stride AS DOUBLE)) AS INT) END)"""
            .stripMargin)).as("chunk_id"))
      .withColumn("_ctoks", expr(s"slice(toks, chunk_id * $stride + 1, $window)"))
      .select(col("doc_id"), col("chunk_id").cast(IntegerType).as("chunk_id"),
        (col("chunk_id") * stride).cast(IntegerType).as("start_tok"),
        size(col("_ctoks")).as("n_tokens"),
        array_join(col("_ctoks"), " ").as("chunk_text"))
  }

  // ---------------------------------------------------------------- x80
  /** Training-mix downsampling: each source is kept at its own target rate
    * (basis points out of 10,000) by a deterministic per-doc hash
    * threshold — the standard way to hit a domain-mixture recipe (e.g.
    * upweight books, downweight boilerplate web) without a shuffle: the
    * keep decision is a map-side expression, reproducible across runs and
    * cluster sizes, and composable with the dedup/quality gates. Here the
    * rate derives from the source number (2000/4500/7000 bps cycling) so
    * the oracle replays it exactly; production passes a real weights map.
    */
  val x80_source_mix: QueryDef = QueryDef(
    "x80_source_mix",
    Sql.canon(
      """SELECT source, CAST(keep_bps AS INT) AS keep_bps,
        |  CAST(COUNT(*) AS BIGINT) AS n_kept
        |FROM (
        |  SELECT source,
        |    CAST('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |      % 10000 AS h,
        |    CAST(SUBSTRING(source, 4) AS INT) % 3 * 2500 + 2000 AS keep_bps
        |  FROM documents)
        |WHERE h < keep_bps
        |GROUP BY source, keep_bps""".stripMargin,
      Seq("source", "keep_bps", "n_kept"))) { (s, d) =>
    val h = conv(substring(md5(col("doc_id").cast(StringType)), 1, 8), 16, 10)
      .cast(LongType) % 10000
    val bps = substring(col("source"), 4, 10).cast(IntegerType) % 3 * 2500 + 2000
    Canon(Tables.documents(s, d)
      .withColumn("h", h)
      .withColumn("keep_bps", bps)
      .filter(col("h") < col("keep_bps"))
      .groupBy(col("source"), col("keep_bps"))
      .agg(count(lit(1)).as("n_kept"))
      .select(col("source"), col("keep_bps").cast(IntegerType), col("n_kept")))
  }

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
    val qz = udf((e: Seq[Float]) =>
      Kernels.quantizeInt8(if (e == null) null else e.toArray))
    Canon(Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(qz(col("embedding"))).as(Seq("pos", "q"))))
  }

  // ---------------------------------------------------------------- x67
  /** Deterministic train/val/test split (80/10/10) keyed by an md5 bucket
    * of doc_id — stable under re-runs, re-partitioning and corpus growth
    * (a doc's split never changes when other docs are added), which random
    * splits are not. Pure per-row arithmetic: one scan, no shuffle.
    */
  val x67_split: QueryDef = QueryDef(
    "x67_split",
    Sql.canon(
      """SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |  CAST(CAST('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8)
        |       AS BIGINT) % 100 AS INT) AS bucket
        |  FROM documents)""".stripMargin,
      Seq("doc_id", "bucket", "split"))) { (s, d) =>
    val bucket = (conv(substring(md5(col("doc_id").cast(StringType)), 1, 8),
      16, 10).cast(LongType) % 100).cast(IntegerType)
    Canon(Tables.documents(s, d)
      .select(col("doc_id"), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val").otherwise("test")))
  }

  // ---------------------------------------------------------------- x68
  /** Per-language balanced downsample: keep K docs per lang, selected by a
    * deterministic hash order (not head-of-table order, which would bias
    * toward low doc_ids). One shuffle on lang; rank state per partition.
    */
  val x68_balance: QueryDef = QueryDef(
    "x68_balance",
    Sql.canon(
      """SELECT doc_id, lang, CAST(rn AS INT) AS rn
        |FROM (SELECT doc_id, lang,
        |  ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 50""".stripMargin,
      Seq("doc_id", "lang", "rn"))) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
    Canon(Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 50))
  }

  // ---------------------------------------------------------------- x69
  /** Docs-per-shard target for x69's pack sharding. Small here so the
    * derivation is exercised at every verify SF (25-docs-per-source at
    * sf0.01 already fans out to 2 shards); a production corpus would use
    * ~10⁵ docs/shard — the point is that shard COUNT derives from data, not
    * a hard-coded knob.
    */
  private[graft] val PackShardDocs = 16

  /** Shard assignment for sequence packing: each source gets
    * ceil(n_source / perShard) shards and every doc picks one by md5 hash —
    * deterministic, oracle-replayable, and sized by the DATA (a source
    * holding most of a 100 TB corpus fans out to proportionally many
    * independent pack streams instead of a fixed 8). The per-source counts
    * are a map-side-combined agg broadcast back onto the scan.
    */
  private[graft] def packShards(docs: org.apache.spark.sql.DataFrame,
                                perShard: Int): org.apache.spark.sql.DataFrame = {
    val counts = docs.groupBy(col("source"))
      .agg(ceil(count(lit(1)).cast(DoubleType) / perShard).as("_n_shards"))
    docs.join(broadcast(counts), "source")
      .withColumn("shard",
        conv(substring(md5(col("doc_id").cast(StringType)), 1, 8), 16, 10)
          .cast(LongType) % col("_n_shards"))
      .drop("_n_shards")
  }

  /** Greedy sequence packing into 2048-token bins, sequential WITHIN each
    * (source, shard) partition, where each source's shard count derives
    * from its doc count ([[packShards]]: ceil(n/perShard), doc → shard by
    * md5 hash) — a deterministic sub-key so a corpus with a handful of hot
    * sources never serializes through one window partition's sort, and the
    * fan-out GROWS with the source instead of capping at a fixed knob.
    * Emits each doc's shard, bin id within the shard, and start offset;
    * docs may straddle bins (sequential-fill model).
    */
  val x69_pack: QueryDef = QueryDef(
    "x69_pack",
    Sql.canon(
      s"""WITH c AS (
        |  SELECT source,
        |    CAST(CEIL(CAST(COUNT(*) AS DOUBLE) / $PackShardDocs) AS BIGINT)
        |      AS n_shards
        |  FROM documents GROUP BY source)
        |SELECT source, shard, doc_id, CAST(n_tok AS INT) AS n_tok,
        |  CAST(FLOOR(CAST(cum - n_tok AS DOUBLE) / 2048) AS BIGINT) AS bin,
        |  CAST((cum - n_tok) % 2048 AS BIGINT) AS off
        |FROM (
        |  SELECT source, shard, doc_id, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM (SELECT d.source, d.doc_id,
        |          CAST('0x' || SUBSTRING(MD5(CAST(d.doc_id AS VARCHAR)), 1, 8)
        |               AS BIGINT) % c.n_shards AS shard,
        |          LEN(STR_SPLIT(d.text, ' ')) AS n_tok
        |        FROM documents d JOIN c ON d.source = c.source))""".stripMargin,
      Seq("source", "shard", "doc_id", "n_tok", "bin", "off"))) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val before = col("cum") - col("n_tok")
    Canon(packShards(Tables.documents(s, d), PackShardDocs)
      .select(col("source"), col("doc_id"), col("shard"),
        size(split(col("text"), " ")).as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("source"), col("shard"), col("doc_id"), col("n_tok"),
        floor(before.cast(DoubleType) / 2048).cast(LongType).as("bin"),
        (before % 2048).as("off")))
  }

  /** x69's denomination shift, like x87b: identical shard/bin/offset
    * arithmetic, but over TRAINED tokenizer token counts — bins hold 2048
    * model tokens, which is what "2048-token context" means. Oracle
    * replays the pack over x106's persisted counts.
    */
  val x69b_pack_bpe: QueryDef = QueryDef(
    "x69b_pack_bpe",
    Sql.canon(
      s"""WITH t AS (SELECT doc_id, source, n_tokens
        |  FROM read_parquet('__VERIFY_OUT__/x106_bpe_encode/*.parquet')),
        |c AS (
        |  SELECT source,
        |    CAST(CEIL(CAST(COUNT(*) AS DOUBLE) / $PackShardDocs) AS BIGINT)
        |      AS n_shards
        |  FROM t GROUP BY source)
        |SELECT source, shard, doc_id, CAST(n_tok AS INT) AS n_tok,
        |  CAST(FLOOR(CAST(cum - n_tok AS DOUBLE) / 2048) AS BIGINT) AS bin,
        |  CAST((cum - n_tok) % 2048 AS BIGINT) AS off
        |FROM (
        |  SELECT source, shard, doc_id, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM (SELECT t.source, t.doc_id,
        |          CAST('0x' || SUBSTRING(MD5(CAST(t.doc_id AS VARCHAR)), 1, 8)
        |               AS BIGINT) % c.n_shards AS shard,
        |          t.n_tokens AS n_tok
        |        FROM t JOIN c ON t.source = c.source))""".stripMargin,
      Seq("source", "shard", "doc_id", "n_tok", "bin", "off"))) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val merges = graft.operators.Bpe.trainCached(
      s, d, Tables.documents(s, d), TextOps.NumBpeMerges)
    val counts = graft.operators.Bpe.tokenCounts(
      Tables.documents(s, d).select("doc_id", "source", "text"), merges)
    val w = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val before = col("cum") - col("n_tok")
    Canon(packShards(counts, PackShardDocs)
      .select(col("source"), col("doc_id"), col("shard"),
        col("n_tokens").cast(IntegerType).as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("source"), col("shard"), col("doc_id"), col("n_tok"),
        floor(before.cast(DoubleType) / 2048).cast(LongType).as("bin"),
        (before % 2048).as("off")))
  }

  // ---------------------------------------------------------------- x70
  /** Benchmark decontamination: per corpus doc, count of distinct word
    * trigrams shared with the benchmark set (source = 'src0' stands in for
    * the eval suite), flag docs at >= 5 overlaps. The benchmark side is
    * DISTINCT shingles BEFORE the join, so fan-out is bounded by the corpus
    * shingle count (never corpus-docs x bench-docs per common trigram).
    *
    * The corpus side is BLOOM-PRUNED before the join: a bloom filter over
    * the (small, eval-suite-sized) benchmark trigrams rides to the mappers
    * in a broadcast and drops non-matching corpus trigrams BEFORE the join
    * exchange — at 100 TB the shuffle carries only probable matches (~1%
    * false positives), not every trigram of the corpus. False positives are
    * harmless: the exact equi-join behind the filter still decides
    * membership, so the result is bit-identical to the unpruned plan.
    * Building the filter makes this builder eager (two small jobs over the
    * benchmark side at construction).
    */
  val x70_decontaminate: QueryDef = QueryDef(
    "x70_decontaminate",
    Sql.canon(
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, source,
        |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
        |  FROM (
        |    SELECT doc_id, source, toks,
        |      UNNEST(generate_series(1, GREATEST(LEN(toks) - 2, 0))) AS i
        |    FROM (SELECT doc_id, source, STR_SPLIT(text, ' ') AS toks
        |          FROM documents)
        |    WHERE LEN(toks) >= 3)),
        |bench AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0'),
        |overlap AS (
        |  SELECT s.doc_id, COUNT(*) AS n_overlap
        |  FROM sh s JOIN bench b ON s.sh = b.sh
        |  WHERE s.source <> 'src0'
        |  GROUP BY s.doc_id)
        |SELECT d.doc_id, COALESCE(o.n_overlap, 0) AS n_overlap,
        |  CAST(CASE WHEN COALESCE(o.n_overlap, 0) >= 5 THEN 1 ELSE 0 END
        |       AS INT) AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
        |LEFT JOIN overlap o ON d.doc_id = o.doc_id""".stripMargin,
      Seq("doc_id", "n_overlap", "contaminated"))) { (s, d) =>
    val docs = Tables.documents(s, d)
    // the bloom-prune + exact-join core is shared verbatim with the
    // streaming twin (graft.streaming.CurationStreams.decontaminate)
    val bench = graft.operators.Decontaminate.benchSide(
      docs.filter(col("source") === "src0"))
    // release the suite-sized cache now that count + bloom are built: the
    // returned LAZY plan recomputes the (small) bench side at execution
    // instead of pinning cached blocks for the session lifetime (this
    // builder has no eager materialization point to hook an unpersist on)
    bench.release()
    Canon(graft.operators.Decontaminate.score(
      docs.filter(col("source") =!= "src0"), bench, threshold = 5))
  }

  // ---------------------------------------------------------------- x71
  /** TF-IDF top-5 terms per document. tf comes from the per-doc token-count
    * kernel (distinct-token rows, not token occurrences, cross the shuffle);
    * idf joins the document-frequency relation back — two map-side-combined
    * aggregations and one equi-join. Scores are rounded to 4dp BEFORE the
    * per-doc rank so the top-5 cut is identical cross-engine (ln is
    * transcendental; ranking raw doubles could cut differently at a ULP).
    *
    * The tf⋈df join is SALTED ([[graft.operators.SkewJoin.saltedJoin]]): a
    * corpus-common token ("information", any stopword-adjacent 4+-char term)
    * appears in a large fraction of ALL documents, so a plain token-keyed
    * shuffle funnels a corpus-sized row set into the one reducer owning that
    * key — the single-hot-key shape AQE's skew splitting cannot fix.
    * Salting spreads each token's tf rows over 8 deterministic sub-keys and
    * replicates only the tiny unique-per-token df side 8×; semantics are
    * exactly the inner equi-join's.
    */
  val x71_tfidf: QueryDef = QueryDef(
    "x71_tfidf",
    Sql.canon(
      """WITH tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf
        |  FROM (SELECT doc_id,
        |          UNNEST(string_split_regex(LOWER(text), '\s+')) AS tok
        |        FROM documents)
        |  WHERE LENGTH(tok) >= 4
        |  GROUP BY doc_id, tok),
        |df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY tok),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.tok,
        |    ROUND(tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)), 4) AS tfidf
        |  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, tok, tfidf,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, tok) AS rn
        |  FROM scored)
        |SELECT doc_id, tok, tfidf, CAST(rn AS INT) AS rn
        |FROM ranked WHERE rn <= 5""".stripMargin,
      Seq("doc_id", "tok", "tfidf", "rn"))) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val tokCounts = udf((t: String) => Kernels.tokenCounts(t, 4))
    val tf = docs
      .select(col("doc_id"), explode(tokCounts(lower(col("text")))).as(Seq("tok", "tf")))
    val dfRel = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .withColumnRenamed("tok", "_tok_df")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = graft.operators.SkewJoin
      .saltedJoin(tf, dfRel, "tok", "_tok_df")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("tok"),
        round(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 4)
          .as("tfidf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("tok"))
    Canon(scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5))
  }

  // ---------------------------------------------------------------- x92
  /** The x92 REGISTRY query set (production passes its own): three
    * multi-term queries over the synthetic corpus vocabulary. The oracle's
    * VALUES list is generated from this Seq so the two sides cannot drift.
    */
  private[graft] val Bm25QuerySet: Seq[(Int, String)] = Seq(
    1 -> "vector hash join",
    2 -> "window merge sort",
    3 -> "stream batch query")

  private[graft] val Bm25TopK = 10

  /** BM25 ranked retrieval ([[graft.operators.Bm25]]): top-10 docs per
    * query, exact integer-scaled scores. The Spark plan is the bucketed
    * two-phase rank over a candidate-sized (map-filtered-before-explode)
    * term relation with broadcast df/query/stats sides; the oracle is the
    * naive corpus-wide form. Contribution arithmetic is mirrored verbatim
    * — see [[graft.operators.Bm25.contribution]] before editing either.
    */
  /** The x92 oracle CTE chain (`q` … `ranked`), shared with x94's fusion
    * oracle so the BM25 arithmetic cannot drift between the two.
    */
  private def bm25Ctes: String =
    s"""q(query_id, tok) AS (VALUES ${bm25QueryValues(Bm25QuerySet)}),
       |toks AS (
       |  SELECT doc_id, tok FROM (
       |    SELECT doc_id,
       |      UNNEST(string_split_regex(LOWER(text), '\\s+')) AS tok
       |    FROM documents)
       |  WHERE LENGTH(tok) >= ${graft.operators.Bm25.MinTokenLen}),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
       |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
       |       WHERE tok IN (SELECT tok FROM q) GROUP BY doc_id, tok),
       |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
       |stats AS (SELECT
       |  (SELECT COUNT(*) FROM documents) AS n_docs,
       |  (SELECT CAST(COALESCE(SUM(dl), 0) AS BIGINT) FROM dl) AS sum_dl),
       |scored AS (
       |  SELECT q.query_id, tf.doc_id,
       |    CAST(SUM(CAST(ROUND(
       |      LN(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
       |      (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl /
       |        (CAST(sum_dl AS DOUBLE) / n_docs)))) *
       |      1000000) AS BIGINT)) AS BIGINT) AS score_scaled
       |  FROM q JOIN tf USING (tok) JOIN df USING (tok)
       |       JOIN dl USING (doc_id) CROSS JOIN stats
       |  GROUP BY q.query_id, tf.doc_id),
       |ranked AS (
       |  SELECT query_id, doc_id, score_scaled,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score_scaled DESC, doc_id) AS rn
       |  FROM scored)""".stripMargin

  val x92_bm25: QueryDef = QueryDef(
    "x92_bm25",
    Sql.canon(
      s"""WITH $bm25Ctes
         |SELECT query_id, doc_id, score_scaled, CAST(rn AS INT) AS rn
         |FROM ranked WHERE rn <= $Bm25TopK""".stripMargin,
      Seq("query_id", "doc_id", "score_scaled", "rn"))) { (s, d) =>
    Canon(graft.operators.Bm25.topK(
      Tables.documents(s, d), Bm25QuerySet, Bm25TopK))
  }

  /** `(1, 'vector'), (1, 'hash'), …` — the oracle twin of the term
    * expansion in [[graft.operators.Bm25.scores]] (lowercase, per-query
    * distinct).
    */
  private def bm25QueryValues(qs: Seq[(Int, String)]): String =
    qs.flatMap { case (qid, q) =>
      q.toLowerCase.split("\\s+").toSeq.distinct.map(t => s"($qid, '$t')")
    }.mkString(", ")

  // ---------------------------------------------------------------- x94
  /** Reciprocal-rank-fusion constant (the standard 60 from Cormack et al.)
    * and the integer scale that keeps fused scores exact: contribution =
    * 1e9 div (60 + rank) — integer division, bit-identical in both
    * engines, so the fusion needs no float rounding protocol at all.
    */
  private[graft] val RrfK = 60
  private[graft] val RrfScale = 1000000000L

  /** Hybrid retrieval: RRF fusion of the x92 BM25 ranking and a vector
    * cosine ranking over the SAME query ids (query i's vector is
    * embeddings.vec_id = i) — the standard lexical+dense retrieval
    * combiner a RAG/decontamination pipeline runs when neither signal
    * alone is trusted. Scale shape: both input rankings are
    * queries × top-k relations (bounded), so the fusion join and final
    * rank cost nothing at any corpus size; the corpus-scale work is
    * exactly x92's candidate scan + one brute-force-style vector scan
    * ranked by the x87-style bucketed two-phase top-k (integer-scaled
    * 4dp cosine, q33's canonical device, so the oracle replays it
    * row-exactly).
    */
  /** The one oracle both hybrid entries share: x94b's store path is
    * bit-identical to the transient chain (Bm25StoreSpec), so the same
    * SQL twin checks both.
    */
  private lazy val hybridRrfOracle = Sql.canon(
      s"""WITH $bm25Ctes,
         |btop AS (SELECT query_id, doc_id, rn AS brn
         |         FROM ranked WHERE rn <= $Bm25TopK),
         |ex AS (SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x,
         |         UNNEST(generate_series(1, LEN(embedding))) AS i
         |       FROM embeddings),
         |qv AS (SELECT CAST(vec_id AS INTEGER) AS query_id, i, x AS qx
         |       FROM ex WHERE vec_id IN (${Bm25QuerySet.map(_._1).mkString(", ")})),
         |pr AS (SELECT qv.query_id, e.vec_id AS doc_id,
         |         SUM(e.x * qv.qx) AS dt, SUM(e.x * e.x) AS na,
         |         SUM(qv.qx * qv.qx) AS nb
         |       FROM ex e JOIN qv ON e.i = qv.i
         |       GROUP BY qv.query_id, e.vec_id),
         |vs AS (SELECT query_id, doc_id,
         |         CAST(ROUND(ROUND(dt / (SQRT(na) * SQRT(nb)), 4) * 10000)
         |           AS BIGINT) AS vscore
         |       FROM pr),
         |vranked AS (SELECT query_id, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY vscore DESC, doc_id) AS vrn
         |  FROM vs),
         |vtop AS (SELECT query_id, doc_id, vrn
         |         FROM vranked WHERE vrn <= $Bm25TopK),
         |fused AS (
         |  SELECT COALESCE(b.query_id, v.query_id) AS query_id,
         |         COALESCE(b.doc_id, v.doc_id) AS doc_id,
         |         COALESCE($RrfScale // ($RrfK + b.brn), 0) +
         |           COALESCE($RrfScale // ($RrfK + v.vrn), 0) AS rrf,
         |         b.brn AS brn, v.vrn AS vrn
         |  FROM btop b FULL OUTER JOIN vtop v
         |    ON b.query_id = v.query_id AND b.doc_id = v.doc_id),
         |franked AS (SELECT query_id, doc_id, rrf, brn, vrn,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY rrf DESC, doc_id) AS rn
         |  FROM fused)
         |SELECT query_id, doc_id, rrf, CAST(brn AS INT) AS brn,
         |  CAST(vrn AS INT) AS vrn, CAST(rn AS INT) AS rn
         |FROM franked WHERE rn <= $Bm25TopK""".stripMargin,
      Seq("query_id", "doc_id", "rrf", "brn", "vrn", "rn"))

  val x94_hybrid_rrf: QueryDef = QueryDef(
    "x94_hybrid_rrf", hybridRrfOracle) { (s, d) =>
    Canon(hybridRrf(s, d, graft.operators.Bm25.topK(
      Tables.documents(s, d), Bm25QuerySet, Bm25TopK)))
  }

  /** x94's INDEX-SERVED form — the steady-state retrieval deployment: the
    * BM25 ranking answers from the persisted [[graft.operators.Bm25Store]]
    * (partition-pruned bucket reads, NO corpus scan — Bm25StoreSpec gates
    * `documents.parquet` absent from the plan's input files), built once
    * per corpus by the Verify/Bench producer step like x86's hash store.
    * Standalone (no producer ran) it falls back to the transient chain;
    * either way answers are bit-identical (store ≡ scan, spec-gated), so
    * x94's oracle applies verbatim. The vector side stays the exact
    * ranking — swapping in ANN changes answers; recall-gated ANN variants
    * are x43/x43b/x93's axis, not this entry's.
    */
  val x94b_hybrid_rrf_store: QueryDef = QueryDef(
    "x94b_hybrid_rrf_store", hybridRrfOracle) { (s, d) =>
    val bm = graft.operators.Bm25Store.registered(s, d) match {
      case Some(p) =>
        graft.operators.Bm25Store.query(s, p, Bm25QuerySet, Bm25TopK)
      case None =>
        graft.operators.Bm25.topK(Tables.documents(s, d), Bm25QuerySet,
          Bm25TopK)
    }
    Canon(hybridRrf(s, d, bm))
  }

  /** RRF fusion of a BM25 top-k relation (query_id, doc_id, …, rn) with
    * the exact integer-scaled cosine ranking over embeddings — the shared
    * tail of x94/x94b.
    */
  private[graft] def hybridRrf(s: org.apache.spark.sql.SparkSession,
                               d: String,
                               bmTop: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val bm = bmTop.select(col("query_id"), col("doc_id"),
      col("rn").as("brn"))
    val vq = emb
      .filter(col("vec_id").isin(Bm25QuerySet.map(_._1.toLong): _*))
      .select(col("vec_id").cast(IntegerType).as("query_id"),
        col("embedding").as("qe"))
    // null/ragged/empty rows take no dense seat (the library ingress
    // posture; an unmatched length divides by zero or scores a wrong
    // prefix cosine — RaggedInputSpec)
    val vecScored = emb
      .filter(col("embedding").isNotNull)
      .crossJoin(broadcast(vq.filter(col("qe").isNotNull)))
      .filter(size(col("embedding")) === size(col("qe")) &&
        size(col("embedding")) > 0)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        round(round(VectorOps.dot(col("embedding"), col("qe")) /
          (sqrt(VectorOps.norm2(col("embedding"))) *
            sqrt(VectorOps.norm2(col("qe")))), 4) * 10000)
          .cast(LongType).as("score_scaled"))
    val vt = graft.operators.Bm25.rankTopK(vecScored, Bm25TopK, buckets = 32)
      .select(col("query_id"), col("doc_id"), col("rn").as("vrn"))
    val fused = bm.join(vt, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(expr(s"CAST($RrfScale AS BIGINT) div ($RrfK + brn)"), lit(0L)) +
          coalesce(expr(s"CAST($RrfScale AS BIGINT) div ($RrfK + vrn)"), lit(0L)))
    // final rank input is queries × (≤ 2·topK) rows — bounded, the naive
    // window is the oracle shape and free here
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fused
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Bm25TopK)
      .select(col("query_id"), col("doc_id"), col("rrf"),
        col("brn"), col("vrn"), col("rn"))
  }

  // ---------------------------------------------------------------- x73
  /** Nearest-centroid assignment (the k-means E-step over x65's centroids).
    * The scale shape: centroids are a k x d driver-side array broadcast into
    * a per-row kernel — assignment is map-only regardless of corpus size
    * (the oracle replays it as a vec x centroid x dim join, viable only at
    * oracle scale). Distances are integer-scaled exact sums so the argmin is
    * ULP-proof; ties break toward the lowest label.
    */
  val x73_cluster_assign: QueryDef = QueryDef(
    "x73_cluster_assign",
    Sql.canon(
      s"""WITH cent AS (
         |  SELECT label, i AS dim,
         |    ${Sql.scaledSum("CAST(embedding[i] AS DOUBLE)", 1000000L)}/COUNT(*) AS c
         |  FROM (SELECT label, embedding, UNNEST(generate_series(1,64)) AS i
         |        FROM embeddings)
         |  GROUP BY label, i),
         |vd AS (SELECT vec_id, embedding, UNNEST(generate_series(1,64)) AS i
         |       FROM embeddings),
         |terms AS (
         |  SELECT v.vec_id, c.label,
         |    CAST(ROUND((CAST(v.embedding[v.i] AS DOUBLE) - c.c) *
         |               (CAST(v.embedding[v.i] AS DOUBLE) - c.c) *
         |               1000000000) AS BIGINT) AS t
         |  FROM vd v JOIN cent c ON c.dim = v.i),
         |dist AS (SELECT vec_id, label, CAST(SUM(t) AS BIGINT) AS d2
         |         FROM terms GROUP BY vec_id, label),
         |ranked AS (SELECT vec_id, label, d2,
         |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, label) AS rn
         |  FROM dist)
         |SELECT vec_id, CAST(label AS INT) AS assigned, d2 AS dist_scaled
         |FROM ranked WHERE rn = 1""".stripMargin,
      Seq("vec_id", "assigned", "dist_scaled"))) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    // M-step result (x65's exact formula), k x d — tiny, collected + closed
    // over by the kernel; Spark serializes it to each task like a broadcast
    val centRows = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg((Canon.scaledSum(col("v").cast(DoubleType), 1000000L) /
        count(lit(1))).as("c"))
      .collect()
    if (centRows.isEmpty) { // empty corpus: keep the schema, emit nothing
      Canon(emb.select(col("vec_id"),
        lit(0).cast(IntegerType).as("assigned"), lit(0L).as("dist_scaled"))
        .filter(lit(false)))
    } else {
      val dims = centRows.map(_.getInt(1)).max + 1
      val byLabel = centRows.groupBy(_.getInt(0)).toArray.sortBy(_._1)
      val labels = byLabel.map(_._1)
      val cents = byLabel.map { case (_, rs) =>
        val arr = new Array[Double](dims)
        rs.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
        arr
      }
      val assign = udf((v: Seq[Float]) =>
        if (v == null) null
        else Kernels.assignNearest(v.toArray, labels, cents))
      Canon(emb
        .select(col("vec_id"), assign(col("embedding")).as("a"))
        .select(col("vec_id"),
          col("a").getItem(0).cast(IntegerType).as("assigned"),
          col("a").getItem(1).as("dist_scaled")))
    }
  }

  // ---------------------------------------------------------------- x74
  /** The end-to-end curation pipeline as ONE composed DAG: quality gate →
    * exact dedup (keep min doc_id per content hash) → deterministic split →
    * per-(split, lang) corpus summary. Proves the curation ops compose
    * without materialization barriers — Catalyst plans the whole flow as a
    * scan, one dedup aggregation + self-semi-join, and one final groupBy.
    */
  val x74_pipeline: QueryDef = QueryDef(
    "x74_pipeline",
    Sql.canon(
      """WITH q AS (
        |  SELECT doc_id, lang, text,
        |    CAST(LEN(STR_SPLIT(text, ' ')) AS INT) AS n_tok
        |  FROM documents
        |  WHERE LEN(STR_SPLIT(text, ' ')) >= 20),
        |k AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY MD5(text)),
        |kept AS (SELECT q.doc_id, q.lang, q.n_tok
        |         FROM q JOIN k ON q.doc_id = k.doc_id),
        |s AS (
        |  SELECT doc_id, lang, n_tok,
        |    CASE WHEN bucket < 80 THEN 'train'
        |         WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT doc_id, lang, n_tok,
        |    CAST(CAST('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8)
        |         AS BIGINT) % 100 AS INT) AS bucket
        |    FROM kept))
        |SELECT split, lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens
        |FROM s GROUP BY split, lang""".stripMargin,
      Seq("split", "lang", "n_docs", "total_tokens"))) { (s, d) =>
    val q = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"),
        size(split(col("text"), " ")).as("n_tok"))
      .filter(col("n_tok") >= 20)
    val keepers = q.groupBy(md5(col("text")).as("_h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val kept = q.join(keepers, Seq("doc_id"), "left_semi")
    val bucket = (conv(substring(md5(col("doc_id").cast(StringType)), 1, 8),
      16, 10).cast(LongType) % 100).cast(IntegerType)
    Canon(kept
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast(LongType).as("total_tokens")))
  }

  // ---------------------------------------------------------------- x96
  /** Sketch size for the x96 REGISTRY entry. 64 ≥ the corpus vocabulary at
    * every verify SF, so the sketch is provably lossless there; the spec
    * (HeavyHittersSpec) gates the sub-vocabulary regime — the W/(k+1)
    * undercount bound and candidate-superset property on skewed streams —
    * that the oracle fixture cannot exercise.
    */
  private[graft] val HhSketchK = 64
  private[graft] val HhTopK = 10

  /** Heavy-hitters: exact top-10 hottest tokens (≥4 chars, lowercased)
    * via [[graft.operators.HeavyHitters.exactTopK]] — an O(k)-state
    * Misra–Gries candidate pass + a candidates-only exact recount, instead
    * of a vocabulary-wide count shuffle. The oracle is the naive full
    * count's top-10; the two agree whenever the k-th token clears the
    * sketch's W/(sketchK+1) undercount bound (trivially here — see
    * [[HhSketchK]]). The hot-token relation this emits is also the salt
    * list x78-style mitigation wants: heavy hitters ARE the skew keys.
    */
  val x96_heavy_hitters: QueryDef = QueryDef(
    "x96_heavy_hitters",
    Sql.canon(
      s"""WITH tf AS (
         |  SELECT doc_id, tok, COUNT(*) AS tf
         |  FROM (SELECT doc_id,
         |          UNNEST(string_split_regex(LOWER(text), '\\s+')) AS tok
         |        FROM documents)
         |  WHERE LENGTH(tok) >= 4
         |  GROUP BY doc_id, tok),
         |c AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY tok),
         |ranked AS (SELECT tok, cnt,
         |    ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rn FROM c)
         |SELECT tok, cnt, CAST(rn AS INT) AS rn
         |FROM ranked WHERE rn <= $HhTopK""".stripMargin,
      Seq("tok", "cnt", "rn"))) { (s, d) =>
    Canon(graft.operators.HeavyHitters.exactTopK(
      graft.operators.UnigramLm.docTermFreqs(
        Tables.fanOutForKernels(Tables.documents(s, d)), minLen = 4),
      k = HhTopK, sketchK = HhSketchK))
  }

  // ---------------------------------------------------------------- x98
  /** Per-source token-distribution drift
    * ([[graft.operators.DistributionDrift]]): KL(P_source ‖ P_corpus)
    * over add-one-smoothed distributions CLOSED over the corpus
    * vocabulary (both sum to exactly 1, so kl ≥ 0 is a theorem) — the
    * data-mixing diagnostic behind x80's mixing knobs: which source looks
    * least like the blend. Integer-scaled ln terms (x95's device) make
    * the weighted sum exact in both engines; only corpus-sized shuffle is
    * the (source, token) map-combined aggregation.
    */
  val x98_source_kl: QueryDef = QueryDef(
    "x98_source_kl",
    Sql.canon(
      s"""WITH tf AS (
         |  SELECT source AS slice, tok, COUNT(*) AS cs
         |  FROM (SELECT source,
         |          UNNEST(string_split_regex(LOWER(text), '\\s+')) AS tok
         |        FROM documents)
         |  WHERE LENGTH(tok) >= ${graft.operators.UnigramLm.MinTokenLen}
         |  GROUP BY source, tok),
         |vocab AS (SELECT tok, CAST(SUM(cs) AS BIGINT) AS c FROM tf GROUP BY tok),
         |scal AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total, COUNT(*) AS v FROM vocab),
         |st AS (SELECT slice, CAST(SUM(cs) AS BIGINT) AS ns FROM tf GROUP BY slice),
         |terms AS (
         |  SELECT g.slice, g.ns, scal.v,
         |    COALESCE(tf.cs, 0) + 1 AS w,
         |    ${graft.operators.DistributionDrift.oracleTermSql("tf.cs", "g.ns", "g.c", "scal.n_total", "scal.v")} AS lp
         |  FROM (SELECT st.slice, st.ns, vocab.tok, vocab.c
         |        FROM st CROSS JOIN vocab) g
         |  LEFT JOIN tf ON g.slice = tf.slice AND g.tok = tf.tok
         |  CROSS JOIN scal)
         |SELECT slice AS source, CAST(MAX(ns) AS BIGINT) AS n_toks,
         |  ROUND(CAST(SUM(w * lp) AS DOUBLE) /
         |        (CAST(MAX(ns) + MAX(v) AS DOUBLE) * ${graft.operators.UnigramLm.LnScale}.0), 6) AS kl
         |FROM terms GROUP BY slice""".stripMargin,
      Seq("source", "n_toks", "kl"))) { (s, d) =>
    Canon(graft.operators.DistributionDrift
      .sourceKl(Tables.fanOutForKernels(Tables.documents(s, d)),
        sliceCol = "source")
      .withColumnRenamed("slice", "source"))
  }

  // ---------------------------------------------------------------- x101
  /** NLL gate for the x101 REGISTRY entry: drops the worst ~3–5% of docs
    * under the self-trained unigram model at every verify SF (median nll
    * ≈ 3.402, right tail to ~4.0). Production derives this from a
    * percentile over a reference window, not a constant.
    */
  private[graft] val MaxNll = 3.45

  /** Curation pipeline v2 — x74's composed DAG upgraded with the round-10
    * LM family: quality gates (x90's length/repetition thresholds) PLUS
    * the x95 perplexity filter, then exact dedup among gate survivors
    * (md5 groups, min-id keeper — same-text groups make the x100 length
    * policy degenerate to min id), summarized per language in ONE
    * Catalyst DAG with no materialization barriers. Counts are
    * per-gate-independent (a doc can trip several), `n_kept_docs` counts
    * unique keepers, `kept_tokens` sums their token counts.
    *
    * Scale shape: the audit and nll sides each reduce per doc_id and
    * join on it (two map-combined aggregations + one co-partitioned
    * join); dedup shuffles only gate SURVIVORS by content hash; the
    * summary is a per-lang map-combined aggregate. The nll arithmetic is
    * x95's integer-scaled device, so the gate — and therefore every
    * count — hash-matches DuckDB exactly.
    */
  val x101_curation_v2: QueryDef = QueryDef(
    "x101_curation_v2",
    Sql.canon(
      s"""WITH s AS (
         |  SELECT doc_id, lang,
         |    CAST(LEN(string_split_regex(text, '\\s+')) AS INT) AS n_tokens
         |  FROM documents),
         |tri AS (
         |  SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
         |  FROM (
         |    SELECT doc_id, toks,
         |      UNNEST(generate_series(1, GREATEST(LEN(toks) - 2, 0))) AS i
         |    FROM (SELECT doc_id, STR_SPLIT(text, ' ') AS toks FROM documents)
         |    WHERE LEN(toks) >= 3)),
         |rep AS (
         |  SELECT doc_id,
         |    1.0 - CAST(COUNT(DISTINCT sh) AS DOUBLE) / COUNT(*) AS rr
         |  FROM tri GROUP BY doc_id),
         |tf AS (
         |  SELECT doc_id, tok, COUNT(*) AS tf
         |  FROM (SELECT doc_id,
         |          UNNEST(string_split_regex(LOWER(text), '\\s+')) AS tok
         |        FROM documents)
         |  WHERE LENGTH(tok) >= ${graft.operators.UnigramLm.MinTokenLen}
         |  GROUP BY doc_id, tok),
         |vocab AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY tok),
         |scal AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total, COUNT(*) AS v FROM vocab),
         |terms AS (
         |  SELECT tf.doc_id, tf.tf,
         |    ${graft.operators.UnigramLm.oracleTermSql("vocab.c", "scal.n_total", "scal.v")} AS lp
         |  FROM tf LEFT JOIN vocab ON tf.tok = vocab.tok CROSS JOIN scal),
         |nll AS (
         |  SELECT doc_id,
         |    ROUND(CAST(-SUM(tf * lp) AS DOUBLE) /
         |          (CAST(SUM(tf) AS DOUBLE) * ${graft.operators.UnigramLm.LnScale}.0), 6) AS nll
         |  FROM terms GROUP BY doc_id),
         |gated AS (
         |  SELECT s.doc_id, s.lang, s.n_tokens,
         |    s.n_tokens < $AuditMinTokens AS too_short,
         |    s.n_tokens > $AuditMaxTokens AS too_long,
         |    COALESCE(rep.rr, 0.0) > $AuditMaxRepetition AS repetitive,
         |    nll.nll > $MaxNll AS low_quality
         |  FROM s LEFT JOIN rep ON s.doc_id = rep.doc_id
         |    JOIN nll ON s.doc_id = nll.doc_id),
         |kept AS (
         |  SELECT f.doc_id, f.lang, f.n_tokens, d.text
         |  FROM gated f JOIN documents d ON f.doc_id = d.doc_id
         |  WHERE NOT (too_short OR too_long OR repetitive OR low_quality)),
         |keepers AS (
         |  SELECT md5(text) AS th, MIN(doc_id) AS keeper
         |  FROM kept GROUP BY md5(text)),
         |uniq AS (
         |  SELECT k.lang, COUNT(*) AS n_kept_docs,
         |    CAST(SUM(k.n_tokens) AS BIGINT) AS kept_tokens
         |  FROM kept k JOIN keepers ON k.doc_id = keepers.keeper
         |  GROUP BY k.lang)
         |SELECT f.lang, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN too_short THEN 1 ELSE 0 END) AS BIGINT) AS n_too_short,
         |  CAST(SUM(CASE WHEN too_long THEN 1 ELSE 0 END) AS BIGINT) AS n_too_long,
         |  CAST(SUM(CASE WHEN repetitive THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
         |  CAST(SUM(CASE WHEN low_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
         |  COALESCE(MAX(u.n_kept_docs), 0) AS n_kept_docs,
         |  COALESCE(MAX(u.kept_tokens), 0) AS kept_tokens
         |FROM gated f LEFT JOIN uniq u ON f.lang = u.lang
         |GROUP BY f.lang""".stripMargin,
      Seq("lang", "n_docs", "n_too_short", "n_too_long", "n_repetitive",
        "n_low_quality", "n_kept_docs", "kept_tokens"))) { (s, d) =>
    // corpus-kernel fan-out: audit (trigram kernel) and the LM's two
    // tokenize passes all run over this frame (util.Scans rationale)
    val docs = Tables.fanOutForKernels(Tables.documents(s, d))
    val audit = curationAudit(docs)
    val nll = graft.operators.UnigramLm.selfScore(docs)
      .select(col("doc_id"), col("nll"))
    // PERSISTED once for the build (round 18, guide §2.4 "don't
    // recompute"): the per-doc gate matrix feeds TWO final branches (the
    // per-lang gate counts and the kept→keeper→uniq chain), whose
    // differing projections defeat ReuseExchange — lazily the whole
    // audit+LM subtree (the before-plan: 14 corpus scans, 0 reused
    // exchanges) ran once per branch. The pin is a NARROW per-doc
    // relation (~40 B/doc) and is released in finally below (the
    // x115/x117 convention: the bounded per-lang result materializes
    // eagerly, so nothing downstream re-reads the unpersisted relation
    // and N compositions leave no net cached relations).
    val full = audit.join(nll, Seq("doc_id"))
      .withColumn("low_quality", col("nll") > MaxNll)
      .persist()
    try {
      val kept = full
        .filter(!(col("too_short") || col("too_long") || col("repetitive") ||
          col("low_quality")))
        .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
        .withColumn("th", md5(col("text")))
      val keepers = kept.groupBy(col("th")).agg(min(col("doc_id")).as("keeper"))
        .select(col("keeper").as("doc_id"))
      val uniq = kept.join(keepers, Seq("doc_id"), "left_semi")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept_docs"),
          sum(col("n_tokens")).cast(org.apache.spark.sql.types.LongType)
            .as("kept_tokens"))
      val b1 = (c: org.apache.spark.sql.Column) =>
        sum(when(c, 1L).otherwise(0L))
      Canon.materialize(Canon(full.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          b1(col("too_short")).as("n_too_short"),
          b1(col("too_long")).as("n_too_long"),
          b1(col("repetitive")).as("n_repetitive"),
          b1(col("low_quality")).as("n_low_quality"))
        .join(uniq, Seq("lang"), "left")
        .select(col("lang"), col("n_docs"), col("n_too_short"),
          col("n_too_long"), col("n_repetitive"), col("n_low_quality"),
          coalesce(col("n_kept_docs"), lit(0L)).as("n_kept_docs"),
          coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))))
    } finally full.unpersist(): Unit
  }

  // ---------------------------------------------------------------- x115
  /** Percentile-DERIVED quality gate
    * ([[graft.operators.Percentiles.exactThreshold]]) — closes x101's
    * documented gap: production derives the nll cutoff from a percentile
    * over a reference window, not the pinned [[MaxNll]] constant. The
    * threshold is the EXACT p90 of the corpus' integer-scaled
    * ([[graft.operators.UnigramLm.LnScale]]) self-trained nll — computed
    * with the x87-style two-phase device keyed by value (distinct-value
    * histogram → bucket-grid offsets → bucket-pruned rank scan; the
    * histogram is bounded by the 6-dp value range at ANY corpus size) —
    * and the gate compares SCALED INTEGERS, so every count is exact in
    * both engines. Output per lang: doc counts, dropped/kept under the
    * derived gate, and the derived scalar itself (the oracle replays it
    * with a one-window ROW_NUMBER at rank ceil(0.9·N)).
    */
  private[graft] val GatePercentileNum = 9L
  private[graft] val GatePercentileDen = 10L

  val x115_percentile_gate: QueryDef = QueryDef(
    "x115_percentile_gate",
    Sql.canon(
      s"""WITH tf AS (
         |  SELECT doc_id, tok, COUNT(*) AS tf
         |  FROM (SELECT doc_id,
         |          UNNEST(string_split_regex(LOWER(text), '\\s+')) AS tok
         |        FROM documents)
         |  WHERE LENGTH(tok) >= ${graft.operators.UnigramLm.MinTokenLen}
         |  GROUP BY doc_id, tok),
         |vocab AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY tok),
         |scal AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total, COUNT(*) AS v FROM vocab),
         |terms AS (
         |  SELECT tf.doc_id, tf.tf,
         |    ${graft.operators.UnigramLm.oracleTermSql("vocab.c", "scal.n_total", "scal.v")} AS lp
         |  FROM tf LEFT JOIN vocab ON tf.tok = vocab.tok CROSS JOIN scal),
         |nll AS (
         |  SELECT doc_id,
         |    ROUND(CAST(-SUM(tf * lp) AS DOUBLE) /
         |          (CAST(SUM(tf) AS DOUBLE) * ${graft.operators.UnigramLm.LnScale}.0), 6) AS nll
         |  FROM terms GROUP BY doc_id),
         |scored AS (
         |  SELECT doc_id,
         |    CAST(ROUND(nll * ${graft.operators.UnigramLm.LnScale}) AS BIGINT) AS v
         |  FROM nll),
         |nn AS (SELECT COUNT(*) AS n FROM scored),
         |thr AS (
         |  SELECT MIN(v) AS vthr FROM (
         |      SELECT v, ROW_NUMBER() OVER (ORDER BY v, doc_id) AS rn
         |      FROM scored) r CROSS JOIN nn
         |  WHERE r.rn = ($GatePercentileNum * nn.n + $GatePercentileDen - 1)
         |                  // $GatePercentileDen)
         |SELECT d.lang, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN s.v > t.vthr THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  CAST(SUM(CASE WHEN s.v > t.vthr THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
         |  CAST(t.vthr AS DOUBLE) / ${graft.operators.UnigramLm.LnScale}.0 AS nll_p90
         |FROM scored s JOIN documents d ON s.doc_id = d.doc_id CROSS JOIN thr t
         |GROUP BY d.lang, t.vthr""".stripMargin,
      Seq("lang", "n_docs", "n_dropped", "n_kept", "nll_p90"))) { (s, d) =>
    val docs = Tables.documents(s, d)
    // persisted for the BUILD only: the scored relation feeds the
    // threshold derivation's two jobs AND the final per-lang aggregate —
    // without the pin the LM pipeline re-derives per consumer. The final
    // frame is per-lang (bounded), so it materializes eagerly and the pin
    // is released in finally — a library caller composing this entry N
    // times accumulates no cached relations (CompositionSpec gate).
    // selfScoreCached: the trained vocabulary memoizes per (app, dir) —
    // Verify/Bench re-invoke this entry and x119 shares the raw-corpus
    // model, so the train aggregation runs once per session
    val scored = graft.operators.UnigramLm.selfScoreCached(s, d, "raw", docs)
      .select(col("doc_id"),
        round(col("nll") * graft.operators.UnigramLm.LnScale.toDouble)
          .cast(LongType).as("v"))
      .persist()
    try {
      // empty corpus: a percentile of nothing is None — every row joins
      // against zero scored docs anyway, so any sentinel yields the same
      // (empty) result; MaxValue documents "gate never trips"
      val thr = graft.operators.Percentiles.exactThresholdOpt(
        scored.select(col("v")), "v", GatePercentileNum, GatePercentileDen)
        .getOrElse(Long.MaxValue)
      Canon.materialize(Canon(docs.select(col("doc_id"), col("lang"))
        .join(scored, Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("v") > thr, 1L).otherwise(0L)).as("n_dropped"),
          sum(when(col("v") > thr, 0L).otherwise(1L)).as("n_kept"))
        .select(col("lang"), col("n_docs"), col("n_dropped"), col("n_kept"),
          (lit(thr).cast(DoubleType) /
            graft.operators.UnigramLm.LnScale.toDouble).as("nll_p90"))))
    } finally scored.unpersist(): Unit
  }

  // ---------------------------------------------------------------- x119
  /** Exact nll quantile PROFILE (p50/p90/p99) —
    * [[graft.operators.Percentiles.exactQuantiles]]: several order
    * statistics from ONE histogram pass (the corpus-scale work is the
    * single map-combined distinct-value aggregation; each rank then costs
    * one bucket-pruned scan of the persisted histogram). The profiling
    * seat next to x115's gate: a curation operator reads the
    * distribution before choosing the cut. Oracle replays each rank with
    * the same one-window ROW_NUMBER device.
    */
  val x119_nll_quantiles: QueryDef = QueryDef(
    "x119_nll_quantiles",
    Sql.canon(
      s"""WITH tf AS (
         |  SELECT doc_id, tok, COUNT(*) AS tf
         |  FROM (SELECT doc_id,
         |          UNNEST(string_split_regex(LOWER(text), '\\s+')) AS tok
         |        FROM documents)
         |  WHERE LENGTH(tok) >= ${graft.operators.UnigramLm.MinTokenLen}
         |  GROUP BY doc_id, tok),
         |vocab AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY tok),
         |scal AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total, COUNT(*) AS v FROM vocab),
         |terms AS (
         |  SELECT tf.doc_id, tf.tf,
         |    ${graft.operators.UnigramLm.oracleTermSql("vocab.c", "scal.n_total", "scal.v")} AS lp
         |  FROM tf LEFT JOIN vocab ON tf.tok = vocab.tok CROSS JOIN scal),
         |nll AS (
         |  SELECT doc_id,
         |    ROUND(CAST(-SUM(tf * lp) AS DOUBLE) /
         |          (CAST(SUM(tf) AS DOUBLE) * ${graft.operators.UnigramLm.LnScale}.0), 6) AS nll
         |  FROM terms GROUP BY doc_id),
         |scored AS (
         |  SELECT doc_id,
         |    CAST(ROUND(nll * ${graft.operators.UnigramLm.LnScale}) AS BIGINT) AS v
         |  FROM nll),
         |nn AS (SELECT COUNT(*) AS n FROM scored),
         |ranked AS (
         |  SELECT v, ROW_NUMBER() OVER (ORDER BY v, doc_id) AS rn
         |  FROM scored)
         |SELECT 'p50' AS pct,
         |  CAST(MIN(v) AS DOUBLE) / ${graft.operators.UnigramLm.LnScale}.0 AS nll
         |FROM ranked CROSS JOIN nn WHERE rn = (50 * nn.n + 99) // 100
         |UNION ALL
         |SELECT 'p90' AS pct,
         |  CAST(MIN(v) AS DOUBLE) / ${graft.operators.UnigramLm.LnScale}.0 AS nll
         |FROM ranked CROSS JOIN nn WHERE rn = (90 * nn.n + 99) // 100
         |UNION ALL
         |SELECT 'p99' AS pct,
         |  CAST(MIN(v) AS DOUBLE) / ${graft.operators.UnigramLm.LnScale}.0 AS nll
         |FROM ranked CROSS JOIN nn WHERE rn = (99 * nn.n + 99) // 100""".stripMargin,
      Seq("pct", "nll"))) { (s, d) =>
    import s.implicits._
    // shares x115's memoized raw-corpus model (same (app, dir, "raw") key)
    val scored = graft.operators.UnigramLm
      .selfScoreCached(s, d, "raw", Tables.documents(s, d))
      .select(round(col("nll") * graft.operators.UnigramLm.LnScale.toDouble)
        .cast(LongType).as("v"))
    val qs = graft.operators.Percentiles.exactQuantiles(
      scored, "v", Seq((50L, 100L), (90L, 100L), (99L, 100L)))
    Canon(qs.map { case (pn, _, v) =>
      (s"p$pn", v.toDouble / graft.operators.UnigramLm.LnScale.toDouble)
    }.toDF("pct", "nll"))
  }

  // ---------------------------------------------------------------- x117
  /** Curation pipeline v3 — v2 upgraded with the round-13 pair: substring
    * REMOVAL first (x114's rewrite — duplicated spans are dropped BEFORE
    * any scoring, the Lee et al. ordering: gates and the language model
    * must see the residual text, or boilerplate both inflates repetition
    * and drags every nll toward the duplicated mass), then the quality +
    * perplexity gates with the nll cutoff DERIVED as the corpus p90
    * (x115's device) instead of v2's pinned constant, then exact dedup
    * among survivors (md5 of the CLEANED text — removal canonicalizes
    * boilerplate-wrapped copies onto the same hash), summarized per
    * language with the derived scalar attached.
    *
    * Scale shape: x114's removal bill (one gram-keyed exchange + map
    * rewrite) in front of v2's DAG — paid ONCE per (application, corpus,
    * k): the cleaned relation is a [[graft.operators.CleanedCorpus]]
    * producer artifact (parquet materialization, the Lee et al. pipeline
    * posture), so its five consumers (audit, LM train, LM score,
    * threshold derivation, dedup) are five scans of a columnar file and
    * re-invocations skip the removal entirely. The oracle is the three
    * entries' CTEs composed verbatim — every count exact in both engines.
    */
  val x117_curation_v3: QueryDef = QueryDef(
    "x117_curation_v3",
    Sql.canon(
      s"""WITH ${graft.queries.TextOps.RemoveSpansCtes},
         |s AS (
         |  SELECT doc_id, lang,
         |    CAST(LEN(string_split_regex(text, '\\s+')) AS INT) AS n_tokens
         |  FROM cleaned),
         |tri AS (
         |  SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
         |  FROM (
         |    SELECT doc_id, toks,
         |      UNNEST(generate_series(1, GREATEST(LEN(toks) - 2, 0))) AS i
         |    FROM (SELECT doc_id, STR_SPLIT(text, ' ') AS toks FROM cleaned)
         |    WHERE LEN(toks) >= 3)),
         |rep AS (
         |  SELECT doc_id,
         |    1.0 - CAST(COUNT(DISTINCT sh) AS DOUBLE) / COUNT(*) AS rr
         |  FROM tri GROUP BY doc_id),
         |tf AS (
         |  SELECT doc_id, tok, COUNT(*) AS tf
         |  FROM (SELECT doc_id,
         |          UNNEST(string_split_regex(LOWER(text), '\\s+')) AS tok
         |        FROM cleaned)
         |  WHERE LENGTH(tok) >= ${graft.operators.UnigramLm.MinTokenLen}
         |  GROUP BY doc_id, tok),
         |vocab AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY tok),
         |scal AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total, COUNT(*) AS v FROM vocab),
         |terms AS (
         |  SELECT tf.doc_id, tf.tf,
         |    ${graft.operators.UnigramLm.oracleTermSql("vocab.c", "scal.n_total", "scal.v")} AS lp
         |  FROM tf LEFT JOIN vocab ON tf.tok = vocab.tok CROSS JOIN scal),
         |nll AS (
         |  SELECT doc_id,
         |    ROUND(CAST(-SUM(tf * lp) AS DOUBLE) /
         |          (CAST(SUM(tf) AS DOUBLE) * ${graft.operators.UnigramLm.LnScale}.0), 6) AS nll
         |  FROM terms GROUP BY doc_id),
         |scored AS (
         |  SELECT doc_id,
         |    CAST(ROUND(nll * ${graft.operators.UnigramLm.LnScale}) AS BIGINT) AS v
         |  FROM nll),
         |nn AS (SELECT COUNT(*) AS n FROM scored),
         |thr AS (
         |  SELECT MIN(v) AS vthr FROM (
         |      SELECT v, ROW_NUMBER() OVER (ORDER BY v, doc_id) AS rn
         |      FROM scored) r CROSS JOIN nn
         |  WHERE r.rn = ($GatePercentileNum * nn.n + $GatePercentileDen - 1)
         |                  // $GatePercentileDen),
         |gated AS (
         |  SELECT s.doc_id, s.lang, s.n_tokens,
         |    s.n_tokens < $AuditMinTokens AS too_short,
         |    s.n_tokens > $AuditMaxTokens AS too_long,
         |    COALESCE(rep.rr, 0.0) > $AuditMaxRepetition AS repetitive,
         |    sc.v > t.vthr AS low_quality
         |  FROM s LEFT JOIN rep ON s.doc_id = rep.doc_id
         |    JOIN scored sc ON s.doc_id = sc.doc_id
         |    CROSS JOIN thr t),
         |kept AS (
         |  SELECT f.doc_id, f.lang, f.n_tokens, c.text
         |  FROM gated f JOIN cleaned c ON f.doc_id = c.doc_id
         |  WHERE NOT (too_short OR too_long OR repetitive OR low_quality)),
         |keepers AS (
         |  SELECT md5(text) AS th, MIN(doc_id) AS keeper
         |  FROM kept GROUP BY md5(text)),
         |uniq AS (
         |  SELECT k.lang, COUNT(*) AS n_kept_docs,
         |    CAST(SUM(k.n_tokens) AS BIGINT) AS kept_tokens
         |  FROM kept k JOIN keepers ON k.doc_id = keepers.keeper
         |  GROUP BY k.lang)
         |SELECT f.lang, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN too_short THEN 1 ELSE 0 END) AS BIGINT) AS n_too_short,
         |  CAST(SUM(CASE WHEN too_long THEN 1 ELSE 0 END) AS BIGINT) AS n_too_long,
         |  CAST(SUM(CASE WHEN repetitive THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
         |  CAST(SUM(CASE WHEN low_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
         |  COALESCE(MAX(u.n_kept_docs), 0) AS n_kept_docs,
         |  COALESCE(MAX(u.kept_tokens), 0) AS kept_tokens,
         |  CAST(MAX(t2.vthr) AS DOUBLE) / ${graft.operators.UnigramLm.LnScale}.0 AS nll_p90
         |FROM gated f LEFT JOIN uniq u ON f.lang = u.lang CROSS JOIN thr t2
         |GROUP BY f.lang""".stripMargin,
      Seq("lang", "n_docs", "n_too_short", "n_too_long", "n_repetitive",
        "n_low_quality", "n_kept_docs", "kept_tokens", "nll_p90"))) { (s, d) =>
    val docs = Tables.documents(s, d)
    // the removal is a session-scoped PRODUCER step (round-14 verdict #5):
    // the cleaned corpus materializes to parquet once per (app, dir, k)
    // and every consumer — here and on re-invocation — reads the artifact
    // (the Lee et al. posture: write the deduplicated corpus once). The
    // `scored` pin stays BUILD-scoped and is released in finally, so N
    // compositions leave no net cached relations (CompositionSpec gate).
    val cleaned = Tables.fanOutForKernels(
      graft.operators.CleanedCorpus.cleanedCached(
        s, d, graft.queries.TextOps.DupGramK, docs))
    val audit = curationAudit(cleaned)
    // the LM self-trains on the span-REMOVED text — the memo variant key
    // pins the removal parameter so the raw-corpus model never collides
    val scored = graft.operators.UnigramLm.selfScoreCached(s, d,
      s"cleaned-k${graft.queries.TextOps.DupGramK}", cleaned)
      .select(col("doc_id"),
        round(col("nll") * graft.operators.UnigramLm.LnScale.toDouble)
          .cast(LongType).as("v"))
      .persist()
    try {
      // empty corpus: a percentile of nothing is None — every row joins
      // against zero scored docs anyway, so any sentinel yields the same
      // (empty) result; MaxValue documents "gate never trips"
      val thr = graft.operators.Percentiles.exactThresholdOpt(
        scored.select(col("v")), "v", GatePercentileNum, GatePercentileDen)
        .getOrElse(Long.MaxValue)
      // persisted once for the build — the x101 rationale: two final
      // branches, no exchange reuse between them, so lazily the audit
      // kernel pass over the cleaned corpus ran per branch (the scored
      // side is pinned above, but the trigram/token audit is map-only
      // and has no exchange to reuse). Narrow per-doc pin (~40 B/doc),
      // released in the finally below with `scored`.
      val full = audit.join(scored, Seq("doc_id"))
        .withColumn("low_quality", col("v") > thr)
        .persist()
      try {
        val kept = full
          .filter(!(col("too_short") || col("too_long") || col("repetitive") ||
            col("low_quality")))
          .join(cleaned.select(col("doc_id"), col("text")), Seq("doc_id"))
          .withColumn("th", md5(col("text")))
        val keepers = kept.groupBy(col("th")).agg(min(col("doc_id")).as("keeper"))
          .select(col("keeper").as("doc_id"))
        val uniq = kept.join(keepers, Seq("doc_id"), "left_semi")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept_docs"),
            sum(col("n_tokens")).cast(LongType).as("kept_tokens"))
        val b1 = (c: org.apache.spark.sql.Column) =>
          sum(when(c, 1L).otherwise(0L))
        Canon.materialize(Canon(full.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            b1(col("too_short")).as("n_too_short"),
            b1(col("too_long")).as("n_too_long"),
            b1(col("repetitive")).as("n_repetitive"),
            b1(col("low_quality")).as("n_low_quality"))
          .join(uniq, Seq("lang"), "left")
          .select(col("lang"), col("n_docs"), col("n_too_short"),
            col("n_too_long"), col("n_repetitive"), col("n_low_quality"),
            coalesce(col("n_kept_docs"), lit(0L)).as("n_kept_docs"),
            coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
            (lit(thr).cast(DoubleType) /
              graft.operators.UnigramLm.LnScale.toDouble).as("nll_p90"))))
      } finally full.unpersist(): Unit
    } finally {
      scored.unpersist(): Unit
    }
  }
}
