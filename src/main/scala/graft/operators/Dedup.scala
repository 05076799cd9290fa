package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document deduplication operators for LLM-training-data pipelines, all
  * expressed as bounded-shuffle DataFrame plans (no cross joins, no
  * driver-side loops):
  *
  *  - [[exactDuplicates]]: content-hash groupBy — one shuffle on the hash.
  *  - [[minHashNearDups]]: MinHash + banded LSH candidate generation, then
  *    EXACT Jaccard verification of the candidates. At the default
  *    128 hashes / 32 bands x 4 rows, P(miss) for a true Jaccard>=0.8 pair
  *    is (1 - 0.8^4)^32 ~= 5e-8, so the output equals the exhaustive answer
  *    with near-certainty while the join fans out per LSH *bucket* instead of
  *    per shingle — the 100 TB path.
  *  - [[simHashFingerprints]] / [[simHashNearDups]]: 64-bit SimHash with
  *    chunk-banded Hamming-distance candidate pairs.
  *
  * All hash functions are deterministic (xxhash64 + fixed affine
  * permutations), so results are stable across runs and cluster sizes.
  */
object Dedup {

  /** Exact duplicate groups by content hash: (text_hash, keeper, group_size). */
  def exactDuplicates(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("group_size"))

  /** Distinct character k-gram shingles: (doc_id, sh). */
  def shingle(docs: DataFrame, k: Int = 5, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame =
    docs.filter(length(col(textCol)) >= k)
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(expr(
          s"transform(sequence(1, length($textCol) - ${k - 1}), i -> substring($textCol, i, $k))"))).as("sh"))

  /** MinHash signature per doc: (doc_id, sig ARRAY<BIGINT>[numHashes]).
    * One aggregation; the i-th hash family member is `xxhash64(i, shingle)`
    * (seeded rehash rather than an affine permutation of one hash — equally
    * deterministic, and safe under Spark 4's default ANSI mode where a
    * wrapping `a*h+b` would raise ARITHMETIC_OVERFLOW).
    */
  def minHashSignatures(shingles: DataFrame, numHashes: Int = 128): DataFrame = {
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("sh"))).as(s"_m$i"))
    shingles.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"_m$i")): _*).as("sig"))
  }

  /** LSH candidate pairs (doc_a < doc_b) from banded signatures: docs whose
    * signatures agree on ALL rows of at least one band land in the same
    * bucket; the bucket join is the only fan-out.
    */
  def lshCandidates(sigs: DataFrame, bands: Int = 32): DataFrame = {
    val n = sigs.select(size(col("sig"))).first().getInt(0)
    val rows = n / bands
    val banded = sigs.select(col("doc_id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(lit(b) +: (0 until rows).map(r => col("sig")(b * rows + r)): _*)): _*))
        .as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Distinct word n-gram shingles: (doc_id, sh). Far more selective than
    * character grams on natural text (the standard unit for corpus dedup).
    */
  def wordShingle(docs: DataFrame, n: Int = 3, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val grams = (0 until n).map(j => s"element_at(_toks, i + $j)")
      .mkString("concat_ws(' ', ", ", ", ")")
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_toks"))
      .filter(size(col("_toks")) >= n)
      .select(col("doc_id"),
        explode(array_distinct(expr(
          s"transform(sequence(1, size(_toks) - ${n - 1}), i -> $grams)"))).as("sh"))
  }

  /** Full pipeline: shingle -> MinHash -> LSH candidates -> bucket filters ->
    * exact Jaccard >= `threshold`. `bucketFilter` optionally restricts pairs
    * (e.g. same language / similar length) to mirror an oracle's plan.
    */
  def minHashNearDups(docs: DataFrame, threshold: Double = 0.8, k: Int = 5,
                      numHashes: Int = 128, bands: Int = 32,
                      bucketFilter: DataFrame => DataFrame = identity): DataFrame =
    minHashNearDupsFromShingles(shingle(docs, k), threshold, numHashes, bands,
      bucketFilter)

  /** As [[minHashNearDups]] but over a caller-chosen shingle relation
    * (char k-grams, word n-grams, ...): (doc_id, sh).
    */
  def minHashNearDupsFromShingles(shingles: DataFrame, threshold: Double = 0.8,
                                  numHashes: Int = 128, bands: Int = 32,
                                  bucketFilter: DataFrame => DataFrame = identity): DataFrame = {
    val sh = shingles.cache()
    val cands = bucketFilter(lshCandidates(minHashSignatures(sh, numHashes), bands))
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh"))
    cands.join(a, "doc_a").join(b, Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      .join(counts.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard", col("inter").cast(DoubleType) / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 64-bit SimHash per doc over whitespace tokens: per bit, sum +-1 weighted
    * by token frequency; bit set iff the sum is positive.
    */
  def simHashFingerprints(docs: DataFrame, textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { k =>
      sum(shiftright(col("h"), k).bitwiseAND(lit(1L)) * 2 - 1).as(s"_b$k")
    }
    toks.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(k =>
          when(col(s"_b$k") > 0, lit(1L << k)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance <= maxDist, banded on 16-bit
    * chunks (a pair within distance d <= 3 must agree exactly on at least one
    * of the 4 chunks — pigeonhole), so the join is per-chunk-bucket.
    */
  def simHashNearDups(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-chunk banding is only complete for maxDist <= 3")
    val fp = simHashFingerprints(docs)
    val chunked = fp.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk", "ck")))
    val a = chunked.select(col("chunk"), col("ck"),
      col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = chunked.select(col("chunk"), col("ck"),
      col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("chunk", "ck"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
