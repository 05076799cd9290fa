package graft.operators

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop per-document kernels backing the text/vector operators.
  *
  * Each kernel is a pure function of ONE document (no cross-row state), so
  * the enclosing Spark plan stays a single scan with no explode fan-out, no
  * shuffle and no window pass — the row-count-preserving shape that scales
  * linearly to 100 TB. Replaces round-1 plans that exploded every character
  * k-gram (~n_chars rows per doc) into a window aggregation (x49: 23.6s →
  * per-doc loop) or ran a 64-column shuffle aggregation (x44/x45).
  *
  * Hash compatibility: every hash below reproduces Spark's `xxhash64(...)`
  * bit-for-bit (XXH64 with seed 42, chained left-to-right across arguments),
  * so outputs are byte-identical to the round-1 Catalyst plans — golden
  * files and recall property tests carry over unchanged.
  */
object Kernels extends Serializable {

  /** Seed used by Spark's `xxhash64` expression. */
  final val SparkSeed = 42L

  /** `xxhash64(s)` twin. */
  def xx64(s: UTF8String): Long = XXH64.hashUTF8String(s, SparkSeed)

  /** `xxhash64(lit(i), s)` twin: the int literal is hashed first, its result
    * seeds the string hash (Spark chains child hashes left-to-right).
    */
  def xx64Seeded(intSeed: Int, s: UTF8String): Long =
    XXH64.hashUTF8String(s, XXH64.hashInt(intSeed, SparkSeed))

  /** Byte offsets of the UTF-8 code-point starts of `bytes`, plus one final
    * entry = bytes.length (so char i spans offsets(i) until offsets(i+1)).
    * Matches Spark's `substring`/`length` semantics, which count code points.
    */
  private def charOffsets(bytes: Array[Byte]): Array[Int] = {
    var n = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) n += 1
      i += 1
    }
    val arr = new Array[Int](n + 1)
    var j = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { arr(j) = i; j += 1 }
      i += 1
    }
    arr(n) = bytes.length
    arr
  }

  /** Winnowing fingerprints (Schleimer–Wilkerson–Aiken) of one document:
    * hash every character k-gram with `xxhash64`, take the min hash of each
    * sliding window of w consecutive k-grams, return the DISTINCT kept
    * hashes. Returns an empty array when the document has fewer than
    * k + w - 1 characters (no full window).
    *
    * Bit-identical to the round-1 explode + window plan: grams are hashed as
    * the UTF-8 bytes of `substring(text, i, k)`.
    */
  def winnowFps(text: String, k: Int, w: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val off = charOffsets(bytes)
    val nChars = off.length - 1
    val nGrams = nChars - k + 1
    if (nGrams < w) return Array.emptyLongArray
    val h = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      h(i) = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off(i),
        off(i + k) - off(i), SparkSeed)
      i += 1
    }
    val kept = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    val nWindows = nGrams - w + 1
    while (j < nWindows) {
      var m = h(j)
      var t = 1
      while (t < w) { if (h(j + t) < m) m = h(j + t); t += 1 }
      kept.add(m)
      j += 1
    }
    val out = new Array[Long](kept.size)
    val it = kept.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }

  /** 64-bit SimHash of one document over lowercase whitespace tokens: per
    * bit, sum ±1 over token OCCURRENCES (frequency-weighted); bit set iff
    * the sum is positive. Token hash = `xxhash64(token)`.
    * Bit-identical to the round-1 explode + 64-sum-columns plan.
    */
  def simHash64(text: String): Long = {
    if (text == null) return 0L
    // UTF8String.toLowerCase matches Spark's `lower`; Java regex split
    // matches Spark's `split(col, "\\s+")` on the resulting string
    val lowered = UTF8String.fromString(text).toLowerCase.toString
    val toks = lowered.split("\\s+")
    val counts = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (tok.nonEmpty) {
        val h = xx64(UTF8String.fromString(tok))
        var b = 0
        while (b < 64) {
          counts(b) += (((h >>> b) & 1L).toInt * 2 - 1)
          b += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** MinHash signature of one document's distinct-shingle array: the i-th
    * slot is min over shingles of `xxhash64(lit(i), shingle)`. One pass per
    * hash family member; per-`i` seeds are precomputed once per JVM.
    */
  def minHashSig(shingles: Array[String], numHashes: Int): Array[Long] = {
    val seeds = minhashSeeds(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val u = UTF8String.fromString(shingles(s))
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashUTF8String(u, seeds(i))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    sig
  }

  /** Distinct word trigrams of one document, first-occurrence order (the
    * per-doc form of the corpus shingle relation: split on a single space,
    * grams joined with spaces). Empty for docs under 3 tokens.
    */
  def wordTrigramSet(text: String): Array[String] = {
    if (text == null) return Array.empty
    val toks = text.split(" ", -1)
    if (toks.length < 3) return Array.empty
    val seen = trigramSetOf(toks)
    seen.toArray(new Array[String](seen.size))
  }

  /** LSH band buckets of one document's shingle set: MinHash signature,
    * then per band the chained hash of (band index, its signature rows) —
    * bit-identical to the batch plan's `xxhash64(lit(b), sig[..])` column
    * (Spark chains child hashes left-to-right from seed 42), so streaming
    * and batch candidates land in the same buckets.
    */
  def minHashBandBuckets(shingles: Array[String], numHashes: Int,
                         bands: Int): Array[Long] = {
    if (shingles == null || shingles.isEmpty) return Array.emptyLongArray
    val sig = minHashSig(shingles, numHashes)
    val rows = numHashes / bands
    Array.tabulate(bands) { b =>
      var h = XXH64.hashInt(b, SparkSeed)
      var r = 0
      while (r < rows) { h = XXH64.hashLong(sig(b * rows + r), h); r += 1 }
      h
    }
  }

  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  private def minhashSeeds(numHashes: Int): Array[Long] =
    seedCache.computeIfAbsent(numHashes,
      n => Array.tabulate(n)(i => XXH64.hashInt(i, SparkSeed)))

  /** Per-document token frequency map over whitespace tokens of length >=
    * `minLen` CODE POINTS (matching Spark's `length`). Input should already
    * be lowercased by a Spark `lower` expression so case semantics stay
    * Catalyst's. Emitting (token -> count) per doc instead of one row per
    * token occurrence cuts the downstream explode + shuffle from
    * total-token-count rows to distinct-tokens-per-doc rows.
    */
  def tokenCounts(text: String, minLen: Int): Map[String, Long] = {
    if (text == null) return Map.empty
    val m = new java.util.HashMap[String, java.lang.Long]()
    val toks = text.split("\\s+")
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.length >= minLen && t.codePointCount(0, t.length) >= minLen)
        m.merge(t, 1L, (a, b) => a + b)
      i += 1
    }
    import scala.jdk.CollectionConverters._
    m.asScala.view.mapValues(_.longValue()).toMap
  }

  /** Per-document character k-gram position counts: every length-`k`
    * substring window → number of positions it occupies in this doc.
    * Distinct grams per doc cross the shuffle (≤ len rows), never one row
    * per position. Measured AGAINST the codegen explode(sequence)+substr
    * form at sf0.1/local[32] under full materialization: kernel ≈3.0 s vs
    * codegen ≈5.2 s — per-position UTF8String window copies and
    * per-position aggregation input (no pre-combine) cost more than the
    * Map boxing here, the inverse of the x49 trade. Gram boundaries are
    * CODE POINTS (the [[charOffsets]] device), matching Spark
    * `substring`/`length` and DuckDB SUBSTR/LENGTH exactly — so this form,
    * [[charGramHashCounts]], and [[graft.operators.Dedup.dupGramFraction]]'s
    * code-point `total_pos` all share one boundary definition even on
    * non-BMP text (no surrogate-pair splits, dup_pos ≤ total_pos by
    * construction).
    */
  def charGramCounts(text: String, k: Int): Map[String, Long] = {
    if (text == null) return Map.empty
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val off = charOffsets(bytes)
    val nGrams = off.length - 1 - k + 1
    if (nGrams <= 0) return Map.empty
    val m = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < nGrams) {
      m.merge(new String(bytes, off(i), off(i + k) - off(i),
        java.nio.charset.StandardCharsets.UTF_8), 1L, (a, b) => a + b)
      i += 1
    }
    import scala.jdk.CollectionConverters._
    m.asScala.view.mapValues(_.longValue()).toMap
  }

  /** [[charGramCounts]] keyed by the gram's `xxhash64` instead of the
    * string — the production form of the substring audit: no window
    * string allocations at all (hashes the UTF-8 byte range in place, the
    * [[winnowFps]] device) and the downstream exchange carries 8-byte
    * keys instead of k-char strings (~5× fewer bytes at k=40; measured
    * 2.3–2.6 s vs 3.0 s for the string form at sf0.1). Collision budget:
    * two distinct grams sharing a hash merge their duplication evidence —
    * P(any collision) ≈ G²/2^65 ≈ 4e-8 at G = 1.3M distinct grams, the
    * same order as x40's accepted LSH miss probability. Code-point gram
    * boundaries (matches Spark `substring`/DuckDB SUBSTR exactly).
    */
  def charGramHashCounts(text: String, k: Int): Map[Long, Long] = {
    if (text == null) return Map.empty
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val off = charOffsets(bytes)
    val nGrams = off.length - 1 - k + 1
    if (nGrams <= 0) return Map.empty
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    var i = 0
    while (i < nGrams) {
      val h = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off(i),
        off(i + k) - off(i), SparkSeed)
      m.merge(h, 1L, (a, b) => a + b)
      i += 1
    }
    import scala.jdk.CollectionConverters._
    m.asScala.map(kv => (kv._1.longValue(), kv._2.longValue())).toMap
  }

  /** [[charGramCounts]]' position-carrying sibling for span REMOVAL
    * (x114): gram → its 1-BASED code-point start positions, ascending.
    * Same cardinality across the exchange as the counts form (one row per
    * DISTINCT gram per doc), with the int-array position payload the
    * rewrite needs. 1-based to match the oracle's `generate_series(1, …)`
    * / `SUBSTR` replay exactly.
    */
  def charGramPositions(text: String, k: Int): Map[String, Array[Int]] = {
    if (text == null) return Map.empty
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val off = charOffsets(bytes)
    val nGrams = off.length - 1 - k + 1
    if (nGrams <= 0) return Map.empty
    val m = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
    var i = 0
    while (i < nGrams) {
      val g = new String(bytes, off(i), off(i + k) - off(i),
        java.nio.charset.StandardCharsets.UTF_8)
      m.computeIfAbsent(g, _ => new scala.collection.mutable.ArrayBuffer[Int]())
        .append(i + 1): Unit
      i += 1
    }
    import scala.jdk.CollectionConverters._
    m.asScala.view.mapValues(_.toArray).toMap
  }

  /** [[charGramPositions]] keyed by the gram's `xxhash64` — the production
    * form (8-byte exchange keys, zero window string allocations; the
    * [[charGramHashCounts]] collision budget applies: a collision can only
    * ADD a removed span, P ≈ 4e-8 corpus-wide at sf0.1 density).
    */
  def charGramHashPositions(text: String, k: Int): Map[Long, Array[Int]] = {
    if (text == null) return Map.empty
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val off = charOffsets(bytes)
    val nGrams = off.length - 1 - k + 1
    if (nGrams <= 0) return Map.empty
    val m = new java.util.HashMap[java.lang.Long, scala.collection.mutable.ArrayBuffer[Int]]()
    var i = 0
    while (i < nGrams) {
      val h = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off(i),
        off(i + k) - off(i), SparkSeed)
      m.computeIfAbsent(h, _ => new scala.collection.mutable.ArrayBuffer[Int]())
        .append(i + 1): Unit
      i += 1
    }
    import scala.jdk.CollectionConverters._
    m.asScala.map(kv => (kv._1.longValue(), kv._2.toArray)).toMap
  }

  /** Span-removal rewrite kernel (x114, Lee et al. 2022's ExactSubstr
    * removal step): given the SORTED 1-based code-point start positions of
    * a doc's duplicated k-grams, each position covers code points
    * [p, p+k-1]; the union of covered positions forms maximal runs
    * (overlapping OR touching covers merge — the union has no seam), and
    * the rewrite drops every covered code point. Returns
    * (n_spans, removed_chars, text_clean). Pure integer arithmetic —
    * exactly the gaps-and-islands the oracle replays with SQL windows.
    */
  def removeSpans(text: String, k: Int,
                  positions: Array[Int]): (Long, Long, String) = {
    if (positions == null || positions.isEmpty) return (0L, 0L, text)
    // merge covered intervals [p, p+k-1] (1-based inclusive)
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    val ends = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < positions.length) {
      val s = positions(i)
      val e = s + k - 1
      if (ends.nonEmpty && s <= ends.last + 1) {
        if (e > ends.last) ends(ends.length - 1) = e
      } else { starts += s; ends += e }
      i += 1
    }
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val off = charOffsets(bytes)
    val nChars = off.length - 1
    val sb = new java.lang.StringBuilder(bytes.length)
    var prevEnd = 0 // last removed code point (1-based), 0 = none yet
    var removed = 0L
    i = 0
    while (i < starts.length) {
      // kept chunk between the previous span and this one: (prevEnd, s)
      sb.append(new String(bytes, off(prevEnd), off(starts(i) - 1) - off(prevEnd),
        java.nio.charset.StandardCharsets.UTF_8)): Unit
      val e = math.min(ends(i), nChars)
      removed += e - starts(i) + 1
      prevEnd = e
      i += 1
    }
    sb.append(new String(bytes, off(prevEnd), bytes.length - off(prevEnd),
      java.nio.charset.StandardCharsets.UTF_8)): Unit
    (starts.length.toLong, removed, sb.toString)
  }

  /** Per-document ADJACENT-pair (bigram) frequency map over whitespace
    * tokens, keys as "w1 w2". Order-aware — the set-shaped [[tokenCounts]]
    * cannot express adjacency. Same shuffle-volume contract: distinct
    * bigrams per doc cross the exchange, never one row per position.
    * Input should already be lowercased by a Spark `lower` expression.
    *
    * Empty tokens are skipped on BOTH sides of the pair: a `\\s+` split
    * yields an empty leading token on leading whitespace (Java and DuckDB
    * agree) and DuckDB's `string_split_regex` additionally keeps an empty
    * TRAILING token that Java's `split` drops — filtering empties here and
    * in the x97 oracle's bi CTE is the one definition both engines can
    * share, and no real bigram contains an empty word anyway.
    */
  def bigramCounts(text: String): Map[String, Long] = {
    if (text == null) return Map.empty
    val toks = text.split("\\s+")
    val m = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < toks.length - 1) {
      if (toks(i).nonEmpty && toks(i + 1).nonEmpty)
        m.merge(toks(i) + " " + toks(i + 1), 1L, (a, b) => a + b)
      i += 1
    }
    import scala.jdk.CollectionConverters._
    m.asScala.view.mapValues(_.longValue()).toMap
  }

  /** Count of whitespace tokens of length >= `minLen` code points — the
    * BM25 document length, i.e. exactly the total [[tokenCounts]] would
    * sum to, without building the map (the corpus-stats scan of x92 needs
    * only this scalar per doc).
    */
  def tokenCount(text: String, minLen: Int): Long = {
    if (text == null) return 0L
    val toks = text.split("\\s+")
    var i = 0
    var n = 0L
    while (i < toks.length) {
      val t = toks(i)
      if (t.length >= minLen && t.codePointCount(0, t.length) >= minLen)
        n += 1
      i += 1
    }
    n
  }

  /** Word-trigram repetition stats of one document: Array(total, distinct)
    * over space-split trigrams, or an empty array when the doc has fewer
    * than 3 tokens. Split on a single space to match [[graft.queries.TextOps
    * .shingles]] (Spark `split(text, " ")`).
    */
  def triStats(text: String): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val toks = text.split(" ", -1)
    val n = toks.length - 2
    if (n < 1) return Array.emptyLongArray
    Array(n.toLong, trigramSetOf(toks).size.toLong)
  }

  /** Single definition of the trigram enumeration shared by [[triStats]]
    * and [[wordTrigramSet]] — a tokenization change stays consistent across
    * every operator built on word trigrams (x63, x70, q32, x40).
    */
  private def trigramSetOf(toks: Array[String]): java.util.LinkedHashSet[String] = {
    val n = toks.length - 2
    val seen = new java.util.LinkedHashSet[String](math.max(n, 1) * 2)
    var i = 0
    while (i < n) {
      seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    seen
  }

  /** Symmetric int8 quantization of one embedding: scale by 127/max|x| and
    * round via floor(x+0.5) (deterministic, engine-agnostic — NOT Java's
    * Math.round on negative halves). All-zero vectors quantize to zeros.
    * Floats are widened to double BEFORE any arithmetic so the DuckDB twin
    * (`CAST(x AS DOUBLE)`) sees bit-identical inputs.
    */
  def quantizeInt8(v: Array[Float]): Array[Int] = {
    if (v == null) return Array.empty
    var m = 0.0
    var i = 0
    while (i < v.length) {
      val a = math.abs(v(i).toDouble)
      if (a > m) m = a
      i += 1
    }
    val out = new Array[Int](v.length)
    if (m == 0.0) return out
    i = 0
    while (i < v.length) {
      out(i) = math.floor(v(i).toDouble / m * 127 + 0.5).toInt
      i += 1
    }
    out
  }

  /** Intersection size of two string arrays treated as sets (inputs are
    * already distinct per construction).
    */
  def intersectCount(a: Array[String], b: Array[String]): Int = {
    val (small, large) = if (a.length <= b.length) (a, b) else (b, a)
    val set = new java.util.HashSet[String](small.length * 2)
    var i = 0
    while (i < small.length) { set.add(small(i)); i += 1 }
    var n = 0
    var j = 0
    while (j < large.length) { if (set.contains(large(j))) n += 1; j += 1 }
    n
  }

  /** Nearest-centroid assignment (k-means E-step) for one vector. Distances
    * are sums of per-dimension integer-scaled squared differences
    * (`round(diff² * 1e9)` as long) — exact, order-independent, identical to
    * a SQL twin that sums the same scaled terms, so argmin never flips on a
    * ULP. Ties break toward the lowest label. `labels`/`cents` are parallel
    * arrays sorted by label ascending. Returns Array(label, distScaled).
    */
  def assignNearest(v: Array[Float], labels: Array[Int],
                    cents: Array[Array[Double]]): Array[Long] = {
    var bestLabel = -1
    var bestDist = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d2 = 0L
      var i = 0
      while (i < v.length) {
        val diff = v(i).toDouble - cent(i)
        d2 += math.round(diff * diff * 1e9)
        i += 1
      }
      if (d2 < bestDist) { bestDist = d2; bestLabel = labels(c) }
      c += 1
    }
    Array(bestLabel.toLong, bestDist)
  }

  /** Spark's `round(x, scale)` twin for doubles (HALF_UP over the decimal
    * string representation; NaN/Inf pass through like Spark's guard).
    */
  def roundHalfUp(x: Double, scale: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
}
