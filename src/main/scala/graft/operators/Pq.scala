package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (PQ) for approximate nearest-neighbor search — the
  * MEMORY-bound ANN path (Jégou, Douze & Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011). x43's LSH and x43b's IVF bound
  * the COMPUTE of a 100 TB search; PQ bounds its FOOTPRINT: a 64-dim
  * float vector (256 B) compresses to `m` one-byte codes + one stored
  * norm (8 + 8 B at the defaults, 16×), so a billion-vector index fits in
  * executor memory where raw vectors cannot, and a full-corpus ADC scan
  * reads 6% of the bytes the exact scan reads.
  *
  * Shape (all deterministic, nothing corpus-sized on the driver):
  *
  *  - TRAIN: per-subspace Lloyd k-means on the same bounded hash-ordered
  *    sample device as [[Similarity.kmeansCentroids]] (xxhash64 order —
  *    unbiased under ingest-order correlation, stable across cluster
  *    sizes). Driver flops O(sample · ksub · dim · iters); codebooks are
  *    m × ksub × ds doubles — broadcast-sized at any corpus scale.
  *  - ENCODE: map-only kernel, argmin-L2 per subspace (ties to the lowest
  *    code, ULP-free: plain double arithmetic on both compare sides), plus
  *    the exact vector norm so ADC can rank by approximate COSINE — the
  *    metric every other vector op here uses.
  *  - SEARCH (ADC): per query one m × ksub table of subspace dot products;
  *    each encoded row scores with m table lookups — no float vector is
  *    ever read again. Tables ride the closure (queries × m × ksub
  *    doubles); ranking reuses [[Similarity.rank]]'s per-partition
  *    heap + survivors-only window (no corpus-wide sort).
  *
  * Recall is gated in SimilaritySpec against the exact q33 answer, and the
  * asymmetric-distance identity (a query against its OWN code ranks
  * itself first) is property-tested.
  */
object Pq {

  /** Trained PQ codebooks: `cents(sub)(code)` is a `ds`-dim centroid. */
  final case class Codebooks(m: Int, ds: Int,
                             cents: Array[Array[Array[Double]]])
      extends Serializable {
    def ksub: Int = if (cents.isEmpty) 0 else cents(0).length
  }

  /** Per-subspace Lloyd k-means over a bounded hash-ordered sample.
    * Deterministic: sample order is (xxhash64(vec_id), vec_id); seeds are
    * the first `ksub` DISTINCT sub-vectors in that order; assignment ties
    * go to the lowest code; empty clusters keep their previous centroid.
    */
  def train(corpus: DataFrame, dim: Int = 64, m: Int = 8, ksub: Int = 16,
            iters: Int = 4, sampleSize: Int = 256,
            droppedAcc: Option[org.apache.spark.util.LongAccumulator] = None): Codebooks = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val ds = dim / m
    // null/ragged vectors cannot train codebooks — drop at ingress (the
    // Similarity quantizer guard's twin), observable via droppedAcc
    val sample: Array[Array[Double]] = Similarity
      .dropInvalidVecs(corpus, dim, droppedAcc)
      .orderBy(xxhash64(col("vec_id")).asc, col("vec_id").asc)
      .limit(sampleSize)
      .select("embedding")
      .collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    if (sample.isEmpty) return Codebooks(m, ds, Array.empty)

    def subOf(v: Array[Double], s: Int): Array[Double] = {
      val out = new Array[Double](ds)
      var i = 0
      while (i < ds) {
        out(i) = if (s * ds + i < v.length) v(s * ds + i) else 0.0
        i += 1
      }
      out
    }
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < ds) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }

    val cents = Array.tabulate(m) { s =>
      val subs = sample.map(subOf(_, s))
      // distinct seeds in sample order
      val seen = scala.collection.mutable.LinkedHashSet.empty[Seq[Double]]
      subs.foreach { v => if (seen.size < ksub) seen += v.toSeq }
      var cs = seen.toArray.map(_.toArray)
      var it = 0
      while (it < iters) {
        val sums = Array.fill(cs.length)(new Array[Double](ds))
        val counts = new Array[Long](cs.length)
        subs.foreach { v =>
          var best = 0; var bestD = d2(v, cs(0)); var c = 1
          while (c < cs.length) {
            val dd = d2(v, cs(c))
            if (dd < bestD) { bestD = dd; best = c }
            c += 1
          }
          counts(best) += 1
          var i = 0
          while (i < ds) { sums(best)(i) += v(i); i += 1 }
        }
        cs = Array.tabulate(cs.length) { c =>
          if (counts(c) == 0L) cs(c)
          else sums(c).map(_ / counts(c))
        }
        it += 1
      }
      cs
    }
    Codebooks(m, ds, cents)
  }

  /** Map-only PQ encode: (vec_id, codes byte[m], vnorm). */
  def encode(corpus: DataFrame, cb: Codebooks): DataFrame = {
    val enc = udf { (e: Seq[Float]) =>
      if (e == null || cb.cents.isEmpty) (Array.empty[Byte], 0.0)
      else {
        val v = e.toArray.map(_.toDouble)
        val codes = new Array[Byte](cb.m)
        var s = 0
        while (s < cb.m) {
          val off = s * cb.ds
          val cs = cb.cents(s)
          var best = 0; var bestD = Double.MaxValue; var c = 0
          while (c < cs.length) {
            var dd = 0.0; var i = 0
            while (i < cb.ds) {
              val x = (if (off + i < v.length) v(off + i) else 0.0) - cs(c)(i)
              dd += x * x
              i += 1
            }
            if (dd < bestD) { bestD = dd; best = c }
            c += 1
          }
          codes(s) = best.toByte
          s += 1
        }
        var n = 0.0; var i = 0
        while (i < v.length) { n += v(i) * v(i); i += 1 }
        (codes, math.sqrt(n))
      }
    }
    corpus.select(col("vec_id"), enc(col("embedding")).as("e"))
      .select(col("vec_id"), col("e._1").as("codes"), col("e._2").as("vnorm"))
  }

  /** ADC top-k by approximate cosine: queries is a small
    * (query_id, qe) frame (collected — it is the handful of probe
    * vectors, never the corpus).
    */
  def adcTopK(encoded: DataFrame, queries: DataFrame, cb: Codebooks,
              k: Int): DataFrame = {
    val sp = encoded.sparkSession
    import sp.implicits._
    val qs: Array[(Long, Array[Double])] = queries
      .select(col("query_id").cast(LongType), col("qe"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
    if (qs.isEmpty || cb.cents.isEmpty)
      return Similarity.rank(
        sp.emptyDataset[(Long, Long, Double)]
          .toDF("query_id", "vec_id", "cos_sim"), k)
    // per-query ADC tables: table(q)(s*ksub + c) = <q_sub_s, cent(s)(c)>
    val ksub = cb.ksub
    val tables: Map[Long, (Array[Double], Double)] = qs.map { case (qid, q) =>
      val t = new Array[Double](cb.m * ksub)
      var s = 0
      while (s < cb.m) {
        val off = s * cb.ds
        var c = 0
        while (c < ksub) {
          var d = 0.0; var i = 0
          while (i < cb.ds) {
            d += (if (off + i < q.length) q(off + i) else 0.0) * cb.cents(s)(c)(i)
            i += 1
          }
          t(s * ksub + c) = d
          c += 1
        }
        s += 1
      }
      var n = 0.0; var i = 0
      while (i < q.length) { n += q(i) * q(i); i += 1 }
      qid -> (t, math.sqrt(n))
    }.toMap
    val qIds = tables.keys.toSeq.sorted
    val score = udf { (qid: Long, codes: Array[Byte], vnorm: Double) =>
      val (t, qn) = tables(qid)
      if (codes == null || codes.isEmpty || vnorm == 0.0 || qn == 0.0) 0.0
      else {
        var s = 0; var d = 0.0
        while (s < codes.length) {
          d += t(s * ksub + (codes(s) & 0xff))
          s += 1
        }
        d / (qn * vnorm)
      }
    }
    val qFrame = qIds.toDF("query_id")
    val scored = encoded
      .crossJoin(broadcast(qFrame))
      .select(col("query_id"), col("vec_id"),
        score(col("query_id"), col("codes"), col("vnorm")).as("cos_sim"))
    Similarity.rank(scored, k)
  }

  /** Pure-ADC train + encode + search (no refinement). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             dim: Int = 64, m: Int = 8, ksub: Int = 16,
             iters: Int = 4, sampleSize: Int = 256): DataFrame = {
    val cb = train(corpus, dim, m, ksub, iters, sampleSize)
    adcTopK(encode(corpus, cb), queries, cb, k)
  }

  /** Size-derived ADC shortlist: n/40 clamped to [100, 10000]. A FIXED
    * shortlist decays as corpus density rises — on the isotropic worst-case
    * corpus (BASELINE.md round-10 table): at 20k vectors recall@10 is
    * 0.712 with shortlist 100, 0.863 at 250, 0.950 at 500 (= n/40), 1.000
    * at 1000 — so the slope is pinned where 0.95 held. The cap bounds the
    * exact-rerank candidate set at any corpus size (queries × 10k rows is
    * still broadcast-sized); past it (≳400k vectors per search partition)
    * recall maintenance moves to the code budget (m/ksub) or an IVF-PQ
    * split, not an unbounded rerank. Clustered real-world embedding
    * corpora need far less than this worst-case slope.
    */
  private[graft] def derivedShortlist(n: Long): Int =
    math.max(100L, math.min(10000L, n / 40L)).toInt

  /** ADC shortlist + exact cosine re-rank (IVFADC+R-style refinement) —
    * the x93 registry shape. The memory-bound ADC scan nominates
    * `shortlist` candidates per query (size-derived by default); raw float
    * vectors are then read ONLY for that queries × shortlist id set
    * (broadcast semi-joined into the corpus scan — no corpus shuffle) and
    * re-ranked by exact cosine. Final recall@10 equals the ADC scan's
    * recall@shortlist, gated ≥0.95 at sf0.001 and ≥0.85 at the probe
    * scales where raw ADC@10 measures 0.55 on the near-isotropic corpus
    * (the quantization worst case).
    */
  def pqTopKRefined(corpus0: DataFrame, queries: DataFrame, k: Int,
                    shortlist: Int = 0, dim: Int = 64, m: Int = 16,
                    ksub: Int = 32, iters: Int = 4,
                    sampleSize: Int = 512,
                    droppedAcc: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    // null/ragged rows (and queries) can't be encoded or scored — drop
    // at ingress, observable via droppedAcc (the train below sees the
    // already-filtered relation, so drops count once)
    val corpus = Similarity.dropInvalidVecs(corpus0, dim, droppedAcc)
    val q = queries.filter(col("qe").isNotNull && size(col("qe")) === dim)
    val sl = if (shortlist > 0) shortlist
             else derivedShortlist(corpus.count())
    val cb = train(corpus, dim, m, ksub, iters, sampleSize)
    val cands = adcTopK(encode(corpus, cb), q, cb, sl)
      .select(col("query_id"), col("vec_id"))
    val scored = corpus
      .join(broadcast(cands), "vec_id")
      .join(broadcast(q), "query_id")
      .withColumn("cos_sim", Similarity.cosine(col("embedding"), col("qe")))
      .select(col("query_id"), col("vec_id"), col("cos_sim"))
    Similarity.rank(scored, k)
  }
}
