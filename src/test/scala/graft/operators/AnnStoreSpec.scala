package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnStoreSpec extends SparkSpec {

  import spark.implicits._

  private def tmpStore(): String = {
    val d = java.nio.file.Files.createTempDirectory("annstore").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/idx"
  }

  private lazy val emb = graft.queries.Tables.embeddings(spark, Sf).cache()
  private lazy val queries = emb.filter(col("vec_id") === 1)
    .select(col("vec_id").as("query_id"), col("embedding").as("qe")).cache()

  test("search over the persisted index equals the transient refined search") {
    val path = tmpStore()
    AnnStore.create(spark, path, emb)
    val persisted = AnnStore.search(spark, path, emb, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val transient = Pq.pqTopKRefined(emb, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(persisted == transient,
      s"store-only: ${persisted -- transient}; transient-only: ${transient -- persisted}")
  }

  test("codebooks round-trip parquet exactly") {
    val path = tmpStore()
    val cb = AnnStore.create(spark, path, emb, m = 8, ksub = 16, sampleSize = 256)
    val back = AnnStore.codebooks(spark, path)
    assert(back.m == cb.m && back.ds == cb.ds && back.ksub == cb.ksub)
    for (s <- cb.cents.indices; c <- cb.cents(s).indices)
      assert(java.util.Arrays.equals(back.cents(s)(c), cb.cents(s)(c)),
        s"centroid ($s,$c) drifted through parquet")
  }

  test("append encodes with the frozen codebooks; a planted twin is found") {
    val path = tmpStore()
    AnnStore.create(spark, path, emb)
    val nCodes = AnnStore.codes(spark, path).count()
    // plant an exact twin of the query vector under a fresh id
    val twinId = 999999L
    val twin = emb.filter(col("vec_id") === 1)
      .select(lit(twinId).as("vec_id"), col("embedding"))
    AnnStore.append(spark, path, twin)
    assert(AnnStore.codes(spark, path).count() == nCodes + 1)
    val live = emb.select("vec_id", "embedding")
      .union(twin.select("vec_id", "embedding"))
    val top = AnnStore.search(spark, path, live, queries, k = 3)
      .orderBy(col("cos_sim").desc, col("vec_id")).collect()
    val topIds = top.map(_.getLong(1)).toSet
    assert(topIds.contains(twinId),
      s"appended twin missing from top-3: ${top.mkString(", ")}")
    val twinRow = top.find(_.getLong(1) == twinId).get
    assert(math.abs(twinRow.getDouble(2) - 1.0) < 1e-9)
  }

  test("retrainCodebooks keeps the geometry, swaps codebooks+codes as one " +
      "pair, and answers equal the transient search on the new codebooks") {
    val path = tmpStore()
    AnnStore.create(spark, path, emb, m = 8, ksub = 16, sampleSize = 256)
    val before = AnnStore.codebooks(spark, path)
    // drift: a reflected copy of the corpus under fresh ids — a region
    // the frozen codebooks never saw
    val drift = emb.select((col("vec_id") + 10000000L).as("vec_id"),
      expr("transform(embedding, v -> CAST(0.25 - v AS FLOAT))")
        .as("embedding"))
    AnnStore.append(spark, path, drift)
    val grown = emb.select("vec_id", "embedding")
      .union(drift.select("vec_id", "embedding"))
    val cb = AnnStore.retrainCodebooks(spark, path, grown,
      iters = 4, sampleSize = 512)
    // geometry preserved, codebooks actually refit
    assert(cb.m == before.m && cb.ds == before.ds && cb.ksub == before.ksub)
    val changed = (for {
      s <- cb.cents.indices; c <- cb.cents(s).indices
    } yield !java.util.Arrays.equals(cb.cents(s)(c), before.cents(s)(c)))
      .exists(identity)
    assert(changed, "retrain on a drifted corpus left every centroid as-is")
    // codes were re-encoded as the same generation (pair swap): count
    // matches the grown corpus, and the persisted codebooks match cb
    assert(AnnStore.codes(spark, path).count() == grown.count())
    val back = AnnStore.codebooks(spark, path)
    for (s <- cb.cents.indices; c <- cb.cents(s).indices)
      assert(java.util.Arrays.equals(back.cents(s)(c), cb.cents(s)(c)),
        s"persisted codebook ($s,$c) is not the retrained one")
    // the store/transient equivalence contract survives the drift verb
    val persisted = AnnStore.search(spark, path, grown, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val transient = Pq.pqTopKRefined(grown, queries, k = 10,
        m = 8, ksub = 16, iters = 4, sampleSize = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(persisted == transient,
      s"store-only: ${persisted -- transient}; " +
        s"transient-only: ${transient -- persisted}")
  }

  test("retrainCodebooks on an empty store is a no-op; skewStat reads 1.0") {
    val path = tmpStore()
    AnnStore.create(spark, path, emb.filter(col("vec_id") < 0))
    val cb = AnnStore.retrainCodebooks(spark, path, emb)
    assert(cb.m == 0, "empty store grew geometry out of nothing")
    val (minR, meanR, n) = AnnStore.skewStat(spark, path)
    assert(minR == 1.0 && meanR == 1.0 && n == 0L)
  }

  test("skewStat flags frozen-codebook drift (entropy drops) and retrain " +
      "restores codeword occupancy") {
    val path = tmpStore()
    AnnStore.create(spark, path, emb, m = 8, ksub = 16, sampleSize = 256)
    val (minBal, _, _) = AnnStore.skewStat(spark, path)
    // drift 4x the base size into a reflected region the frozen
    // codebooks never saw: those vectors quantize into the few codewords
    // nearest the region and per-subspace occupancy entropy drops —
    // the corpus itself is DIVERSE, only the codebooks are stale
    val n = emb.count()
    val drift = (0 until 4).map { i =>
      emb.select((col("vec_id") + lit(10000000L * (i + 1))).as("vec_id"),
        expr(s"transform(embedding, v -> CAST(${0.2 + 0.05 * i} - v AS FLOAT))")
          .as("embedding"))
    }.reduce(_ unionAll _)
    AnnStore.append(spark, path, drift)
    val (minDrift, _, nCodes) = AnnStore.skewStat(spark, path)
    assert(nCodes == 5L * n)
    assert(minDrift < minBal,
      s"drifted store ($minDrift) not flagged vs balanced ($minBal)")
    // the stat's verb: retrain on the current distribution — codewords
    // re-tessellate both regions and occupancy recovers
    val grown = emb.select("vec_id", "embedding")
      .union(drift.select("vec_id", "embedding"))
    AnnStore.retrainCodebooks(spark, path, grown)
    val (minAfter, _, _) = AnnStore.skewStat(spark, path)
    assert(minAfter > minDrift,
      s"retrain did not restore codeword occupancy: $minAfter vs $minDrift")
  }
}
