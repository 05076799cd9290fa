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
}
