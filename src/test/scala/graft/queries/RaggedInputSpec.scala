package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec}

/** RAGGED-vector battery — the null battery's sequel (round-15 verdict
  * directive #4): embeddings rows whose vector LENGTH differs from the
  * corpus dimension, through every registry entry and the
  * Similarity/Pq/IvfStore/AnnStore ingress paths.
  *
  * Posture (decided and documented at `Similarity.dropInvalidVecs`):
  * ragged rows DEAD-LETTER at ingress exactly like nulls — every distance
  * kernel iterates min(lengths), so the alternative (letting them
  * through) scores a silently-wrong prefix cosine that is
  * indistinguishable from a real distance. The gate here is therefore
  * TWO-tier: every registry entry must run, and the vector entries must
  * produce results IDENTICAL to the clean corpus — ragged rows invisible,
  * never seated, never shifting a neighbor list.
  */
class RaggedInputSpec extends SparkSpec {

  /** vec_ids of the planted invalid rows (outside every corpus range). */
  private val RaggedIds =
    Set(8000001L, 8000002L, 8000003L, 8000004L)

  // clean-table twins plus an embeddings table with three ragged rows
  // (short 32, long 80, empty 0) and one null row appended
  private lazy val raggedDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ragged").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents").foreach { t =>
      spark.read.parquet(s"$Sf/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val base = spark.read.parquet(s"$Sf/embeddings.parquet")
    val ragged = Seq(
      (8000001L, Array.fill(32)(0.1f), 0),
      (8000002L, Array.fill(80)(0.2f), 0),
      (8000003L, Array.empty[Float], 0))
      .toDF("vec_id", "embedding", "label")
      .unionByName(Seq(8000004L).toDF("vec_id")
        .withColumn("embedding", lit(null).cast("array<float>"))
        .withColumn("label", lit(0)))
    base.unionByName(ragged.select(base.columns.map(col).toIndexedSeq: _*))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  // same skips as EmptyInputSpec: CRUD + tile-store entries build their
  // own non-table fixtures
  private val skip = Set("q36a_lookup", "q36b_delete", "q36c_update",
    "x46_tile", "x47_heatmap")

  SparkEntry.queries.keys.filterNot(skip).foreach { name =>
    test(s"$name runs on ragged-embedding tables") {
      val n = SparkEntry.queries(name)(spark, raggedDir).count()
      assert(n >= 0)
    }
  }

  // the strong half: vector entries over the ragged corpus must equal the
  // clean corpus exactly — a ragged row that slipped past an ingress
  // guard either appears in the output (id leak) or shifts a neighbor
  // list / pair set (silent wrong distance); both fail the compare
  private val vectorEntries = Seq(
    "q33_knn", "x42_embed_neardup", "x42b_embed_neardup_cell",
    "x42c_embed_neardup_auto", "x43_ann_lsh", "x43b_ann_ivf",
    "x43c_ann_lsh_planted", "x43d_ann_ivf_planted", "x93_ann_pq",
    "x93b_ann_pq_planted")

  vectorEntries.foreach { name =>
    test(s"$name: ragged rows are invisible (result == clean corpus)") {
      val clean = SparkEntry.queries(name)(spark, Sf)
        .collect().map(_.toString).sorted.toSeq
      val ragged = SparkEntry.queries(name)(spark, raggedDir)
        .collect().map(_.toString).sorted.toSeq
      assert(ragged == clean,
        s"$name changed under ragged rows: clean=${clean.size} " +
          s"ragged=${ragged.size}; " +
          s"diff=${(ragged.diff(clean) ++ clean.diff(ragged)).take(5)}")
      assert(!ragged.exists(r => RaggedIds.exists(id => r.contains(id.toString))),
        "a ragged vec_id leaked into the output")
    }
  }

  test("IvfStore ingest dead-letters ragged rows; search serves clean distances") {
    import graft.operators.{IvfStore, Similarity}
    val dir = java.nio.file.Files.createTempDirectory("graft-rivf").toString
    val emb = spark.read.parquet(s"$raggedDir/embeddings.parquet")
    IvfStore.create(spark, dir, emb, nlist = 8, kmeansIters = 2)
    val stored = spark.read.parquet(s"$dir/vectors")
    assert(stored.filter(col("vec_id").isin(RaggedIds.toSeq: _*)).count() == 0,
      "ragged/null rows were ingested into the IVF store")
    // append path takes the same guard
    IvfStore.append(spark, dir, emb.filter(col("vec_id").isin(RaggedIds.toSeq: _*)))
    assert(spark.read.parquet(s"$dir/vectors")
      .filter(col("vec_id").isin(RaggedIds.toSeq: _*)).count() == 0,
      "append ingested ragged/null rows")
    // a ragged QUERY takes no seat instead of scoring a prefix cosine
    val q = Seq((77L, Array.fill(32)(0.3f)))
    import spark.implicits._
    val res = IvfStore.search(spark, dir,
      q.toDF("query_id", "qe"), k = 5)
    assert(res.count() == 0, "a ragged query was served")
  }

  test("AnnStore ingest dead-letters ragged rows; search serves clean distances") {
    import graft.operators.AnnStore
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rann").toString
    val emb = spark.read.parquet(s"$raggedDir/embeddings.parquet")
    AnnStore.create(spark, dir, emb)
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.filter(col("vec_id").isin(RaggedIds.toSeq: _*)).count() == 0,
      "ragged/null rows were encoded into the PQ store")
    AnnStore.append(spark, dir, emb.filter(col("vec_id").isin(RaggedIds.toSeq: _*)))
    assert(spark.read.parquet(s"$dir/codes")
      .filter(col("vec_id").isin(RaggedIds.toSeq: _*)).count() == 0,
      "append encoded ragged/null rows")
    val res = AnnStore.search(spark, dir, emb,
      Seq((77L, Array.fill(80)(0.3f))).toDF("query_id", "qe"), k = 5)
    assert(res.count() == 0, "a ragged query was served")
  }

  test("kmeansCentroids trains clean centroids from a ragged corpus (no NPE, modal dim)") {
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$raggedDir/embeddings.parquet")
    val cents = Similarity.kmeansCentroids(emb, nlist = 8, iters = 2)
    assert(cents.nonEmpty && cents.forall(_.length == 64),
      s"centroid dims: ${cents.map(_.length).toSet}")
  }
}
