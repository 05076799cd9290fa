package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.Tables

class SimilaritySpec extends SparkSpec {

  private def queriesDf(ids: Seq[Long]): (DataFrame, DataFrame) = {
    val emb = Tables.embeddings(spark, Sf)
    val q = emb.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    (emb, q)
  }

  private def neighborSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rows) =>
        q -> rows.map(_.getLong(1)).toSet
      }

  test("brute force returns exactly k ranked neighbors per query") {
    val (emb, q) = queriesDf(Seq(1L, 7L, 99L))
    val res = Similarity.bruteForceTopK(emb, q, k = 10)
    val counts = res.groupBy("query_id").count().collect()
    assert(counts.length == 3 && counts.forall(_.getLong(1) == 10))
    // ranks are 1..10 with strictly the top scores first
    val r1 = res.filter(col("query_id") === 1).orderBy("rnk")
      .select("cos_sim").collect().map(_.getDouble(0))
    assert(r1.toSeq == r1.sortBy(-_).toSeq)
  }

  test("LSH ANN reaches recall@10 >= 0.8 vs exact on sf0.001") {
    val (emb, q) = queriesDf(Seq(1L, 7L, 99L))
    val exact = neighborSets(Similarity.bruteForceTopK(emb, q, k = 10))
    val ann = neighborSets(Similarity.annTopK(emb, q, k = 10))
    val recalls = exact.map { case (qid, ex) =>
      ann.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    assert(recalls.sum / recalls.size >= 0.8,
      s"mean recall ${recalls.sum / recalls.size} < 0.8 ($recalls)")
  }

  // Recall ceilings here are set by the corpus, not the index: the synthetic
  // embeddings are near-isotropic (max pairwise cosine ~= 0.47), so "true"
  // neighbors are barely closer than random points and scatter across cells.
  // The gates below are what the deterministic k-means pipeline measures on
  // this corpus (exactly reproducible), with the comparative gate proving the
  // fitted centroids beat unfitted seeding.
  private val ivfQids = Seq(1L, 7L, 99L, 150L, 230L, 301L, 404L, 480L)

  private def meanRecall(exact: Map[Long, Set[Long]], got: Map[Long, Set[Long]]): Double = {
    val rs = exact.map { case (qid, ex) =>
      got.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    rs.sum / rs.size
  }

  test("IVF ANN recall@10 with k-means centroids: >=0.54 at nprobe=4, >=0.79 at nprobe=8") {
    val (emb, q) = queriesDf(ivfQids)
    val exact = neighborSets(Similarity.bruteForceTopK(emb, q, k = 10))
    val r4 = meanRecall(exact,
      neighborSets(Similarity.ivfTopK(emb, q, k = 10, nlist = 16, nprobe = 4)))
    val r8 = meanRecall(exact,
      neighborSets(Similarity.ivfTopK(emb, q, k = 10, nlist = 16, nprobe = 8)))
    assert(r4 >= 0.54, s"recall@10 nprobe=4 $r4 < 0.54")
    assert(r8 >= 0.79, s"recall@10 nprobe=8 $r8 < 0.79")
  }

  test("k-means Lloyd passes beat unfitted farthest-point seeding") {
    val (emb, q) = queriesDf(ivfQids)
    val exact = neighborSets(Similarity.bruteForceTopK(emb, q, k = 10))
    val fitted = meanRecall(exact, neighborSets(
      Similarity.ivfTopK(emb, q, k = 10, nlist = 16, nprobe = 4, kmeansIters = 2)))
    val unfitted = meanRecall(exact, neighborSets(
      Similarity.ivfTopK(emb, q, k = 10, nlist = 16, nprobe = 4, kmeansIters = 0)))
    assert(fitted > unfitted + 0.05,
      s"k-means recall $fitted not better than seed-only $unfitted")
  }

  test("ANN results are a subset of the corpus and never echo the query id") {
    val (emb, q) = queriesDf(Seq(1L))
    val res = Similarity.annTopK(emb, q, k = 10).collect()
    assert(res.forall(_.getLong(1) != 1L))
  }
}
