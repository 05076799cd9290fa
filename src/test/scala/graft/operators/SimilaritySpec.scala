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

  test("IVF ANN reaches recall@10 >= 0.5 vs exact with nprobe=4/nlist=16") {
    val (emb, q) = queriesDf(Seq(1L, 7L, 99L))
    val exact = neighborSets(Similarity.bruteForceTopK(emb, q, k = 10))
    val ivf = neighborSets(Similarity.ivfTopK(emb, q, k = 10, nlist = 16, nprobe = 4))
    val recalls = exact.map { case (qid, ex) =>
      ivf.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    assert(recalls.sum / recalls.size >= 0.5,
      s"mean recall ${recalls.sum / recalls.size} < 0.5 ($recalls)")
  }

  test("ANN results are a subset of the corpus and never echo the query id") {
    val (emb, q) = queriesDf(Seq(1L))
    val res = Similarity.annTopK(emb, q, k = 10).collect()
    assert(res.forall(_.getLong(1) != 1L))
  }
}
