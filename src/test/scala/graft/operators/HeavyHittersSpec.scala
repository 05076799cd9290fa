package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic skewed stream: token t_i (i in 1..100) gets weight
    * proportional to 1/i-ish via integer decay, shuffled across the frame
    * by a hash so partition boundaries don't align with token identity.
    */
  private def skewedFreqs(parts: Int) = {
    val rows = (1 to 100).flatMap { i =>
      val w = math.max(1, 2000 / (i * i)) // 2000, 500, 222, 125, 80, 55, ...
      // split each token's weight into several rows so partials must merge
      Seq.fill(4)((s"tok$i", (w / 4).max(1).toLong))
    }
    rows.toDF("tok", "tf").repartition(parts, expr("xxhash64(tok, tf)"))
  }

  private def trueCounts(parts: Int): Map[String, Long] =
    skewedFreqs(parts).groupBy("tok").agg(sum("tf").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("MG summary: estimates undercount by at most W/(k+1)") {
    val k = 16
    val df = skewedFreqs(8)
    val truth = trueCounts(8)
    val w = truth.values.sum
    val out = df.agg(HeavyHitters.mgSketch(col("tok"), col("tf"), k).as("mg"))
      .select(col("mg.toks").as("toks"), col("mg.ws").as("ws"))
      .collect().head
    val est = out.getSeq[String](0).zip(out.getSeq[Long](1)).toMap
    assert(est.nonEmpty && est.size <= k)
    val bound = w.toDouble / (k + 1)
    est.foreach { case (tok, e) =>
      val t = truth(tok)
      assert(e <= t, s"$tok overcounted: $e > $t")
      assert(t - e <= bound, s"$tok undercounted past W/(k+1): $t - $e > $bound")
    }
    // every token heavier than the bound must be present
    truth.filter(_._2 > bound).keys.foreach { tok =>
      assert(est.contains(tok), s"heavy token $tok missing from summary")
    }
  }

  test("summary guarantee holds across partitionings (merge path)") {
    for (parts <- Seq(1, 3, 13)) {
      val k = 16
      val truth = trueCounts(parts)
      val w = truth.values.sum
      val bound = w.toDouble / (k + 1)
      val out = skewedFreqs(parts)
        .agg(HeavyHitters.mgSketch(col("tok"), col("tf"), k).as("mg"))
        .select(col("mg.toks")).as[Seq[String]].collect().head.toSet
      truth.filter(_._2 > bound).keys.foreach { tok =>
        assert(out.contains(tok), s"parts=$parts: heavy token $tok missing")
      }
    }
  }

  test("exactTopK on a sub-vocabulary sketch matches the naive full count") {
    // vocab 100 >> sketchK 32: decay happens, yet the skewed top-4 all
    // clear W/(sketchK+1) so the recounted result is exactly the truth
    val df = skewedFreqs(8)
    val truth = trueCounts(8)
    val w = truth.values.sum
    val top4 = truth.toSeq.sortBy { case (t, c) => (-c, t) }.take(4)
    assert(top4.forall(_._2 > w.toDouble / 33),
      "fixture must put top-4 above the sketch bound")
    val got = HeavyHitters.exactTopK(df, k = 4, sketchK = 32)
      .orderBy("rn").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == top4, s"got $got\nwant $top4")
  }

  test("exactTopK falls back to the exact count when the bound premise fails") {
    // 200 near-uniform tokens, sketchK=8: every true weight sits far below
    // W/(sketchK+1), so the sketch may omit true top-k tokens — the
    // premise validation must detect that and recount the vocabulary
    val rows = (1 to 200).flatMap(i => Seq.fill(2)((f"tok$i%03d", 5L)))
    val df = rows.toDF("tok", "tf").repartition(8, expr("xxhash64(tok)"))
    val truth = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val w = truth.values.sum
    assert(truth.values.max <= w.toDouble / 9,
      "fixture must keep every token below the sketch bound")
    val want = truth.toSeq.sortBy { case (t, c) => (-c, t) }.take(5)
    val got = HeavyHitters.exactTopK(df, k = 5, sketchK = 8)
      .orderBy("rn").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, s"got $got\nwant $want")
  }

  test("exactTopK lossless witness: sketchK >= vocab stays on the semi-join path") {
    // vocab 6 <= sketchK 32: no decay ever fires, sum(sketch) == W, so the
    // result is trusted even though the k-th token (weight 1) sits far
    // below W/(sketchK+1) ~ 30 — the lossless witness, not the bound,
    // keeps the candidates-only recount
    val df = (("big", 1000L) +: (1 to 5).map(i => (s"s$i", 1L)))
      .toDF("tok", "tf")
    val got = HeavyHitters.exactTopK(df, k = 3, sketchK = 32)
    assert(got.queryExecution.executedPlan.toString.contains("LeftSemi"),
      "lossless regime must keep the candidates semi-join plan")
    assert(got.orderBy("rn").collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq == Seq(("big", 1000L), ("s1", 1L), ("s2", 1L)))
  }

  test("MgMergeState: a replayed batchId merges exactly once") {
    val st = new graft.streaming.CurationStreams.MgMergeState(4, Map.empty)
    val m0 = st.merge(0L, Map("a" -> 5L, "b" -> 2L))
    assert(m0 == Map("a" -> 5L, "b" -> 2L))
    // at-least-once replay of epoch 0: summary must NOT double
    assert(st.merge(0L, Map("a" -> 5L, "b" -> 2L)) == m0)
    val m1 = st.merge(1L, Map("a" -> 1L, "c" -> 3L))
    assert(m1 == Map("a" -> 6L, "b" -> 2L, "c" -> 3L))
    // stale replay after progress is also ignored
    assert(st.merge(0L, Map("z" -> 99L)) == m1)
  }

  test("mergeSummaries: sums, decays by the (k+1)-th largest, keeps <= k") {
    val a = Map("a" -> 10L, "b" -> 6L, "c" -> 3L)
    val b = Map("b" -> 4L, "d" -> 5L, "e" -> 2L)
    // combined: a=10 b=10 d=5 c=3 e=2; k=3 -> d(4th largest)=3
    val got = HeavyHitters.mergeSummaries(a, b, k = 3)
    assert(got == Map("a" -> 7L, "b" -> 7L, "d" -> 2L), got.toString)
    // no decay needed when the union fits
    assert(HeavyHitters.mergeSummaries(Map("a" -> 1L), Map("b" -> 1L), 3) ==
      Map("a" -> 1L, "b" -> 1L))
  }

  test("zero/negative weights and nulls are ignored") {
    val df = Seq(("a", 5L), ("b", 0L), ("c", -3L), (null, 9L), ("a", 2L))
      .toDF("tok", "tf")
    val out = df.agg(HeavyHitters.mgSketch(col("tok"), col("tf"), 4).as("mg"))
      .select(col("mg.toks"), col("mg.ws")).collect().head
    val est = out.getSeq[String](0).zip(out.getSeq[Long](1)).toMap
    assert(est == Map("a" -> 7L))
  }

  test("registry entry equals the vocabulary-wide count's top-10 at sf0.001") {
    val docs = graft.queries.Tables.documents(spark, Sf)
    val tf = UnigramLm.docTermFreqs(docs, minLen = 4)
    val naive = tf.groupBy("tok").agg(sum("tf").as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = graft.queries.CurationOps.x96_heavy_hitters.build(spark, Sf)
      .orderBy("rn").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == naive)
  }
}
