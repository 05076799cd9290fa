package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DistributionDriftSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("a single-slice corpus has exactly zero divergence") {
    // ps == pc token-for-token -> ln ratio is 0 before scaling: kl == 0.0
    val out = DistributionDrift.sourceKl(
      docs((1L, "a", "alpha beta gamma"), (2L, "a", "beta gamma gamma")))
      .collect()
    assert(out.length == 1)
    assert(out.head.getDouble(2) == 0.0)
    assert(out.head.getLong(1) == 6L)
  }

  test("the skewed slice diverges more than the corpus-like slice") {
    val balanced = "alpha beta gamma delta"
    val out = DistributionDrift.sourceKl(docs(
        (1L, "like", balanced), (2L, "like", balanced),
        (3L, "other", balanced), (4L, "other", balanced),
        (5L, "skew", "alpha alpha alpha alpha")))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("skew") > out("like"),
      s"skewed slice must diverge more: $out")
    assert(out.values.forall(_ >= 0.0), s"KL must be non-negative: $out")
  }

  test("score matches the closed add-one formula exactly") {
    // corpus: a="x x y", b="y" -> vocab {x:2, y:2}, N=4, V=2
    // slice a: ns=3; ps(x)=(2+1)/5, ps(y)=(1+1)/5; pc(x)=pc(y)=(2+1)/6
    val out = DistributionDrift.sourceKl(
        docs((1L, "a", "x x y"), (2L, "b", "y")))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    def term(ps: Double, pc: Double): Long =
      math.round(math.log(ps / pc) * UnigramLm.LnScale)
    val expA = BigDecimal(
        (3 * term(3.0 / 5, 3.0 / 6) + 2 * term(2.0 / 5, 3.0 / 6)).toDouble /
          (5.0 * UnigramLm.LnScale))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("a") == expA, s"${out("a")} != $expA")
  }

  test("klAgainstReference: self-reference reproduces sourceKl with zero OOV") {
    val d = graft.queries.Tables.documents(spark, Sf)
    val tf = DistributionDrift.sliceTokenCounts(d, "source")
    val vocab = tf.groupBy("tok").agg(sum("cs").as("c"))
    val scalars = vocab.agg(sum("c").as("n_total"), count(lit(1)).as("v"))
    val self = DistributionDrift.klAgainstReference(d, vocab, scalars)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val batch = DistributionDrift.sourceKl(d)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(self.keySet == batch.keySet)
    self.foreach { case (s, (n, kl, oov)) =>
      assert((n, kl) == batch(s), s"$s: ($n,$kl) != ${batch(s)}")
      assert(oov == 0.0, s"$s: self-reference oov_rate $oov != 0")
    }
  }

  test("klAgainstReference: out-of-vocabulary influx reports as oov_rate") {
    val ref = docs((1L, "a", "alpha beta alpha beta"))
    val (vocab, scalars) = {
      val tf = DistributionDrift.sliceTokenCounts(ref, "source")
      val v = tf.groupBy("tok").agg(sum("cs").as("c"))
      (v, v.agg(sum("c").as("n_total"), count(lit(1)).as("v")))
    }
    // incoming batch: half its tokens are new
    val out = DistributionDrift.klAgainstReference(
        docs((2L, "a", "alpha beta newtok newtok")), vocab, scalars)
      .collect().head
    assert(out.getLong(1) == 2L)      // in-vocab tokens only
    assert(out.getDouble(3) == 0.5)   // 2 of 4 tokens unseen
    assert(out.getDouble(2) >= 0.0)
  }

  test("registry entry: one non-negative row per source at sf0.001") {
    val out = graft.queries.CurationOps.x98_source_kl.build(spark, Sf).collect()
    val sources = graft.queries.Tables.documents(spark, Sf)
      .select("source").distinct().count()
    assert(out.length == sources.toInt)
    assert(out.map(_.getString(0)).distinct.length == out.length)
    assert(out.forall(_.getDouble(2) >= 0.0))
  }
}
