package graft.operators

import graft.SparkSpec
import scala.util.Random

/** Randomized differential tests: the distributed LM-family operators vs
  * naive in-memory reference models over seeded random corpora — the
  * cross-check layer the formula point-tests cannot give (random tf
  * collisions, OOV mixes, per-slice skew). All rounding mirrors the
  * operators' contract exactly (BigDecimal HALF_UP, the Spark `round`
  * semantics), so equality is `==` on doubles, not tolerance.
  */
class LmPropertySpec extends SparkSpec {

  import spark.implicits._

  private val vocabPool = (1 to 20).map(i => s"w$i")

  private def randDocs(seed: Int, n: Int): Seq[(Long, String, String)] = {
    val r = new Random(seed)
    (1 to n).map { i =>
      val len = 5 + r.nextInt(35)
      val words = Seq.fill(len)(vocabPool(r.nextInt(vocabPool.length)))
      (i.toLong, s"src${r.nextInt(4)}", words.mkString(" "))
    }
  }

  private def halfUp(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def scaledLn(x: Double): Long =
    BigDecimal(math.log(x) * UnigramLm.LnScale)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact

  test("unigram selfScore equals the naive in-memory model on random corpora") {
    for (seed <- Seq(11, 23, 47)) {
      val docs = randDocs(seed, 30)
      val toks = docs.map { case (id, _, t) => id -> t.split(" ").toSeq }.toMap
      val counts = toks.values.flatten.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      val n = counts.values.sum
      val v = counts.size
      val naive = toks.map { case (id, ts) =>
        val sum = ts.map(w => scaledLn((counts.getOrElse(w, 0L) + 1.0) / (n + v + 1.0))).sum
        id -> ((ts.size.toLong, halfUp(-sum.toDouble / (ts.size.toDouble * UnigramLm.LnScale), 6)))
      }
      val got = UnigramLm.selfScore(docs.toDF("doc_id", "source", "text"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got == naive, s"seed $seed: ${got.toSeq.diff(naive.toSeq).take(3)}")
    }
  }

  test("bigram selfScore equals the naive interpolated model on random corpora") {
    for (seed <- Seq(5, 17)) {
      val docs = randDocs(seed, 20)
      val toks = docs.map { case (id, _, t) => id -> t.split(" ").toSeq }.toMap
      val uni = toks.values.flatten.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      val n = uni.values.sum
      val v = uni.size
      val bi = toks.values.flatMap(ts => ts.zip(ts.tail))
        .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      val naive = toks.collect { case (id, ts) if ts.size >= 2 =>
        val pairs = ts.zip(ts.tail)
        val sum = pairs.map { case (w1, w2) =>
          val pb = (bi.getOrElse((w1, w2), 0L) + 1.0) / (uni.getOrElse(w1, 0L) + v + 1.0)
          val pu = (uni.getOrElse(w2, 0L) + 1.0) / (n + v + 1.0)
          scaledLn(BigramLm.Lambda * pb + (1.0 - BigramLm.Lambda) * pu)
        }.sum
        id -> ((pairs.size.toLong,
          halfUp(-sum.toDouble / (pairs.size.toDouble * UnigramLm.LnScale), 6)))
      }
      val got = BigramLm.selfScore(docs.toDF("doc_id", "source", "text"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got == naive, s"seed $seed: ${got.toSeq.diff(naive.toSeq).take(3)}")
    }
  }

  test("sourceKl equals the naive closed-KL computation on random corpora") {
    for (seed <- Seq(7, 31)) {
      val docs = randDocs(seed, 25)
      val slice = docs.groupBy(_._2).map { case (s, ds) =>
        s -> ds.flatMap(_._3.split(" ")).groupBy(identity)
          .map { case (w, xs) => w -> xs.size.toLong }
      }
      val corpus = slice.values.flatten.groupBy(_._1)
        .map { case (w, xs) => w -> xs.map(_._2).sum }
      val n = corpus.values.sum
      val v = corpus.size
      val naive = slice.map { case (s, cs) =>
        val ns = cs.values.sum
        val sum = corpus.map { case (w, c) =>
          val csw = cs.getOrElse(w, 0L)
          (csw + 1L) * scaledLn(((csw + 1.0) / (ns + v + 0.0)) / ((c + 1.0) / (n + v + 0.0)))
        }.sum
        s -> ((ns, halfUp(sum.toDouble / ((ns + v).toDouble * UnigramLm.LnScale), 6)))
      }
      val got = DistributionDrift.sourceKl(docs.toDF("doc_id", "source", "text"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got == naive, s"seed $seed: ${got.toSeq.diff(naive.toSeq).take(3)}")
      assert(got.values.forall(_._2 >= 0.0))
    }
  }

  test("exactTopK with sketchK >= vocabulary equals the naive count on random corpora") {
    for (seed <- Seq(3, 13)) {
      val docs = randDocs(seed, 25)
      val tf = UnigramLm.docTermFreqs(docs.toDF("doc_id", "source", "text"))
      val counts = docs.flatMap(_._3.split(" ")).groupBy(identity)
        .map { case (w, xs) => w -> xs.size.toLong }
      val naive = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(5)
      val got = HeavyHitters.exactTopK(tf, k = 5, sketchK = 64)
        .orderBy("rn").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == naive, s"seed $seed: got $got want $naive")
    }
  }
}
