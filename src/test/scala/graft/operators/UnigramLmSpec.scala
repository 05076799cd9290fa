package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("scoring orders documents by model fit: common-token docs beat rare-token docs") {
    // 9 docs of common tokens, 1 doc of tokens seen once each
    val common = (1L to 9L).map(i => i -> "alpha beta alpha beta alpha beta")
    val rare = Seq(10L -> "zeta omega kappa sigma delta gamma")
    val out = UnigramLm.selfScore(docs(common ++ rare: _*))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val commonNll = out(1L)
    val rareNll = out(10L)
    assert(commonNll < rareNll,
      s"common-token doc should score lower nll: $commonNll vs $rareNll")
    // all nine common docs identical text -> identical score
    assert((1L to 9L).map(out).distinct.size == 1)
  }

  test("OOV tokens score through the c=0 path of the same formula") {
    val train = docs(1L -> "alpha beta gamma alpha")
    val (vocab, scalars) = UnigramLm.train(train)
    // n_total = 4, v = 3; OOV ln p = ln(1 / (4 + 3 + 1))
    val out = UnigramLm.score(docs(2L -> "unseen unseen"), vocab, scalars)
      .collect().head
    val expected = BigDecimal(-math.log(1.0 / 8.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getLong(1) == 2L)
    assert(math.abs(out.getDouble(2) - expected) < 1e-9,
      s"OOV nll ${out.getDouble(2)} != $expected")
  }

  test("in-vocab score matches the add-one formula exactly") {
    val train = docs(1L -> "alpha beta gamma alpha")
    val (vocab, scalars) = UnigramLm.train(train)
    // p(alpha) = (2+1)/(4+3+1); per-token term integer-scaled at 1e6
    val term = math.round(math.log(3.0 / 8.0) * UnigramLm.LnScale)
    val expected = BigDecimal(-(term * 3).toDouble / (3.0 * UnigramLm.LnScale))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = UnigramLm.score(docs(2L -> "alpha alpha alpha"), vocab, scalars)
      .collect().head
    assert(out.getDouble(2) == expected)
  }

  test("vocabCap drops only the tail into the OOV path; denominators unchanged") {
    // alpha x4, beta x2, gamma x1 -> cap=1 keeps alpha only
    val train = docs(1L -> "alpha alpha alpha alpha beta beta gamma")
    val (vocabFull, scalarsFull) = UnigramLm.train(train)
    val (vocabCapped, scalarsCapped) = UnigramLm.train(train, vocabCap = Some(1))
    assert(vocabCapped.collect().map(_.getString(0)).toSeq == Seq("alpha"))
    // scalars computed pre-cap: identical
    assert(scalarsCapped.collect().head.toSeq == scalarsFull.collect().head.toSeq)
    // alpha-only doc scores identically under both models
    val probe = docs(2L -> "alpha alpha")
    val full = UnigramLm.score(probe, vocabFull, scalarsFull).collect().head.getDouble(2)
    val capped = UnigramLm.score(probe, vocabCapped, scalarsCapped).collect().head.getDouble(2)
    assert(full == capped)
    // beta now scores as OOV (c=0) -> strictly worse than under the full model
    val probeB = docs(3L -> "beta beta")
    val fullB = UnigramLm.score(probeB, vocabFull, scalarsFull).collect().head.getDouble(2)
    val cappedB = UnigramLm.score(probeB, vocabCapped, scalarsCapped).collect().head.getDouble(2)
    assert(cappedB > fullB)
  }

  test("registry entry scores every sf0.001 document once, finite") {
    val out = graft.queries.TextOps.x95_unigram_lm
      .build(spark, Sf)
    val n = graft.queries.Tables.documents(spark, Sf).count()
    val rows = out.collect()
    assert(rows.length == n.toInt)
    assert(rows.forall(r => !r.isNullAt(2) && r.getDouble(2) > 0.0))
    // distinct doc_ids (one score per doc)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("trainCached: a memo hit never re-trains and scores bit-identically to a fresh train") {
    UnigramLm.invalidate()
    val corpus = docs(1L -> "alpha beta alpha gamma",
      2L -> "beta beta delta", 3L -> "gamma alpha epsilon zeta")
    val dir = java.nio.file.Files.createTempDirectory("graft-lmmemo").toString
    // first call trains; fresh selfScore is the reference
    val cached1 = UnigramLm.selfScoreCached(spark, dir, "t", corpus)
      .collect().map(_.toString).sorted
    val fresh = UnigramLm.selfScore(corpus)
      .collect().map(_.toString).sorted
    assert(cached1.sameElements(fresh), "first cached call != fresh train")
    // second call MUST hit the memo: the by-name docs thunk would throw
    val (vocab, scalars) = UnigramLm.trainCached(spark, dir, "t",
      sys.error("memo miss: trainCached re-evaluated its docs thunk"))
    val cached2 = UnigramLm.score(corpus, vocab, scalars)
      .collect().map(_.toString).sorted
    assert(cached2.sameElements(fresh), "memo-hit score != fresh train")
    // distinct variant over the same dir is a different model
    val (v2, s2) = UnigramLm.trainCached(spark, dir, "other",
      docs(9L -> "iota iota"))
    assert(v2.collect().map(_.getString(0)).toSet == Set("iota"))
    assert(s2.collect().head.getLong(0) == 2L)
    UnigramLm.invalidate()
  }

  test("invalidate(dir): a post-append retrain sees the new content; other dirs keep their memo") {
    UnigramLm.invalidate()
    val dirA = java.nio.file.Files.createTempDirectory("graft-lminv-a").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-lminv-b").toString
    val before = docs(1L -> "alpha beta alpha")
    val after = docs(1L -> "alpha beta alpha", 2L -> "newword newword")
    val (v0, _) = UnigramLm.trainCached(spark, dirA, "t", before)
    assert(v0.collect().map(_.getString(0)).toSet == Set("alpha", "beta"))
    UnigramLm.trainCached(spark, dirB, "t", before): Unit
    // frozen-at-first-training: same key ignores the appended corpus
    val (v1, _) = UnigramLm.trainCached(spark, dirA, "t", after)
    assert(v1.collect().map(_.getString(0)).toSet == Set("alpha", "beta"),
      "memo hit must return the frozen model")
    // the store-mutation hook: dirA's models drop, dirB's survive
    UnigramLm.invalidate(dirA)
    val (v2, _) = UnigramLm.trainCached(spark, dirA, "t", after)
    assert(v2.collect().map(_.getString(0)).toSet ==
      Set("alpha", "beta", "newword"),
      "post-invalidate retrain must see appended content")
    val (vB, _) = UnigramLm.trainCached(spark, dirB, "t",
      sys.error("dirB memo lost by invalidate(dirA)"))
    assert(vB.collect().map(_.getString(0)).toSet == Set("alpha", "beta"))
    UnigramLm.invalidate()
  }

  test("selfScoreCached memo hit fails loudly when an aliased (dir, variant) passes a different-schema relation") {
    UnigramLm.invalidate()
    val dir = java.nio.file.Files.createTempDirectory("graft-lmalias").toString
    val corpus = docs(1L -> "alpha beta alpha", 2L -> "beta beta")
    UnigramLm.selfScoreCached(spark, dir, "t", corpus).collect(): Unit
    val derived = corpus.withColumn("lang", lit("en"))
    val e = intercept[IllegalArgumentException] {
      UnigramLm.selfScoreCached(spark, dir, "t", derived).collect()
    }
    assert(e.getMessage.contains("aliasing"), e.getMessage)
    UnigramLm.invalidate()
  }

  test("the model memo is a bounded LRU") {
    UnigramLm.invalidate()
    val dir = java.nio.file.Files.createTempDirectory("graft-lmlru").toString
    val corpus = docs(1L -> "alpha beta")
    (0 until 40).foreach { i =>
      UnigramLm.trainCached(spark, dir, s"v$i", corpus): Unit
    }
    assert(UnigramLm.memoSize <= 32,
      s"memo grew past its bound: ${UnigramLm.memoSize}")
    // most-recent variants survive (access-ordered eviction)
    UnigramLm.trainCached(spark, dir, "v39",
      sys.error("recent entry evicted")): Unit
    UnigramLm.invalidate()
  }
}
