package graft.operators

import graft.SparkSpec

class BigramLmSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("word order matters: common adjacency beats shuffled tokens") {
    // train: "alpha beta" always adjacent; probe docs have IDENTICAL
    // unigram counts (x95 scores them equally) but different adjacency
    val train = docs((1L to 8L).map(i => i -> "alpha beta alpha beta alpha beta"): _*)
    val probes = docs(100L -> "alpha beta alpha beta",
                      101L -> "beta beta alpha alpha")
    val (vocab, scalars) = UnigramLm.train(train)
    val uni = UnigramLm.score(probes, vocab, scalars)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(100L) == uni(101L), "unigram model must NOT separate these")
    val bi = BigramLm.score(probes, BigramLm.trainBigrams(train), vocab, scalars)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(bi(100L) < bi(101L),
      s"in-order doc must score lower nll: ${bi(100L)} vs ${bi(101L)}")
  }

  test("score matches the interpolated add-one formula exactly") {
    val train = docs(1L -> "alpha beta alpha")
    // unigrams: alpha=2, beta=1 -> N=3, V=2; bigrams: "alpha beta"=1, "beta alpha"=1
    val (vocab, scalars) = UnigramLm.train(train)
    val bc = BigramLm.trainBigrams(train)
    val out = BigramLm.score(docs(2L -> "alpha beta"), bc, vocab, scalars)
      .collect().head
    val p = 0.75 * ((1 + 1.0) / (2 + 2 + 1.0)) + 0.25 * ((1 + 1.0) / (3 + 2 + 1.0))
    val term = math.round(math.log(p) * UnigramLm.LnScale)
    val expected = BigDecimal(-term.toDouble / (1.0 * UnigramLm.LnScale))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getLong(1) == 1L)
    assert(out.getDouble(2) == expected,
      s"nll ${out.getDouble(2)} != $expected")
  }

  test("bigramCap: capped tail backs off to the cb=0 path") {
    // "alpha beta" x3 dominates; cap=1 drops "beta gamma"
    val train = docs(1L -> "alpha beta gamma", 2L -> "alpha beta", 3L -> "alpha beta")
    val (vocab, scalars) = UnigramLm.train(train)
    val full = BigramLm.trainBigrams(train)
    val capped = BigramLm.trainBigrams(train, bigramCap = Some(1))
    assert(capped.collect().map(_.getString(0)).toSeq == Seq("alpha beta"))
    val probe = docs(9L -> "beta gamma")
    val fullN = BigramLm.score(probe, full, vocab, scalars).collect().head.getDouble(2)
    val cappedN = BigramLm.score(probe, capped, vocab, scalars).collect().head.getDouble(2)
    assert(cappedN > fullN, "capped model must score the dropped bigram worse")
    // a probe made of surviving bigrams scores identically
    val probeA = docs(10L -> "alpha beta")
    val fa = BigramLm.score(probeA, full, vocab, scalars).collect().head.getDouble(2)
    val ca = BigramLm.score(probeA, capped, vocab, scalars).collect().head.getDouble(2)
    assert(fa == ca)
  }

  test("leading/trailing whitespace yields no empty-word bigrams (oracle parity pin)") {
    // DuckDB string_split_regex keeps a trailing empty token ('a b ' ->
    // ['a','b','']) where Java split drops it; both keep a LEADING empty.
    // The shared contract is: pairs with an empty word never count — the
    // kernel skips them and the x97 oracle's bi CTE filters them.
    assert(Kernels.bigramCounts("alpha beta ") == Map("alpha beta" -> 1L))
    assert(Kernels.bigramCounts("  alpha beta") == Map("alpha beta" -> 1L))
    assert(Kernels.bigramCounts(" alpha beta \n") == Map("alpha beta" -> 1L))
    assert(Kernels.bigramCounts("   ") == Map.empty[String, Long])
    assert(Kernels.bigramCounts("alpha ") == Map.empty[String, Long])
    // whole-pipeline: the whitespace doc scores exactly like its trimmed twin
    val train = docs(1L -> "alpha beta alpha")
    val (vocab, scalars) = UnigramLm.train(train)
    val bc = BigramLm.trainBigrams(train)
    val out = BigramLm.score(
        docs(2L -> " alpha beta ", 3L -> "alpha beta"), bc, vocab, scalars)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(2L) == out(3L), s"whitespace twin diverged: $out")
    assert(out(2L)._1 == 1L)
  }

  test("docs with fewer than two tokens emit no row") {
    val train = docs(1L -> "alpha beta")
    val (vocab, scalars) = UnigramLm.train(train)
    val out = BigramLm.score(docs(2L -> "alpha", 3L -> "alpha beta"),
      BigramLm.trainBigrams(train), vocab, scalars)
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("registry entry scores every multi-token sf0.001 document once") {
    val out = graft.queries.TextOps.x97_bigram_lm.build(spark, Sf).collect()
    val n = graft.queries.Tables.documents(spark, Sf).count()
    assert(out.length == n.toInt) // every synthetic doc has >= 2 tokens
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    assert(out.forall(r => r.getDouble(2) > 0.0))
  }
}
