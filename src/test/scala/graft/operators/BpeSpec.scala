package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.Tables

class BpeSpec extends SparkSpec {

  import spark.implicits._
  import Bpe.Merge

  /** LOCAL reference trainer — the textbook recipe, no Spark: count
    * overlapping adjacent pairs weighted by word count, take the max
    * (ties: (left, right) lexicographic), merge, repeat. The distributed
    * trainer must match this exactly.
    */
  private def trainLocal(wordCounts: Map[String, Long],
                         numMerges: Int,
                         minPairCount: Long = 2L): Seq[Merge] = {
    var words: Map[IndexedSeq[String], Long] =
      wordCounts.map { case (w, n) => (w.map(_.toString): IndexedSeq[String]) -> n }
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var stop = false
    while (merges.length < numMerges && !stop) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, n) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        if (c < minPairCount) stop = true
        else {
          merges += Merge(merges.length, l, r)
          words = words.groupMapReduce {
            case (syms, _) => Bpe.applyMerge(syms, l, r)
          } { case (_, n) => n } (_ + _)
        }
      }
    }
    merges.toSeq
  }

  private val fixtureText = Seq(
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "lowest lowest newest wider")

  private lazy val fixture = fixtureText.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("distributed trainer matches the local reference trainer exactly") {
    val got = Bpe.train(fixture, numMerges = 20)
    val wc = fixtureText.flatMap(_.split("\\s+")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val want = trainLocal(wc, numMerges = 20)
    assert(got == want, s"\ngot  $got\nwant $want")
    assert(got.nonEmpty && got.length <= 20)
    // ranks are dense and ordered
    assert(got.map(_.rank) == got.indices)
  }

  test("training is deterministic across runs") {
    assert(Bpe.train(fixture, 12) == Bpe.train(fixture, 12))
  }

  test("distributed round path == local vocab path (fixture + real corpus)") {
    // train() picks the local path below MaxLocalVocab; the distributed
    // rounds are the >cap scale form — gate them equal on the same inputs
    val wcFixture = Bpe.wordCounts(fixture)
    assert(Bpe.trainDistributedRounds(wcFixture, 20, 2L) ==
      Bpe.train(fixture, 20))
    val docs = Tables.documents(spark, Sf)
    val wcCorpus = Bpe.wordCounts(docs)
    assert(Bpe.trainDistributedRounds(wcCorpus, 12, 2L) ==
      Bpe.train(docs, 12))
  }

  test("local and distributed paths agree on a non-BMP corpus (UTF-8 tie collation + code-point symbols)") {
    // U+10348 (GOTHIC HWAIR, supplementary) sorts BELOW U+E000 in UTF-16
    // code units (surrogates 0xD800+) but ABOVE it in UTF-8 bytes (F0 90…
    // vs EE 80 80) — Spark's binary string sort is the UTF-8 order, so a
    // tie between pairs ending in these characters is exactly where a
    // UTF-16 tie-break would make the two training paths learn DIFFERENT
    // merge tables. Equal counts for "a𐍈" and "a" force that tie.
    val hwair = new String(Character.toChars(0x10348))
    val pua = "\uE000" // private-use U+E000
    val nonBmp = Seq(
      s"a$hwair a$hwair a$pua a$pua",
      s"a$hwair a$pua b$hwair$pua b$hwair$pua")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val local = Bpe.train(nonBmp, 10)             // vocab ≪ cap → local path
    val dist = Bpe.trainDistributedRounds(Bpe.wordCounts(nonBmp), 10, 2L)
    assert(local == dist, s"\nlocal $local\ndist  $dist")
    assert(local.nonEmpty)
    // symbols are whole code points: encodings round-trip (a UTF-16
    // code-unit split would emit lone surrogates that still concatenate,
    // but could never match the distributed trainer's alphabet above)
    val ranks = local.map(m => (m.left, m.right) -> m.rank).toMap
    Seq(s"a$hwair", s"b$hwair$pua", hwair + hwair).foreach { w =>
      val syms = Bpe.encodeWord(w, ranks)
      assert(syms.mkString == w)
      assert(syms.forall(s => !s.exists(Character.isSurrogate) ||
        s.codePointCount(0, s.length) < s.length),
        s"lone surrogate symbol in $syms")
    }
  }

  test("trainer stops early when no pair reaches minPairCount") {
    val tiny = Seq((1L, "ab cd")).toDF("doc_id", "text")
    assert(Bpe.train(tiny, 10, minPairCount = 2).isEmpty)
    // and learns the repeated pair when it does occur twice
    val twice = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = Bpe.train(twice, 10, minPairCount = 2)
    assert(m.headOption.contains(Merge(0, "a", "b")))
  }

  test("greedy encoder == sequential-replay encoder on a trained table (fixture + corpus words)") {
    val merges = Bpe.train(fixture, 20)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val fixtureWords = fixtureText.flatMap(_.split("\\s+")).distinct
    // plus real corpus words against a table trained on the real corpus
    val corpusMerges = Bpe.train(Tables.documents(spark, Sf), 40)
    val corpusRanks = corpusMerges.map(m => (m.left, m.right) -> m.rank).toMap
    val corpusWords = Tables.documents(spark, Sf)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct().limit(500).as[String].collect()
    fixtureWords.foreach { w =>
      assert(Bpe.encodeWord(w, ranks) == Bpe.encodeWordSequential(w, merges),
        s"encoders disagree on fixture word '$w'")
    }
    corpusWords.foreach { w =>
      assert(Bpe.encodeWord(w, corpusRanks) ==
        Bpe.encodeWordSequential(w, corpusMerges),
        s"encoders disagree on corpus word '$w'")
    }
    // encoding round-trips: concatenated symbols re-form the word
    (fixtureWords ++ corpusWords.take(100)).foreach { w =>
      assert(Bpe.encodeWord(w, if (fixtureWords.contains(w)) ranks else corpusRanks)
        .mkString == w, s"symbols of '$w' do not concatenate back")
    }
  }

  test("frequent fixture words compress to single tokens; unseen words degrade to characters") {
    val merges = Bpe.train(fixture, 30, minPairCount = 2)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    // 'low' occurs 5 times standalone (+ as prefix) — must fully merge
    assert(Bpe.encodeWord("low", ranks).length < 3)
    assert(Bpe.encodeWord("newest", ranks).length < 6)
    // a word sharing no learned pair stays at character granularity
    assert(Bpe.encodeWord("qqq", ranks) == IndexedSeq("q", "q", "q"))
    assert(Bpe.encodeWord("", ranks).isEmpty)
  }

  test("tokenCounts equals local per-word encode sums and keeps non-text columns") {
    val docs = fixture.withColumn("lang", lit("en"))
    val merges = Bpe.train(fixture, 20)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val got = Bpe.tokenCounts(docs, merges)
      .select("doc_id", "lang", "n_tokens")
      .as[(Long, String, Long)].collect()
      .map { case (id, l, n) => id -> ((l, n)) }.toMap
    fixtureText.zipWithIndex.foreach { case (t, i) =>
      val want = t.split("\\s+").filter(_.nonEmpty)
        .map(w => Bpe.encodeWord(w, ranks).length.toLong).sum
      assert(got(i.toLong) == ("en", want), s"doc $i")
    }
    // null text counts 0
    val withNull = Seq((99L, null: String)).toDF("doc_id", "text")
    assert(Bpe.tokenCounts(withNull, merges)
      .select("n_tokens").as[Long].head() == 0L)
  }

  test("save/load round-trips the merge table; a rank hole fails loudly") {
    val merges = Bpe.train(fixture, 15)
    val dir = java.nio.file.Files.createTempDirectory("bpe").toFile
    dir.deleteOnExit()
    val p = dir.getAbsolutePath + "/merges"
    Bpe.save(spark, p, merges)
    assert(Bpe.load(spark, p) == merges)
    // encodings under the loaded table are identical
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val loadedRanks = Bpe.load(spark, p).map(m => (m.left, m.right) -> m.rank).toMap
    assert(Bpe.encodeWord("lowest", ranks) == Bpe.encodeWord("lowest", loadedRanks))
    // a hole in the ranks (merge 1 missing) must not load
    Bpe.mergeTable(spark, merges.filterNot(_.rank == 1)).coalesce(1)
      .write.mode("overwrite").parquet(p)
    assertThrows[IllegalArgumentException] { Bpe.load(spark, p) }
  }

  test("trainCached trains once per (dir, K)") {
    Bpe.invalidate()
    var builds = 0
    def docs = { builds += 1; fixture }
    val a = Bpe.trainCached(spark, "/tmp/bpe-spec-dir", docs, 8)
    val b = Bpe.trainCached(spark, "/tmp/bpe-spec-dir", docs, 8)
    assert(a == b && builds == 1, s"builds=$builds")
    Bpe.invalidate()
  }
}
