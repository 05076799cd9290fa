package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {

  import spark.implicits._

  /** Small synthetic corpus with exact dups, near-dups and unrelated docs. */
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog in the morning sun"),
    (2L, "the quick brown fox jumps over the lazy dog in the morning sun"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog in the evening sun"), // near-dup of 1
    (4L, "completely different content about distributed query processing engines"),
    (5L, "completely different content about distributed query processing systems"), // near-dup of 4
    (6L, "zzz unrelated short text qqq")
  ).toDF("doc_id", "text")

  test("exactDuplicates groups identical texts and keeps the min id") {
    val g = Dedup.exactDuplicates(docs).collect()
    val dupGroup = g.find(_.getAs[Long]("group_size") == 2L)
    assert(dupGroup.isDefined)
    assert(dupGroup.get.getAs[Long]("keeper") == 1L)
    assert(g.length == 5) // 6 docs, one pair collapsed
  }

  test("minHashNearDups finds the true near-dup pairs with exact jaccard") {
    val pairs = Dedup.minHashNearDups(docs, threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard")))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L)), s"exact dup pair missed: ${keys}")
    assert(keys.contains((1L, 3L)) && keys.contains((2L, 3L)), s"near-dup missed: ${keys}")
    assert(keys.contains((4L, 5L)), s"near-dup missed: ${keys}")
    assert(!keys.exists { case (a, b) => Set(a, b).contains(6L) }, "false positive with unrelated doc")
    // exact-dup pair has jaccard exactly 1.0
    assert(pairs.find(p => (p._1, p._2) == ((1L, 2L))).get._3 == 1.0)
  }

  test("LSH candidates are a superset of the verified near-dup pairs") {
    val sh = Dedup.shingle(docs)
    val cands = Dedup.lshCandidates(Dedup.minHashSignatures(sh))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = Dedup.minHashNearDups(docs, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(verified.subsetOf(cands))
  }

  test("simhash: exact dups collide, near-dups are close, unrelated are far") {
    val fp = Dedup.simHashFingerprints(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(fp(1L) == fp(2L), "identical docs must have identical simhash")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(3L)) < ham(fp(1L), fp(6L)),
      "near-dup should be closer than unrelated doc")
  }

  test("simHashNearDups at distance<=3 returns the exact-dup pair") {
    val pairs = Dedup.simHashNearDups(docs, maxDist = 3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("hot LSH bucket is capped: 1k identical docs yield bounded candidates") {
    // 1000 identical docs -> identical signatures -> ONE bucket per band of
    // size 1000; uncapped that is C(1000,2) = 499_500 candidate pairs
    val boiler = (1L to 1000L)
      .map(i => (i, "the same boilerplate licence header text repeated verbatim across files"))
      .toDF("doc_id", "text")
    val arrs = Dedup.shingleArrays(boiler).filter(size(col("shs")) > 0)
    val sigs = Dedup.minHashSignaturesFromArrays(arrs)
    val cap = 64
    val cands = Dedup.lshCandidates(sigs, maxPerBucket = cap)
    val n = cands.count()
    assert(n == cap.toLong * (cap - 1) / 2,
      s"expected C($cap,2)=${cap * (cap - 1) / 2} candidate pairs, got $n")
    // kept members: exactly `cap` docs, chosen by the doc-id-independent
    // hash order — the SAME set in every band (ordering depends only on
    // doc_id), so the clique is still witnessed, and the selection is
    // UNBIASED: it must not be simply the lowest (or highest) id prefix
    val ids = cands.select("doc_a").union(cands.select("doc_b")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(ids.size == cap)
    assert(ids != (1L to cap.toLong).toSet && ids != (937L to 1000L).toSet,
      "truncation should sample by hash, not by id order")
    // deterministic: a second run keeps the identical member set
    val cands2 = Dedup.lshCandidates(sigs, maxPerBucket = cap)
    val ids2 = cands2.select("doc_a").union(cands2.select("doc_b")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(ids2 == ids)
    // the truncation is observable: every band reports its overflow
    val over = Dedup.lshBucketOverflow(sigs, maxPerBucket = cap).collect()
    assert(over.length == 32, s"expected 32 overflowing buckets, got ${over.length}")
    assert(over.forall(_.getAs[Long]("dropped") == 1000L - cap))
    // and the verified near-dup output stays exact-jaccard on the kept pairs
    val verified = Dedup.minHashNearDups(boiler, threshold = 0.8)
    assert(verified.count() == cap.toLong * (cap - 1) / 2)
  }

  test("simhash hot bucket is capped like the LSH path") {
    // 500 identical docs -> identical simhash -> every chunk bucket holds
    // all of them; capped, each contributes C(64,2) zero-distance pairs
    val boiler = (1L to 500L)
      .map(i => (i, "identical boilerplate text shared by every file in the corpus"))
      .toDF("doc_id", "text")
    val cap = 64
    val pairs = Dedup.simHashNearDups(boiler, maxDist = 3, maxPerBucket = cap)
    assert(pairs.count() == cap.toLong * (cap - 1) / 2)
    val ids = pairs.select("doc_a").union(pairs.select("doc_b")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(ids.size == cap, "exactly cap members must be kept")
    assert(ids != (1L to cap.toLong).toSet,
      "truncation should sample by hash, not by id order")
    // the truncation is observable: all 4 chunk buckets report overflow
    val over = Dedup.simHashBucketOverflow(boiler, maxPerBucket = cap).collect()
    assert(over.length == 4, s"expected 4 overflowing buckets, got ${over.length}")
    assert(over.forall(_.getAs[Long]("dropped") == 500L - cap))
  }

  test("capped-aggregate candidates equal the rank-window reference on random corpora") {
    // property: for random corpora and several caps, the CappedMembersAgg
    // plan yields EXACTLY the candidate set of the reference
    // ROW_NUMBER() OVER (PARTITION BY band,bucket ORDER BY xxhash64(id), id)
    // form it replaced — the same (unbiased, deterministic) member
    // selection, just computed in one bounded-buffer pass
    val rnd = new scala.util.Random(20260812L)
    val words = Vector("alpha", "beta", "gamma", "delta", "code", "data",
      "query", "spark", "shuffle", "join", "plan", "text")
    def corpus(n: Int) = (1L to n.toLong).map { i =>
      // mix: ~1/3 boilerplate (hot buckets), rest random word soup
      val t =
        if (i % 3 == 0) "the same boilerplate licence header repeated verbatim"
        else (0 until 10).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
      (i, t)
    }.toDF("doc_id", "text")
    for (n <- Seq(40, 120); cap <- Seq(2, 5, 64)) {
      val arrs = Dedup.shingleArrays(corpus(n)).filter(size(col("shs")) > 0)
      val sigs = Dedup.minHashSignaturesFromArrays(arrs).cache()
      val got = Dedup.lshCandidates(sigs, maxPerBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // reference implementation: the old window form, inline
      val banded = sigs.select(col("doc_id"),
        posexplode(array((0 until 32).map(b =>
          xxhash64((lit(b) +: (0 until 4).map(r => col("sig")(b * 4 + r))): _*)): _*))
          .as(Seq("band", "bucket")))
      val capped = banded
        .withColumn("_r", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("band"), col("bucket"))
            .orderBy(xxhash64(col("doc_id")), col("doc_id"))))
        .filter(col("_r") <= cap)
      val a = capped.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
      val b = capped.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
      val want = a.join(b, Seq("band", "bucket"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      sigs.unpersist()
      assert(got == want,
        s"n=$n cap=$cap: aggregate![${(got -- want).take(5)}] window![${(want -- got).take(5)}]")
    }
  }

  test("verify fetch is candidates-sized, not corpus-sized") {
    // 200 gibberish docs (no near-dups) + one 4-doc near-dup clique: the
    // narrowed verify input must hold exactly the docs appearing in some
    // candidate pair — a handful — never the 204-doc corpus
    val rnd = new scala.util.Random(42)
    def gibberish() = (0 until 80).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val shared = gibberish() + " " + gibberish()
    val corpus = ((1L to 200L).map(i => (i, gibberish())) ++
      (201L to 204L).map(i => (i, s"$shared $i"))).toDF("doc_id", "text")
    val arrs = Dedup.shingleArrays(corpus).filter(size(col("shs")) > 0)
    val cands = Dedup.lshCandidates(Dedup.minHashSignaturesFromArrays(arrs))
    val candIds = cands.select("doc_a").union(cands.select("doc_b"))
      .distinct().count()
    val narrowed = Dedup.narrowToCandidates(arrs, cands)
    assert(narrowed.count() == candIds,
      "narrowed fetch must hold exactly the candidate-pair docs")
    assert(narrowed.count() <= 20,
      s"fetch not candidates-sized: ${narrowed.count()} of 204 docs fetched")
    // end-to-end: the clique's pairs all survive with exact jaccard
    val pairs = Dedup.minHashNearDups(corpus, threshold = 0.8)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    (201L to 204L).toSeq.combinations(2).foreach { c =>
      assert(pairs.contains((c(0), c(1))), s"clique pair ${c} lost")
    }
  }

  test("minHashNearDups with maxPerBucket=0 keeps the uncapped behavior") {
    val pairs = Dedup.minHashNearDups(docs, threshold = 0.5, maxPerBucket = 0)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((4L, 5L)))
  }

  test("incrementalStatus classifies history dups, batch dups and keepers") {
    val history = Seq("seen before", "also seen").toDF("text")
      .select(md5(col("text")).as("th"))
    val batch = Seq(
      (10L, "seen before"),   // hash already ingested
      (11L, "brand new"),     // first-ever copy
      (12L, "brand new"),     // second copy within the batch
      (13L, "also seen"),     // history dup even though batch-unique
      (14L, "only here")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalStatus(batch, history)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got == Map(
      10L -> "dup_of_history", 11L -> "kept", 12L -> "dup_in_batch",
      13L -> "dup_of_history", 14L -> "kept"))
  }

  test("incrementalStatus with empty history keeps every first batch copy") {
    val history = spark.emptyDataFrame.withColumn("th", lit("")).filter(lit(false))
      .select(col("th"))
    val batch = Seq((1L, "a a a"), (2L, "a a a")).toDF("doc_id", "text")
    val got = Dedup.incrementalStatus(batch, history)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got == Map(1L -> "kept", 2L -> "dup_in_batch"))
  }

  test("dupGramFraction: exact duplicates saturate, unrelated docs score zero") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different text with no overlap at all here")).toDF("doc_id", "text")
    val got = Dedup.dupGramFraction(d, k = 40)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) == 1.0 && got(2L) == 1.0 && got(3L) == 0.0, got.toString)
  }

  test("dupGramFraction: a shared k-window marks exactly its positions") {
    // docs share exactly one 5-char window "abcde" (1 position each);
    // doc 1 has 6 positions total, doc 2 has 5
    val d = Seq((1L, "abcdefghij"), (2L, "zzabcdezz")).toDF("doc_id", "text")
    val got = Dedup.dupGramFraction(d, k = 5)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((6L, 1L)) && got(2L) == ((5L, 1L)), got.toString)
  }

  test("dupGramFractionHashed equals the exact string-keyed form") {
    val d = graft.queries.Tables.documents(spark, Sf)
    val exact = Dedup.dupGramFraction(d, k = 40)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val hashed = Dedup.dupGramFractionHashed(d, k = 40)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(exact.nonEmpty && hashed == exact)
  }

  test("removeDupSpans: overlapping covers merge, dup-free docs pass through") {
    // docs 1 and 2 share "abcdeabcde" (10 chars): at k=5 the duplicated
    // 5-gram positions chain into ONE merged span covering all 10 chars
    val d = Seq(
      (1L, "xxabcdeabcdeyy"),
      (2L, "abcdeabcde"),
      (3L, "totally unrelated")).toDF("doc_id", "text")
    val got = Dedup.removeDupSpans(d, k = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((14L, 1L, 10L, "xxyy")), got(1L).toString)
    assert(got(2L) == ((10L, 1L, 10L, "")), got(2L).toString)   // whole doc
    assert(got(3L) == ((17L, 0L, 0L, "totally unrelated")), got(3L).toString)
  }

  test("removeDupSpans: disjoint duplicated windows leave separate spans") {
    // "abcde" and "vwxyz" are shared; the 'MM'/'NN' middles are unique —
    // two spans per doc, middles and unique tails survive
    val d = Seq(
      (1L, "abcdeMMvwxyzMM"),
      (2L, "NNabcdeNNvwxyz")).toDF("doc_id", "text")
    val got = Dedup.removeDupSpans(d, k = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((2L, 10L, "MMMM")), got(1L).toString)
    assert(got(2L) == ((2L, 10L, "NNNN")), got(2L).toString)
  }

  test("removeDupSpans: within-doc repeats alone do not qualify (cross-doc only)") {
    val d = Seq(
      (1L, "abcdeabcdeabcde"),          // repeats, but only in this doc
      (2L, "something else entirely")).toDF("doc_id", "text")
    val got = Dedup.removeDupSpans(d, k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(1L) == 0L && got(2L) == 0L, got.toString)
  }

  test("removeDupSpansHashed equals the exact string-keyed form (fixtures + corpus)") {
    val fx = Seq(
      (1L, "xxabcdeabcdeyy"), (2L, "abcdeabcde"), (3L, "zzabcdezz"),
      (4L, "short")).toDF("doc_id", "text")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(key(Dedup.removeDupSpansHashed(fx, k = 5)) ==
      key(Dedup.removeDupSpans(fx, k = 5)))
    val d = graft.queries.Tables.documents(spark, Sf)
    val exact = key(Dedup.removeDupSpans(d, k = 40))
    val hashed = key(Dedup.removeDupSpansHashed(d, k = 40))
    assert(exact.nonEmpty && hashed == exact)
  }

  test("removeDupSpans: cleaned text is consistent with the x99 audit accounting") {
    // every doc x99 scores dup_frac=0 must be returned UNCHANGED; every
    // flagged doc removes at least one char per duplicated position (each
    // distinct start covers its own start char), and the cleaned length
    // is exactly the original minus removed_chars
    val d = graft.queries.Tables.documents(spark, Sf)
    val audit = Dedup.dupGramFraction(d, k = 40)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val texts = d.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rw = Dedup.removeDupSpans(d, k = 40).collect()
    assert(rw.nonEmpty)
    rw.foreach { r =>
      val (id, removed, clean) = (r.getLong(0), r.getLong(3), r.getString(4))
      val dupPos = audit.getOrElse(id, 0L)
      if (dupPos == 0L)
        assert(clean == texts(id), s"dup-free doc $id was rewritten")
      else {
        assert(removed >= dupPos, s"doc $id: removed $removed < positions $dupPos")
        assert(clean.length == texts(id).length - removed, s"doc $id length")
      }
    }
  }

  test("incrementalRemoveSpans: corpus-known spans stripped, novel text untouched") {
    import org.apache.spark.sql.functions.{col, explode, udf}
    val histText = "abcdeabcde"   // the corpus already holds this content
    val history = Seq((1L, histText)).toDF("doc_id", "text")
    val histGrams = {
      val u = udf((t: String) => Kernels.charGramHashCounts(t, 5).keys.toArray)
      history.select(explode(u(col("text"))).as("gh"))
    }
    val batch = Seq(
      (10L, "xx" + histText + "yy"),   // known span inside novel wrapper
      (11L, histText),                 // wholly known
      (12L, "entirely novel writing")) // nothing in history
      .toDF("doc_id", "text")
    val got = Dedup.incrementalRemoveSpans(batch, histGrams, k = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(10L) == ((1L, 10L, "xxyy")), got(10L).toString)
    assert(got(11L) == ((1L, 10L, "")), got(11L).toString)
    assert(got(12L) == ((0L, 0L, "entirely novel writing")), got(12L).toString)
    // empty history: every batch doc passes through byte-identical
    val none = Dedup.incrementalRemoveSpans(batch,
        histGrams.filter(org.apache.spark.sql.functions.lit(false)), k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getString(4))).toMap
    assert(none(10L) == ((0L, "xx" + histText + "yy")) &&
      none(11L) == ((0L, histText)))
  }

  test("incrementalRemoveSpans is consistent with the x102 audit on the corpus split") {
    // every batch doc the audit scores hist_frac=0 is unchanged; flagged
    // docs remove at least one char per history-hit position
    val (history, batch) = graft.queries.TextOps.x86Split(spark, Sf)
    val k = graft.queries.TextOps.DupGramK
    val hist = graft.sources.GramHistory.gramHashes(history, k)
    val audit = Dedup.incrementalDupGrams(batch, hist, k)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val texts = batch.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rw = Dedup.incrementalRemoveSpans(batch, hist, k).collect()
    assert(rw.nonEmpty)
    var flagged = 0
    rw.foreach { r =>
      val (id, removed, clean) = (r.getLong(0), r.getLong(3), r.getString(4))
      val histPos = audit.getOrElse(id, 0L)
      if (histPos == 0L) assert(clean == texts(id), s"clean doc $id rewritten")
      else {
        flagged += 1
        assert(removed >= histPos, s"doc $id removed $removed < hits $histPos")
        assert(clean.length == texts(id).length - removed, s"doc $id length")
      }
    }
    assert(flagged > 0, "fixture split produced no history-overlapping docs")
  }

  test("x100: the keeper is each cluster's longest member, ties to min doc id") {
    val membership = graft.SparkEntry.queries("x84_dup_components")(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val lens = graft.queries.Tables.documents(spark, Sf)
      .select("doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = membership.groupBy(_._2).map { case (comp, ms) =>
      val members = ms.map(_._1)
      val keeper = members.minBy(d => (-lens(d), d))
      comp -> ((keeper, lens(keeper), members.length.toLong))
    }
    val got = graft.SparkEntry.queries("x100_best_keeper")(spark, Sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(naive.nonEmpty && got == naive,
      s"got ${got.toSeq.sortBy(_._1)}\nwant ${naive.toSeq.sortBy(_._1)}")
  }

  test("dupGramFraction: within-doc repeats alone do not qualify; short docs drop") {
    val d = Seq((1L, "aaaaaaaaaa"), (2L, "bc")).toDF("doc_id", "text")
    val got = Dedup.dupGramFraction(d, k = 3).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L), got.mkString(","))
    assert(got.head.getLong(2) == 0L) // "aaa" repeats only within doc 1
  }
}
