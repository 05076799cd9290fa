package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bit-equality gates for the per-doc kernels against the Catalyst
  * expressions they replace: if any of these drift, golden files and the
  * round-1 outputs drift with them.
  */
class KernelsSpec extends SparkSpec {

  import spark.implicits._

  private val samples = Seq(
    "hello world", "", "a", "The quick brown fox", "tab\tand\nnewline",
    "ünïcödé tæxt ünd größe", "日本語のテキストです", "mixed 日本 and ascii",
    "x" * 500)

  test("xx64 matches Spark's xxhash64 on strings (incl. multi-byte)") {
    // parquet round-trip forces a real scan (local Seqs constant-fold)
    val dir = java.nio.file.Files.createTempDirectory("kern").toString
    samples.toDF("s").write.mode("overwrite").parquet(dir)
    val got = spark.read.parquet(dir).select(col("s"), xxhash64(col("s")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(got(s) == Kernels.xx64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)),
        s"xx64 mismatch for '$s'")
    }
  }

  test("xx64Seeded matches xxhash64(lit(i), s)") {
    val dir = java.nio.file.Files.createTempDirectory("kern").toString
    samples.toDF("s").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    Seq(0, 1, 7, 127).foreach { i =>
      val got = df.select(col("s"), xxhash64(lit(i), col("s")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      samples.foreach { s =>
        assert(got(s) == Kernels.xx64Seeded(i,
          org.apache.spark.unsafe.types.UTF8String.fromString(s)),
          s"xx64Seeded($i) mismatch for '$s'")
      }
    }
  }

  test("winnowFps matches the explode+window reference plan bit-for-bit") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "abcdefghijklmnopqrstuvwxyz0123456789",
      "ünïcödé tæxt with münich and zürich in it",
      "short", "exactly8", "exactly8chars!!")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val k = 8; val w = 4
    // reference plan (round-1 shape)
    val grams = docs.filter(length(col("text")) >= k)
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(1, length(text) - ${k - 1}), i -> substring(text, i, $k))"))
          .as(Seq("pos", "gram")))
      .withColumn("h", xxhash64(col("gram")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos")).rowsBetween(0, w - 1)
    val ref = grams
      .withColumn("wmin", min(col("h")).over(win))
      .withColumn("maxpos", max(col("pos")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .filter(col("pos") <= col("maxpos") - (w - 1))
      .select(col("doc_id"), col("wmin")).distinct()
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    val got = texts.zipWithIndex.map { case (t, i) =>
      i.toLong -> Kernels.winnowFps(t, k, w).toSet
    }.filter(_._2.nonEmpty).toMap
    assert(got == ref)
  }

  test("simHash64 matches the explode+64-sums reference plan") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "The QUICK brown FOX  jumps\tover  newlines\ntoo",
      "singletoken", "a b a b a", "ünïcödé tæxt")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"_b$b")
    }
    val ref = toks.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b =>
          when(col(s"_b$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(Kernels.simHash64(t) == ref(i.toLong), s"simhash mismatch: '$t'")
    }
  }

  test("minHashSig matches the explode+min-columns reference plan") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different content here")).toDF("doc_id", "text")
    val numHashes = 16
    val sh = Dedup.shingle(docs)
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("sh"))).as(s"_m$i"))
    val ref = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) ->
        (0 until numHashes).map(i => r.getLong(i + 1)).toArray).toMap
    val arrs = Dedup.shingleArrays(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toArray).toMap
    arrs.foreach { case (id, shs) =>
      assert(Kernels.minHashSig(shs, numHashes).toSeq == ref(id).toSeq)
    }
  }

  test("roundHalfUp matches Spark round(x, 4)") {
    val xs = Seq(0.12345, 0.12344999, -0.98765, 0.5e-4, -0.5e-4, 1.0,
      0.00005, -0.00005, 123.456789, 1e-10, 0.46875)
    val dir = java.nio.file.Files.createTempDirectory("kern").toString
    xs.toDF("x").write.mode("overwrite").parquet(dir)
    val got = spark.read.parquet(dir).select(col("x"), round(col("x"), 4))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    xs.foreach { x =>
      assert(got(x) == Kernels.roundHalfUp(x, 4), s"round mismatch for $x")
    }
  }

  // ---------------------------------------------- curation kernel properties
  // (seeded generator loop — the scalatest/scalacheck bridge is not in the
  // offline cache; same device as CoreGeoSpec)

  private def forSeeded(n: Int)(body: scala.util.Random => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (1 to n).foreach(_ => body(rnd))
  }

  private def randText(r: scala.util.Random): String =
    Seq.fill(r.nextInt(12))(
      Seq.fill(1 + r.nextInt(7))(('a' + r.nextInt(4)).toChar).mkString
    ).mkString(" ")

  test("charGramPositions: code-point positions match Spark substring on multi-byte text") {
    // positions are 1-based CODE POINTS — the contract that makes the
    // x114 oracle's SUBSTR(text, i, k) replay exact on non-ASCII text
    for (t <- samples.filter(_.length >= 4); k <- Seq(2, 4)) {
      val pos = Kernels.charGramPositions(t, k)
      val cps = t.codePointCount(0, t.length)
      val want = (1 to cps - k + 1).map { i =>
        val a = t.offsetByCodePoints(0, i - 1)
        val b = t.offsetByCodePoints(0, i - 1 + k)
        (t.substring(a, b), i)
      }.groupBy(_._1).map { case (g, ps) => g -> ps.map(_._2).toList }
      assert(pos.view.mapValues(_.toList).toMap == want, s"'$t' k=$k")
      // hashed twin: same position sets keyed by the gram's xxhash64
      val hp = Kernels.charGramHashPositions(t, k)
      assert(hp.values.map(_.toList).toSet == want.values.toSet, s"'$t' k=$k hashed")
    }
  }

  test("removeSpans drops exactly the covered code points (multi-byte safe)") {
    // CJK text: every char is 3 UTF-8 bytes — a byte-offset bug would
    // split characters or shift spans
    val t = "日本語のテキストです"   // 10 code points
    // duplicated positions 2 and 5 at k=3 cover [2,4] and [5,7] —
    // touching, so ONE merged span of 6 chars
    val (n, removed, clean) = Kernels.removeSpans(t, 3, Array(2, 5))
    assert(n == 1L && removed == 6L, s"$n $removed")
    assert(clean == "日トです", clean)
    // disjoint spans with a survivor between
    val (n2, r2, c2) = Kernels.removeSpans("αβγδεζηθικ", 2, Array(1, 9))
    assert(n2 == 2L && r2 == 4L && c2 == "γδεζηθ", s"$n2 $r2 '$c2'")
    // whole-string cover and empty positions
    assert(Kernels.removeSpans("abcd", 4, Array(1)) == ((1L, 4L, "")))
    assert(Kernels.removeSpans("abcd", 2, Array.empty[Int]) == ((0L, 0L, "abcd")))
  }

  test("tokenCounts sums to the number of qualifying tokens (property)") {
    forSeeded(300) { r =>
      val text = randText(r)
      val counts = Kernels.tokenCounts(text, 4)
      val expected = text.split("\\s+").count(t => t.length >= 4)
      assert(counts.values.sum == expected, s"'$text'")
      assert(counts.keys.forall(_.length >= 4))
    }
  }

  test("triStats: distinct <= total and agrees with wordTrigramSet (property)") {
    forSeeded(300) { r =>
      val text = randText(r)
      val st = Kernels.triStats(text)
      val set = Kernels.wordTrigramSet(text)
      if (st.isEmpty) assert(set.isEmpty)
      else {
        assert(st(1) == set.length, s"'$text'") // same distinct, same tokenizer
        assert(st(1) <= st(0))
      }
    }
  }

  test("quantizeInt8: range bound, scale invariance, argmax hits ±127 (property)") {
    forSeeded(300) { r =>
      val v = Array.fill(1 + r.nextInt(32))(r.nextFloat() * 2f - 1f)
      val q = Kernels.quantizeInt8(v)
      assert(q.forall(x => x >= -127 && x <= 127))
      if (v.exists(_ != 0f)) {
        val i = v.indices.maxBy(i => math.abs(v(i).toDouble))
        assert(math.abs(q(i)) == 127)
        // positive scaling leaves the quantization unchanged
        assert(Kernels.quantizeInt8(v.map(_ * 2f)).sameElements(q))
      }
    }
  }

  test("minHashBandBuckets is permutation-invariant in the shingle set (property)") {
    forSeeded(200) { r =>
      val shs = Kernels.wordTrigramSet(randText(r))
      if (shs.nonEmpty) {
        val a = Kernels.minHashBandBuckets(shs, 64, 16)
        val b = Kernels.minHashBandBuckets(shs.reverse, 64, 16)
        assert(a.sameElements(b)) // min-hash is order-free
      }
    }
  }
}
