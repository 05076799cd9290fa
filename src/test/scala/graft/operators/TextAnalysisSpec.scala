package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  test("languageId picks the profile with the most stopword hits") {
    val docs = Seq(
      (1L, "the cat and the dog sat in the house and the garden is green"),
      (2L, "der hund und die katze und das haus ist nicht klein"),
      (3L, "le chat et la maison et les jardins des villes"),
      (4L, "xyzzy qwerty plugh") // no markers at all -> first profile wins tie at 0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.languageId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en" && got(2L) == "de" && got(3L) == "fr")
    assert(got(4L) == "de") // deterministic tie-break: profile order
  }

  test("winnowing fingerprints: identical docs agree, near-dups overlap, unrelated don't") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    val docs = Seq(
      (1L, base),
      (2L, base),
      (3L, base.replace("lazy", "hazy")),
      (4L, "entirely different material concerning database query optimization strategies")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowingFingerprints(docs).collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert(fps(1L) == fps(2L), "identical docs must produce identical fingerprint sets")
    val overlap13 = fps(1L).intersect(fps(3L)).size.toDouble / fps(1L).size
    val overlap14 = fps(1L).intersect(fps(4L)).size.toDouble / fps(1L).size
    assert(overlap13 > 0.5, s"near-dup overlap too low: $overlap13")
    assert(overlap14 < 0.1, s"unrelated docs overlap: $overlap14")
  }

  test("winnowing guarantee: every window of w consecutive grams contributes a fingerprint") {
    val docs = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789")).toDF("doc_id", "text")
    val k = 8; val w = 4
    val fps = TextAnalysis.winnowingFingerprints(docs, k, w).collect().map(_.getLong(1)).toSet
    // brute-force the winnowing on the driver
    val text = "abcdefghijklmnopqrstuvwxyz0123456789"
    val grams = (0 to text.length - k).map(i => text.substring(i, i + k))
    // driver-side xxhash64 isn't available; instead check the COUNT bound:
    // #fps <= #windows and >= #grams / w (each fp covers at most w windows)
    val nWindows = grams.length - w + 1
    assert(fps.size <= nWindows && fps.size >= nWindows / w,
      s"${fps.size} fingerprints for $nWindows windows")
  }

  test("sharedSpanStats matches a scalar model built from the fingerprint relation") {
    // two docs sharing a long boilerplate header + unique tails, one doc of
    // entirely unique text: the boilerplate docs must score a high
    // shared_ratio, the unique doc zero
    val header = "this software is provided as is without warranty of any kind express or implied"
    val docs = Seq(
      (1L, header + " alpha beta gamma delta epsilon unique tail one here"),
      (2L, header + " totally different second document continuation text"),
      (3L, "completely standalone content about distributed analytics engines and storage")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.sharedSpanStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    // scalar model over the SAME fingerprint relation
    val fps = TextAnalysis.winnowingFingerprints(docs).collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val sharedVocab = fps.values.flatten.groupBy(identity)
      .collect { case (fp, occ) if occ.size >= 2 => fp }.toSet
    fps.foreach { case (id, set) =>
      val nShared = set.count(sharedVocab)
      val want = (set.size, nShared,
        BigDecimal(nShared.toDouble / set.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
    assert(got(1L)._3 > 0.4, s"boilerplate doc scored low: ${got(1L)}")
    assert(got(3L)._2 == 0, s"unique doc has shared spans: ${got(3L)}")
  }

  test("bpeTokenStats counts regex pretokens") {
    val docs = Seq((1L, "hello world42 foo-bar!")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeTokenStats(docs).collect().head
    // tokens: "hello", " world", "42", " foo", "-", "bar", "!"
    assert(r.getInt(1) == 7, s"expected 7 tokens, got ${r.getInt(1)}")
    assert(r.getInt(2) == 7)
  }

  test("stopwordStats scores against the doc's OWN language profile with multiplicity") {
    val docs = Seq(
      (1L, "The cat and the dog", "en"),   // the×2 + and = 3 stop / 5 toks
      (2L, "the cat and the dog", "de"),   // en stopwords, de profile -> 0
      (3L, "keyword soup spark parquet", "en"), // natural-text gate fails
      (4L, "", "en"),                      // empty -> 0 tokens, null ratio
      (5L, "der hund ist nicht da", "xx")  // unprofiled lang -> 0 hits
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.stopwordStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        r.getInt(5)))).toMap
    assert(got(1L) == ((5, 3, Some(3.0 / 5), 1)), got(1L).toString)
    assert(got(2L) == ((5, 0, Some(0.0), 0)), got(2L).toString)
    assert(got(3L) == ((4, 0, Some(0.0), 0)), got(3L).toString)
    assert(got(4L) == ((0, 0, None, 0)), got(4L).toString)
    assert(got(5L) == ((5, 0, Some(0.0), 0)), got(5L).toString)
  }
}
