package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench requalification contract's parsing half: the committed
  * quiet-reference artifact must round-trip into the per-query map the
  * >3× outlier comparison uses (the measuring half is exercised
  * end-to-end by running Bench with a synthetic reference — BASELINE.md
  * round-9 policy).
  */
class BenchSpec extends AnyFunSuite {

  test("parseQuietRef reads a bench artifact's queries map") {
    val f = java.nio.file.Files.createTempFile("graft-quiet-ref", ".json")
    java.nio.file.Files.writeString(f,
      """{"metric":"total","value":1.5,"queries":{"q01_agg":0.7,"x71_tfidf":0.8},"load_quiet":true}""")
    val m = Bench.parseQuietRef(f.toString)
    assert(m == Map("q01_agg" -> 0.7, "x71_tfidf" -> 0.8))
  }

  test("the COMMITTED quiet reference parses and covers the full registry") {
    // guards the artifact the requalification pass actually ships with:
    // a malformed or stale-keyed reference would silently disable (or
    // misdirect) outlier detection for every future bench run
    val m = Bench.parseQuietRef("bench/quiet_reference.json")
    val registry = SparkEntry.queries.keySet
    assert(m.keySet == registry,
      s"quiet reference keys diverge from the registry: " +
        s"missing=${(registry -- m.keySet).take(5)} " +
        s"extra=${(m.keySet -- registry).take(5)}")
    assert(m.values.forall(v => v > 0 && v < 60),
      "quiet reference carries a non-positive or absurd per-query time")
  }

  test("a missing reference disables requalification instead of failing") {
    assert(Bench.parseQuietRef("/nonexistent/ref.json").isEmpty)
  }
}
