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

  test("the COMMITTED quiet reference parses and tracks the registry") {
    // guards the artifact the requalification pass actually ships with:
    // a malformed or renamed-key reference would silently disable (or
    // misdirect) outlier detection for every future bench run. Keys the
    // registry no longer knows = drift (fail); registry queries the
    // reference lacks = NEW queries that simply cannot requalify until
    // the next quiet run refreshes the reference — tolerated up to 10%
    // so adding a query does not red the suite before a quiet sf0.1
    // bench is even possible
    val m = Bench.parseQuietRef("bench/quiet_reference.json")
    val registry = SparkEntry.queries.keySet
    val unknown = m.keySet -- registry
    assert(unknown.isEmpty,
      s"quiet reference carries keys the registry no longer has " +
        s"(renamed/removed queries — refresh bench/quiet_reference.json): " +
        s"${unknown.take(5)}")
    val coverage = (registry & m.keySet).size.toDouble / registry.size
    assert(coverage >= 0.9,
      f"quiet reference covers only ${coverage * 100}%.0f%% of the " +
        "registry — refresh it from a quiet sf0.1 bench run")
    assert(m.values.forall(v => v > 0 && v < 60),
      "quiet reference carries a non-positive or absurd per-query time")
  }

  test("a missing reference disables requalification instead of failing") {
    assert(Bench.parseQuietRef("/nonexistent/ref.json").isEmpty)
  }
}
