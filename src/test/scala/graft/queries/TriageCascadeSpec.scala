package graft.queries

import graft.SparkSpec

/** x126 (cascade triage) against x125 (all-legs triage): the verdict
  * relation must be IDENTICAL — the cascade only skips measuring what can
  * no longer change the outcome — and the skipped legs' measure columns
  * must read exactly 0.
  */
class TriageCascadeSpec extends SparkSpec {

  private case class Row5(docId: Long, status: String, best: Double,
                          frac: Double, verdict: String)

  private def rows(name: String): Map[Long, Row5] =
    graft.SparkEntry.queries(name)(spark, Sf).collect().map { r =>
      val x = Row5(r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getString(4))
      x.docId -> x
    }.toMap

  test("cascade verdicts are identical to x125; unprobed legs read 0") {
    val full = rows("x125_crawl_triage")
    val casc = rows("x126_crawl_triage_cascade")
    assert(casc.keySet == full.keySet,
      s"doc sets diverge: ${casc.keySet.diff(full.keySet)} / " +
        s"${full.keySet.diff(casc.keySet)}")
    // the fixture must actually exercise every cascade stage
    assert(full.values.exists(_.verdict == "drop_exact"))
    assert(full.values.exists(_.verdict == "drop_near"))
    assert(full.values.exists(_.verdict == "strip_spans"))
    assert(full.values.exists(_.verdict == "keep"))
    full.foreach { case (id, f) =>
      val c = casc(id)
      assert(c.verdict == f.verdict && c.status == f.status,
        s"doc $id: cascade ($c) diverges from x125 ($f)")
      f.verdict match {
        case "drop_exact" =>
          assert(c.best == 0.0 && c.frac == 0.0,
            s"doc $id dropped at the exact leg but carries measures: $c")
        case "drop_near" =>
          assert(c.best == f.best, s"doc $id near-dup measure diverges: $c vs $f")
          assert(c.frac == 0.0,
            s"doc $id dropped at the near-dup leg but carries a gram measure: $c")
        case _ =>
          // probed by every leg: the full measure row must match
          assert(c == f, s"doc $id fully-probed row diverges: $c vs $f")
      }
    }
  }
}
