package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-18 optimization gates: the changed internals keep their answers.
  *
  *  - [[graft.util.Par]]: result order, exception propagation (the triage
  *    legs now build concurrently — a swapped or swallowed leg would be a
  *    silent wrong verdict, not a perf bug).
  *  - Scan fan-out ([[graft.util.Scans.fanOutForKernels]], opt-in per
  *    kernel-heavy builder): the single-row-group testdata scan fans out
  *    to the session default parallelism with IDENTICAL rows (the
  *    repartition is round-robin — pure placement, no semantics), no-ops
  *    on already-split inputs, and keeps predicate pushdown.
  *  - Fingerprint/edge producer composition (x103→x104/x104b/x120,
  *    x107→x108, x111→x112, x104b→x110): with a warm producer store the
  *    consumer plans a parquet scan and returns the SAME rows as the
  *    standalone (cold) pipeline.
  */
class R18OptimizationSpec extends SparkSpec {

  /** Private session (own SQLConf, shared SparkContext): sbt runs suites
    * in parallel on ONE shared session, and several suites toggle
    * session confs mid-test (AQE, broadcast threshold — GramHistorySpec,
    * PlanSpec, …); partition-count and plan-shape assertions here must
    * not race those flips.
    */
  private lazy val sess = spark.newSession()

  test("Par.all preserves thunk order and rethrows the first failure as-is") {
    val Seq(a, b, c) = graft.util.Par.all(
      () => { Thread.sleep(30); "a" },
      () => "b",
      () => { Thread.sleep(10); "c" })
    assert((a, b, c) == ("a", "b", "c"))
    val boom = intercept[IllegalStateException] {
      graft.util.Par.all[String](
        () => throw new IllegalStateException("leg failed"),
        () => "fine")
    }
    assert(boom.getMessage == "leg failed")
  }

  test("fanOutForKernels splits an unsplittable scan, no-ops a split one, keeps rows") {
    val raw = sess.read.parquet(s"$Sf/documents.parquet")
    assert(raw.rdd.getNumPartitions <
      sess.sparkContext.defaultParallelism,
      "fixture no longer single-split — fan-out untestable here")
    val fanned = Tables.fanOutForKernels(Tables.documents(sess, Sf))
    assert(fanned.rdd.getNumPartitions ==
      sess.sparkContext.defaultParallelism,
      "kernel fan-out did not reach default parallelism")
    // identical multiset of rows (order is placement, not semantics)
    assert(fanned.select("doc_id", "text").orderBy("doc_id").collect().toSeq ==
      raw.select("doc_id", "text").orderBy("doc_id").collect().toSeq)
    // already-parallel input: NO exchange added (the 100 TB no-op branch)
    val already = fanned
    assert(Tables.fanOutForKernels(already) eq already,
      "fan-out re-shuffled an already-parallel relation")
    // predicate pushdown survives the repartition: the point-lookup filter
    // must still reach the parquet scan (guide §6 — a fan-out that
    // swallowed pushdown would turn every lookup into a full scan)
    val look = Tables.fanOutForKernels(Tables.documents(sess, Sf))
      .filter(col("doc_id") === 7L)
    val scan = look.queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(scan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)"),
      s"doc_id lookup filter not pushed to the scan:\n$scan")
  }

  test("x104/x104b/x108/x112 consume their warm fingerprint stores and keep answers") {
    import graft.operators.PairStore
    val producers = Seq("x44_simhash", "x81_winnow_fps",
      "x103_payload_phash", "x107_frame_phash",
      "x111_audio_landmarks", "x104b_payload_dupedges")
    val consumers = Seq("x45_simhash_neardup", "x82_shared_spans",
      "x104_payload_neardup", "x104b_payload_dupedges",
      "x108_video_neardup", "x112_audio_neardup", "x110_payload_resolve",
      "x120_payload_decontaminate")
    producers.foreach(PairStore.invalidate(sess, _, Sf))
    try {
      // COLD: standalone answers (no producer ran)
      val cold = consumers.map { n =>
        n -> graft.SparkEntry.queries(n)(sess, Sf).collect().toSeq
      }.toMap
      // WARM: explicit producer steps in registry order, then re-consume
      producers.foreach { n =>
        PairStore.refresh(sess, n, Sf)(
          graft.SparkEntry.queries(n)(sess, Sf)): Unit
      }
      consumers.foreach { n =>
        val warm = graft.SparkEntry.queries(n)(sess, Sf)
        // x110's returned frame is propagation output (checkpoint-backed
        // ExistingRDD), so the store scan is not visible in ITS plan; the
        // eager components loop already consumed the store while building
        if (n != "x110_payload_resolve")
          assert(warm.queryExecution.executedPlan.toString
            .contains("FileScan parquet"),
            s"$n with warm stores did not plan a store scan")
        assert(warm.collect().toSeq == cold(n),
          s"$n: store-served answer differs from the standalone pipeline")
      }
    } finally producers.foreach(PairStore.invalidate(sess, _, Sf))
  }
}
