package graft.operators

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** Batch PairStore lifecycle — the `compact = true` refresh form
  * (spanning-star persistence for long-lived incremental stores,
  * DEDUP_TUNING §4). The streaming twin of this device is exercised in
  * CurationStreamsSpec's mid-stream compaction case.
  */
class PairStoreSpec extends SparkSpec {

  import spark.implicits._

  private def components(pairs: DataFrame): Map[Long, Long] =
    Components.connectedComponents(pairs)
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("component"))
      .toMap

  test("compacting refresh preserves components and collapses a clique to its star") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ps").toString
    val name = "compaction-lifecycle"
    // a dense 20-clique (the compaction win case: 190 verified pairs carry
    // 19 edges of connectivity) + a 5-chain + a disjoint pair, with a
    // per-pair score column the star form is allowed to drop
    val clique = for (a <- 1L to 20L; b <- (a + 1) to 20L) yield (a, b, 0.9)
    val chain = (100L until 104L).map(i => (i, i + 1, 0.8))
    val extra = Seq((500L, 501L, 0.85))
    val raw = (clique ++ chain ++ extra).toDF("doc_a", "doc_b", "jaccard")
    val want = components(raw)
    try {
      PairStore.invalidate(spark, name, dir)
      val stored = PairStore.refresh(spark, name, dir, compact = true)(raw)
      // size floor: one component→member edge per non-keeper node
      val n = stored.count()
      assert(n == want.size - want.values.toSet.size,
        s"star form should hold |V| - |components| edges, got $n")
      assert(n < raw.count(), "compaction did not shrink the clique-heavy store")
      // every resolution answer derived from the store is unchanged
      assert(components(stored) == want,
        "compacted store resolves to different components")
      // idempotent: a second compacting refresh over the persisted star
      // (the incremental-corpus steady state: old store ∪ new deltas) is a
      // fixpoint
      val again = PairStore.refresh(spark, name, dir, compact = true)(stored)
      assert(again.count() == n && components(again) == want)
      // incremental growth: a delta merging two components through a new
      // doc re-compacts to the merged star, still at the connectivity floor
      val delta = Seq((20L, 100L, 0.9)).toDF("doc_a", "doc_b", "jaccard")
      val merged = PairStore.refresh(spark, name, dir, compact = true)(
        PairStore.scanOrCompute(spark, name, dir)(sys.error("store must be warm"))
          .select("doc_a", "doc_b")
          .union(delta.select("doc_a", "doc_b")))
      val wantMerged = components(raw.select("doc_a", "doc_b")
        .union(delta.select("doc_a", "doc_b")))
      assert(components(merged) == wantMerged)
      assert(merged.count() == wantMerged.size - wantMerged.values.toSet.size)
    } finally PairStore.invalidate(spark, name, dir)
  }

  test("default refresh still persists the raw relation verbatim") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ps").toString
    val name = "raw-lifecycle"
    val raw = Seq((1L, 2L, 0.9), (2L, 3L, 0.8)).toDF("doc_a", "doc_b", "jaccard")
    try {
      PairStore.invalidate(spark, name, dir)
      val stored = PairStore.refresh(spark, name, dir)(raw)
      assert(stored.columns.toSeq == Seq("doc_a", "doc_b", "jaccard"))
      assert(stored.count() == 2)
    } finally PairStore.invalidate(spark, name, dir)
  }

  test("compacting refresh follows the producer's own endpoint columns (id_a/id_b)") {
    // x42's embedding pair producer persists id_a/id_b, not doc_a/doc_b —
    // compaction must key off the relation's first two columns, not
    // hard-coded defaults
    val dir = java.nio.file.Files.createTempDirectory("graft-ps").toString
    val name = "embed-compaction"
    val clique = for (a <- 1L to 6L; b <- (a + 1) to 6L) yield (a, b, 0.99)
    val raw = clique.toDF("id_a", "id_b", "cosine")
    val want = components(raw.toDF("doc_a", "doc_b", "cosine"))
    try {
      PairStore.invalidate(spark, name, dir)
      val stored = PairStore.refresh(spark, name, dir, compact = true)(raw)
      assert(stored.columns.toSeq == Seq("id_a", "id_b"),
        s"star form should keep the producer's column names, got ${stored.columns.toSeq}")
      assert(stored.count() == want.size - want.values.toSet.size)
      assert(components(stored.toDF("doc_a", "doc_b")) == want,
        "compacted id_a/id_b store resolves to different components")
    } finally PairStore.invalidate(spark, name, dir)
  }
}
