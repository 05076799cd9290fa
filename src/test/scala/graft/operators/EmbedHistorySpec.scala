package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class EmbedHistorySpec extends SparkSpec {

  import spark.implicits._

  // 8-dim fixture: three well-separated history directions plus copies
  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(8)(r.nextFloat() * 2f - 1f)
  }

  private def histVecs: DataFrame = Seq(
    (1L, vec(11)), (2L, vec(23)), (3L, vec(47)))
    .toDF("vec_id", "embedding")

  test("memo: one store per (app, dir); hit skips the history thunk") {
    val dir = java.nio.file.Files.createTempDirectory("graft-eh").toString
    val evals = new AtomicInteger(0)
    def hist: DataFrame = { evals.incrementAndGet(); histVecs }
    try {
      val p1 = EmbedHistory.cachedStore(spark, dir, hist)
      val p2 = EmbedHistory.cachedStore(spark, dir, hist)
      assert(p1 == p2, "memo hit returned a different store path")
      assert(evals.get() == 1, "memo hit re-evaluated the history thunk")
    } finally EmbedHistory.invalidate(dir)
  }

  test("store probe finds a verbatim copy at cos 1.0; novel vector takes no pair") {
    val dir = java.nio.file.Files.createTempDirectory("graft-eh2").toString
    try {
      val path = EmbedHistory.cachedStore(spark, dir, histVecs)
      val batch = Seq((10L, vec(11)), (11L, vec(997)))
        .toDF("query_id", "qe")
      val hits = IvfStore.search(spark, path, batch, k = 2, nprobe = 2)
        .filter(col("cos_sim") >= 0.999)
        .select(col("query_id"), col("vec_id"),
          round(col("cos_sim"), 4).as("c"))
        .as[(Long, Long, Double)].collect().toSet
      assert(hits == Set((10L, 1L, 1.0)), s"got $hits")
    } finally EmbedHistory.invalidate(dir)
  }

  test("append extends the history the probe sees (family growth contract)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-eh3").toString
    try {
      val path = EmbedHistory.cachedStore(spark, dir, histVecs)
      val novel = vec(997)
      def probe() = IvfStore.search(spark, path,
          Seq((20L, novel)).toDF("query_id", "qe"), k = 2, nprobe = 2)
        .filter(col("cos_sim") >= 0.999).count()
      assert(probe() == 0L)
      IvfStore.append(spark, path,
        Seq((4L, novel)).toDF("vec_id", "embedding"))
      assert(probe() == 1L, "appended vector not visible to the probe")
    } finally EmbedHistory.invalidate(dir)
  }

  test("the registry is a bounded LRU and eviction deletes the store dir") {
    EmbedHistory.invalidate()
    def mkDir() = java.nio.file.Files.createTempDirectory("graft-ehlru").toString
    val firstDir = mkDir()
    val firstPath = new java.io.File(
      EmbedHistory.cachedStore(spark, firstDir, histVecs, nlist = 1,
        kmeansIters = 1))
    assert(firstPath.exists())
    (0 until 32).foreach { _ =>
      EmbedHistory.cachedStore(spark, mkDir(), histVecs, nlist = 1,
        kmeansIters = 1): Unit
    }
    assert(EmbedHistory.memoSize <= 32,
      s"registry grew past its bound: ${EmbedHistory.memoSize}")
    assert(!firstPath.exists(),
      s"evicted entry's IvfStore dir not deleted: $firstPath")
    EmbedHistory.invalidate()
  }

  test("x124 registry entry: every planted recrawl pairs with its original at 1.0") {
    EmbedHistory.invalidate(Sf)
    try {
      val rows = graft.queries.VectorOps.x124_incremental_embed_neardup
        .build(spark, Sf)
        .select(col("batch_id"), col("hist_id"), col("cos_sim"))
        .as[(Long, Long, Double)].collect()
      assert(rows.nonEmpty)
      assert(rows.forall { case (b, h, c) => b == h + 10000000L && c == 1.0 },
        s"non-planted or sub-1.0 pair surfaced: ${rows.take(5).toSeq}")
    } finally EmbedHistory.invalidate(Sf)
  }
}
