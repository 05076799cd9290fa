package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfStoreSpec extends SparkSpec {

  private def tmpStore(): String = {
    val d = java.nio.file.Files.createTempDirectory("ivfstore").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/idx"
  }

  private lazy val emb = graft.queries.Tables.embeddings(spark, Sf).cache()
  private lazy val queries = emb.filter(col("vec_id").isin(1L, 2L, 3L))
    .select(col("vec_id").as("query_id"), col("embedding").as("qe")).cache()

  test("store search is bit-identical to the transient IVF with the same centroids") {
    val path = tmpStore()
    val cents = IvfStore.create(spark, path, emb, nlist = 16)
    val fromStore = IvfStore.search(spark, path, queries, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val transient = Similarity
      .ivfTopKWithCentroids(emb, queries, k = 10, cents, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromStore.nonEmpty && fromStore == transient,
      s"store-only: ${fromStore -- transient}; transient-only: ${transient -- fromStore}")
  }

  test("centroids round-trip parquet exactly; probe ranking is stable across reopen") {
    val path = tmpStore()
    val cents = IvfStore.create(spark, path, emb, nlist = 8)
    val back = IvfStore.centroids(spark, path)
    assert(back.length == cents.length)
    cents.indices.foreach { i =>
      assert(java.util.Arrays.equals(back(i), cents(i)), s"centroid $i drifted")
    }
  }

  test("search reads only the probed cell partitions") {
    val path = tmpStore()
    IvfStore.create(spark, path, emb, nlist = 16)
    val df = IvfStore.search(spark, path, queries, k = 10, nprobe = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no cell partition pruning in:\n$plan")
    // 3 queries x 2 probes can touch at most 6 of 16 cells
    import spark.implicits._
    val probed = Similarity
      .probeCells(queries, IvfStore.centroids(spark, path), 2)
      .select("cell").distinct().as[Long].collect()
    assert(probed.length <= 6 && probed.length < 16,
      s"fixture must probe a strict subset of cells, got ${probed.length}")
  }

  test("append equals one layout of the union under the frozen centroids (search bit-identity)") {
    val path = tmpStore()
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val batch = emb.filter(col("vec_id") % 10 === 0)
    assert(batch.count() > 0)
    val cents = IvfStore.create(spark, path, base, nlist = 16)
    IvfStore.append(spark, path, batch)
    val fromStore = IvfStore.search(spark, path, queries, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val transient = Similarity
      .ivfTopKWithCentroids(emb, queries, k = 10, cents, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromStore.nonEmpty && fromStore == transient,
      s"store-only: ${fromStore -- transient}; transient-only: ${transient -- fromStore}")
  }

  test("compact re-clusters cell files without changing search answers") {
    val path = tmpStore()
    val base = emb.filter(col("vec_id") % 4 =!= 0)
    IvfStore.create(spark, path, base, nlist = 8)
    (0 to 2).foreach { r =>
      IvfStore.append(spark, path,
        emb.filter(col("vec_id") % 4 === 0 && col("vec_id") % 3 === r))
    }
    def ans() = IvfStore.search(spark, path, queries, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def nFiles: Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$path/vectors")).count(_.getName.endsWith(".parquet"))
    }
    val before = ans()
    val f0 = nFiles
    IvfStore.compact(spark, path)
    assert(ans() == before, "compaction changed search answers")
    assert(nFiles < f0, s"compaction did not shrink file count: $f0 -> $nFiles")
  }

  test("compact restores distinct rows after a replayed append (replay absorb)") {
    import spark.implicits._
    val path = tmpStore()
    val vec = Array.fill(8)(0.5f)
    IvfStore.create(spark, path,
      Seq((1L, Array.fill(8)(-0.5f))).toDF("vec_id", "embedding"),
      nlist = 1, kmeansIters = 1)
    val delta = Seq((10L, vec)).toDF("vec_id", "embedding")
    IvfStore.append(spark, path, delta)
    IvfStore.append(spark, path, delta) // the crashed-epoch replay
    def hits() = IvfStore.search(spark, path,
        Seq((20L, vec)).toDF("query_id", "qe"), k = 4, nprobe = 1)
      .filter(col("cos_sim") >= 0.999).collect().length
    assert(hits() == 2, "duplicate rows should each take a top-k seat")
    IvfStore.compact(spark, path)
    assert(hits() == 1, "compact did not collapse the replayed rows")
  }

  test("rebalance on an empty store neither throws nor breaks search") {
    val path = tmpStore()
    IvfStore.create(spark, path, emb.limit(0), nlist = 4)
    assert(IvfStore.search(spark, path, queries, k = 5, nprobe = 2)
      .count() == 0, "empty store must answer empty before rebalance")
    IvfStore.rebalance(spark, path)
    assert(IvfStore.search(spark, path, queries, k = 5, nprobe = 2)
      .count() == 0, "empty store must answer empty after rebalance")
    val stat = IvfStore.skewStat(spark, path)
    assert(stat.cells == 0L && stat.skew == 0.0,
      s"empty store must report zero skew: $stat")
  }

  test("rebalance: a skew-grown store regains balanced cells; answers stay " +
      "exact-in-probed-cells; appends follow the new centroids") {
    import spark.implicits._
    val dim = 8
    def vec(c: Array[Double], seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      c.map(x => (x + r.nextGaussian() * 0.02).toFloat)
    }
    def axis(i: Int, sign: Double) =
      Array.tabulate(dim)(j => if (j == i) sign else 0.0)
    // original corpus: 4 tight clusters near +e_0..+e_3 — the fit sees these
    val base = (0 until 200).map(i => ((i + 1).toLong, vec(axis(i % 4, 1.0), i)))
    // drift: 2× as many vectors in a region the FROZEN quantizer never
    // saw. The region center is UNIQUELY nearest to ONE frozen centroid
    // (asymmetric components — a symmetric center ties and spreads), so
    // every drift vector piles into that cell; its four sub-clusters
    // live in dims 4..7 the base never uses, giving the retrain real
    // structure to split.
    val driftC = Array(-2.0, -1.0, 0.7, 0.3, 0.0, 0.0, 0.0, 0.0)
    def driftSub(j: Int) =
      driftC.zipWithIndex.map { case (x, d) => if (d == 4 + j) x + 0.5 else x }
    val grown = (0 until 400).map(i =>
      ((1000 + i).toLong, vec(driftSub(i % 4), 7777 + i)))
    val path = tmpStore()
    IvfStore.create(spark, path, base.toDF("vec_id", "embedding"),
      nlist = 4, kmeansIters = 4)
    IvfStore.append(spark, path, grown.toDF("vec_id", "embedding"))
    def cellSizes(): Map[Long, Long] = spark.read.parquet(path + "/vectors")
      .groupBy("cell").count().as[(Long, Long)].collect().toMap
    val before = cellSizes()
    // the skew fixture must be real: one frozen cell absorbed the whole
    // drift region, so a probe of it reads drift-sized bytes
    assert(before.values.max >= 400,
      s"fixture not skewed: $before")
    // skewStat sees the drift from the LISTING alone (the rebalance
    // trigger — no vector bytes read): max/mean across cell dirs reflects
    // the 400-row cell against the ~50-row base cells
    val statBefore = IvfStore.skewStat(spark, path)
    assert(statBefore.cells == before.keySet.size.toLong)
    assert(statBefore.skew >= 2.0,
      s"listing-level skew stat missed the drift: $statBefore")
    val cents = IvfStore.rebalance(spark, path, nlist = 8, kmeansIters = 4)
    val after = cellSizes()
    val statAfter = IvfStore.skewStat(spark, path)
    assert(statAfter.cells == 8L)
    assert(statAfter.skew < statBefore.skew,
      s"rebalance did not reduce the listing-level skew: " +
        s"$statAfter vs $statBefore")
    assert(after.keySet.size == 8 && after.values.sum == 600,
      s"rebalance lost rows or cells: $after")
    assert(after.values.max <= before.values.max / 2,
      s"cells still skewed after rebalance: $after vs $before")
    // answers: bit-identical to the transient IVF on the NEW centroids,
    // and nprobe=2 recall vs brute force is exact on this margin
    val qs = (0 until 4).map(i => ((i + 1).toLong,
      driftSub(i).map(_.toFloat))).toDF("query_id", "qe")
    val all = (base ++ grown).toDF("vec_id", "embedding")
    val fromStore = IvfStore.search(spark, path, qs, k = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val transient = Similarity
      .ivfTopKWithCentroids(all, qs, k = 10, cents, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromStore == transient,
      s"store-only: ${fromStore -- transient}; transient-only: ${transient -- fromStore}")
    val exact = Similarity.bruteForceTopK(all, qs, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromStore == exact,
      s"nprobe=2 recall lost on the rebalanced layout: missing ${exact -- fromStore}")
    // appends now assign against the NEW centroids: a planted twin of a
    // drift-region vector is found at cos 1.0
    val twin = Seq((999999L, grown.head._2)).toDF("vec_id", "embedding")
    IvfStore.append(spark, path, twin)
    val top = IvfStore.search(spark, path,
        Seq((50L, grown.head._2)).toDF("query_id", "qe"), k = 3, nprobe = 1)
      .collect()
    assert(top.exists(r => r.getLong(1) == 999999L &&
      math.abs(r.getDouble(2) - 1.0) < 1e-9),
      s"post-rebalance append missing: ${top.mkString(", ")}")
  }

  test("append assigns with the frozen centroids; a planted twin is found") {
    val path = tmpStore()
    IvfStore.create(spark, path, emb, nlist = 16)
    val twinId = 999999L
    val twin = emb.filter(col("vec_id") === 1)
      .select(lit(twinId).as("vec_id"), col("embedding"))
    IvfStore.append(spark, path, twin)
    val top = IvfStore.search(spark, path,
        queries.filter(col("query_id") === 1), k = 3, nprobe = 4)
      .collect()
    val twinRow = top.find(_.getLong(1) == twinId)
    assert(twinRow.isDefined, s"appended twin missing: ${top.mkString(", ")}")
    assert(math.abs(twinRow.get.getDouble(2) - 1.0) < 1e-9)
  }
}
