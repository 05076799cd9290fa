package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev probe: measure [[graft.operators.Similarity.cellBoundedTopPairsAuto]]
  * in its LINEAR regime — derived nlist ≫ probes² — against the exact
  * chunked search ([[graft.operators.Similarity.topPairsByLabel]], the x42
  * kernel) at 1×/10×/30× corpus scale.
  *
  * Why a dedicated corpus: the shared synthetic `embeddings.parquet` is
  * near-ISOTROPIC — its global top-20 pairs sit at cos ≈ 0.45, barely above
  * background, so fine cells split them and the auto form's recall
  * collapses (documented at cellBoundedTopPairsAuto's scaladoc). That is
  * the wrong regime to measure the linear-scale claim in: SemDeDup-style
  * cell-bounded dedup is built for corpora whose near-dup pairs carry a
  * real MARGIN (cos ≥ ~0.95 vs background ≲ 0.8). This probe generates
  * exactly that shape — isotropic unit background + planted near-dup pairs
  * at cos ≈ 1/√(1+ε²) ≈ 0.995 (ε = 0.1), pair members sharing a label —
  * and scales it 1×/10×/30× with every quantity linear in n, so
  *  - exact per-label search does Σ n_label² work → wall ratio ~F²-ish,
  *  - the auto form derives nlist = n/targetCellSize (≫ probes² = 9 from
  *    10× up) and does n·probes²·targetCellSize work → wall ratio ~F,
  *  - recall@20 vs exact must hold ≥ 0.95 (the margin keeps planted pairs
  *    co-resident in probed cells at any nlist).
  *
  * Corpora are persisted under the out dir and reused on re-runs (delete to
  * regenerate). Results go to one stdout JSON line; record the quiet-box
  * run in BASELINE.md.
  *
  * Usage: runMain graft.tools.CellLinearProbe [outRoot] [n0] [dim]
  */
object CellLinearProbe {

  private val Labels = 8
  private val Eps = 0.1 // dup noise amplitude → planted cos ≈ 0.995
  // probes=4 (not the scaladoc default 3): at derived nlist ≈ n/128 the
  // per-pair cell-split miss rate with 3 probes measured ~3/20 at 30×
  // (recall@20 0.85); the 4th probe buys it back for probes²/nlist =
  // 16/739 ≪ 1 extra work — recall insurance scales quadratically
  // cheaper than the nlist win at this regime's cell counts
  private val Probes = 4

  /** Isotropic unit vectors + planted near-dups, persisted as
    * (vec_id long, label int, embedding array<float>). ids: background
    * 0..n-1, planted dup j duplicates anchor j at id n+j (j < planted).
    */
  def generate(spark: SparkSession, dir: String, n: Long, planted: Long,
               dim: Int, seed: Long): Unit = {
    val raw = array((0 until dim).map(i => randn(seed + i)): _*)
    spark.range(n)
      .select(col("id").as("vec_id"),
        pmod(hash(col("id")), lit(Labels)).cast(IntegerType).as("label"),
        raw.as("raw"))
      .withColumn("nrm", sqrt(expr("aggregate(raw, 0D, (acc, x) -> acc + x * x)")))
      .withColumn("embedding", expr("transform(raw, x -> cast(x / nrm as float))"))
      .select("vec_id", "label", "embedding")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/base.parquet")
    // dups derive from the PERSISTED base (randn is partition-seeded; the
    // anchor a dup perturbs must be the anchor the corpus actually holds)
    val base = spark.read.parquet(s"$dir/base.parquet")
    val noise = array((0 until dim).map(i =>
      randn(seed + 7919 + i) * lit(Eps)): _*)
    val dups = base.filter(col("vec_id") < planted)
      .withColumn("noise", noise)
      .withColumn("raw", expr("zip_with(embedding, noise, (a, b) -> a + b)"))
      .withColumn("nrm", sqrt(expr("aggregate(raw, 0D, (acc, x) -> acc + cast(x as double) * x)")))
      .withColumn("embedding", expr("transform(raw, x -> cast(x / nrm as float))"))
      .select((col("vec_id") + lit(n)).as("vec_id"), col("label"), col("embedding"))
    base.unionByName(dups)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val load0 = graft.Bench.loadAvg()
    val outRoot = if (args.length > 0) args(0) else "/tmp/graft_cell_linear"
    val n0 = if (args.length > 1) args(1).toLong else 3000L
    val dim = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000).selectExpr("sum(id)").collect()

    val factors = Seq(1, 10, 30)
    val results = factors.map { f =>
      val dir = s"$outRoot/f$f"
      val n = n0 * f
      val planted = n / 20 // 5% dup rate, linear in n
      if (!new java.io.File(s"$dir/embeddings.parquet/_SUCCESS").exists()) {
        println(s"[celllinear] generating ${f}x margin corpus at $dir " +
          s"(n=$n + $planted planted dups, dim=$dim)")
        generate(spark, dir, n, planted, dim, seed = 42L + f)
      }
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").cast(LongType), col("label").cast(IntegerType),
          col("embedding"))
        .as[(Long, Int, Array[Float])]
      def top20(df: DataFrame): Set[(Long, Long)] = df
        .orderBy(col("cos_sim").desc, col("id_a").asc, col("id_b").asc)
        .limit(20).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def median(runs: Int)(body: => Set[(Long, Long)]): (Double, Set[(Long, Long)]) = {
        var out: Set[(Long, Long)] = Set.empty
        val ts = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          out = body
          (System.nanoTime() - t0) / 1e9
        }.sorted
        (ts(runs / 2), out)
      }
      val (exactWall, exact) = median(3)(top20(
        graft.operators.Similarity.topPairsByLabel(emb, 20, targetChunk = 256)))
      // the auto form's wall INCLUDES its count + k-means fit — the honest
      // production accounting (a fixed-centroid variant would hide the fit)
      val (autoWall, approx) = median(3)(top20(
        graft.operators.Similarity.cellBoundedTopPairsAuto(
          emb, 20, targetCellSize = 128, probes = Probes, targetChunk = 256)))
      val recall =
        if (exact.isEmpty) 1.0
        else (approx & exact).size.toDouble / exact.size
      val nlist = math.max(8L, (emb.count() + 127) / 128)
      println(f"[celllinear] ${f}%2dx n=${n + planted}%7d nlist≈$nlist%4d " +
        f"exact=$exactWall%7.2fs auto=$autoWall%7.2fs recall@20=$recall%5.3f")
      (f, exactWall, autoWall, recall, nlist)
    }
    val base = results.head
    val rows = results.map { case (f, e, a, r, nl) =>
      s"""\"${f}x\":{\"n\":${n0 * f + n0 * f / 20},\"nlist\":$nl,""" +
        s"""\"exact_wall\":$e,\"auto_wall\":$a,""" +
        s"""\"exact_ratio\":${e / base._2},\"auto_ratio\":${a / base._3},""" +
        s"""\"recall_at_20\":$r}"""
    }.mkString("{", ",", "}")
    val loadEnd = graft.Bench.loadAvg()
    println(s"""{"metric":"cell_linear_probe","n0":$n0,"dim":$dim,""" +
      s""""target_cell_size":128,"probes":$Probes,"scales":$rows,""" +
      s""""load_start":$load0,"load_end":$loadEnd,""" +
      s""""load_quiet":${load0 >= 0 && load0 <= 0.5}}""")
    if (!(load0 >= 0 && load0 <= 0.5))
      println(f"[celllinear] WARNING: loadavg $load0%.2f at start — wall " +
        "ratios from this run are suspect; re-run quiet before recording.")
    // gates AFTER printing: the numbers must survive a failed gate
    results.foreach { case (f, _, _, r, _) =>
      require(r >= 0.95,
        f"auto-form recall@20 $r%.3f < 0.95 at ${f}x — the margin corpus " +
          "should keep planted pairs co-resident; check Eps/targetCellSize")
    }
    val exact30 = results.last._2 / base._2
    val auto30 = results.last._3 / base._3
    require(auto30 < exact30,
      f"auto 30x wall ratio $auto30%.2f did not beat exact's $exact30%.2f " +
        "— the linear regime claim is not demonstrated on this box")
    spark.stop()
  }
}
