package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.core.{GeoHash, WebMercator}

/** SQL-surface registration of the engine's spatial functions.
  *
  * Two equivalent entry points share one definition table:
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the production path — functions exist in every session of the
  *    context);
  *  - [[GraftFunctions.register]] for an already-running session (tests,
  *    notebooks).
  *
  * `zcurve_hash` is the native codegen'd [[MortonHashExpr]]; the rest are
  * scalar helpers where a plain UDF is adequate (not on any pruning path).
  */
object GraftFunctions {

  /** Native-expression functions: name -> (info, builder). */
  val expressions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("zcurve_hash"),
      new ExpressionInfo(classOf[MortonHashExpr].getName, "zcurve_hash"),
      (children: Seq[Expression]) => MortonHashExpr(children(0), children(1))),
    (FunctionIdentifier("in_tile"),
      new ExpressionInfo(classOf[InTileExpr].getName, "in_tile"),
      (children: Seq[Expression]) => InTileExpr(children)),
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimExpr(children(0), children(1))),
    (FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_f"),
      (children: Seq[Expression]) => DotProductExpr(children(0), children(1))))

  /** Register everything on a live session. */
  def register(spark: SparkSession): Unit = {
    expressions.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, ident, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(TilePredicateRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TilePredicateRewrite
    spark.udf.register("haversine_km",
      (lat1: Double, lon1: Double, lat2: Double, lon2: Double) =>
        WebMercator.haversineKm(lat1, lon1, lat2, lon2))
    spark.udf.register("tile_x", (lon: Double, z: Int) => WebMercator.tileX(lon, z))
    spark.udf.register("tile_y", (lat: Double, z: Int) => WebMercator.tileY(lat, z))
    spark.udf.register("geohash_encode",
      (lat: Double, lon: Double, precision: Int) => GeoHash.encode(lat, lon, precision))
    // curation kernels (operators.Kernels) — the per-doc tight-loop surface.
    // NULL inputs propagate null (Option return / explicit guards): Spark
    // does NOT null-check reference-typed UDF params for us
    import graft.operators.Kernels
    spark.udf.register("simhash64",
      (t: String) => Option(t).map(Kernels.simHash64))
    spark.udf.register("winnow_fps",
      (t: String, k: Int, w: Int) => Kernels.winnowFps(t, k, w))
    spark.udf.register("minhash_sig",
      (shs: Seq[String], n: Int) =>
        if (shs == null) null else Kernels.minHashSig(shs.toArray, n))
    spark.udf.register("token_counts",
      (t: String, minLen: Int) => Kernels.tokenCounts(t, minLen))
    spark.udf.register("tri_stats", (t: String) => Kernels.triStats(t))
    spark.udf.register("quantize_int8",
      (v: Seq[Float]) => if (v == null) null else Kernels.quantizeInt8(v.toArray))
  }
}

/** `spark.sql.extensions` entry point injecting the native expressions and
  * the tile-predicate lowering rule.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.expressions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectOptimizerRule(_ => TilePredicateRewrite)
  }
}
