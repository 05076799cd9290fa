package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial math as Catalyst *column expressions* (not UDFs): tile
  * numbering, Morton interleave, haversine. Everything here compiles to
  * whole-stage-codegen'd built-in expressions, so the hot spatial path stays
  * vectorized and predicate-pushdown-friendly.
  *
  * The operation sequences intentionally mirror [[graft.core.WebMercator]] /
  * [[graft.core.ZCurve]] and the DuckDB oracle SQL ([[graft.queries.Sql]])
  * so results are bit-identical across engines.
  */
object GeoColumns {

  /** Slippy tile X (LongType) of a longitude column at zoom z, clamped to
    * [0, 2^z - 1] exactly like the scalar [[graft.core.WebMercator.tileX]]
    * (lon = 180.0 would otherwise index tile 2^z, outside the level).
    */
  def tileX(lon: Column, z: Int): Column =
    greatest(lit(0L), least(lit((1L << z) - 1),
      floor((lon + 180.0) / 360.0 * (1L << z).toDouble)))

  /** Slippy tile Y (LongType) of a latitude column at zoom z, clamped like
    * the scalar twin (poles/NaN would otherwise escape the level range).
    */
  def tileY(lat: Column, z: Int): Column = {
    val rawD = (lit(1.0) - log(tan(radians(lat)) + lit(1.0) / cos(radians(lat))) / math.Pi) /
      2.0 * (1L << z).toDouble
    // NaN (|lat| >= 90) clamps to 0 like the scalar's floor(NaN).toInt
    greatest(lit(0L), least(lit((1L << z) - 1),
      floor(when(rawD.isNaN, lit(0.0)).otherwise(rawD))))
  }

  /** Morton interleave of two long tile-coordinate columns, as the native
    * codegen'd [[MortonHashExpr]] (one plan node; the equivalent built-in
    * expression tree is ~130 nodes and gets re-inlined per use site). Result
    * equals [[graft.queries.Sql.interleave]] for coords < 2^16.
    */
  def mortonHash(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits <= 16, "MortonHashExpr interleaves the low 16 bits")
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(MortonHashExpr(
      GraftBridge.expression(x.cast("long")),
      GraftBridge.expression(y.cast("long"))))
  }

  /** Declarative bbox predicate on a WKT geometry column (centroid-in-bbox,
    * inclusive edges) — [[StCentroidInBbox]]. Over a features table with
    * the stored `hash` column, [[SpatialPredicateRewrite]] lowers it to
    * pushed Z-range comparisons; the caller never touches ZRange.
    */
  def centroidInBbox(geometry: Column, minLon: Double, minLat: Double,
                     maxLon: Double, maxLat: Double): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(StCentroidInBbox(Seq(
      GraftBridge.expression(geometry),
      GraftBridge.expression(lit(minLon)), GraftBridge.expression(lit(minLat)),
      GraftBridge.expression(lit(maxLon)), GraftBridge.expression(lit(maxLat)))))
  }

  /** Haversine distance in km to a fixed point (same op order as the oracle). */
  def haversineKmTo(lat: Column, lon: Column, lat0: Double, lon0: Double): Column = {
    val a = pow(sin(radians(lat - lat0) / 2), 2) +
      cos(radians(lit(lat0))) * cos(radians(lat)) * pow(sin(radians(lon - lon0) / 2), 2)
    lit(2.0) * lit(6371.0) * asin(sqrt(a))
  }
}
