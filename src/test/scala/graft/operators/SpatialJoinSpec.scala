package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.Spatial

class SpatialJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val points = Spatial.points(spark, Sf).cache()

  // a triangle, a polygon with a hole, and a tiny sliver — all placed in
  // the region the sf0.001 B1 points actually occupy (lon [-180,-124],
  // lat [-85,-6]; the formula is linear in custkey for small keys)
  private lazy val polys = Seq(
    (1L, "POLYGON ((-175 -80, -140 -80, -160 -30, -175 -80))"),
    (2L, "POLYGON ((-155 -75, -125 -75, -125 -10, -155 -10, -155 -75), " +
      "(-145 -60, -135 -60, -135 -30, -145 -30, -145 -60))"),
    (3L, "POLYGON ((-135.35 -20.15, -135.15 -20.15, -135.15 -19.95, -135.35 -19.95, -135.35 -20.15))")
  ).toDF("poly_id", "wkt")

  test("tile-bucketed join equals brute-force JTS containment") {
    val fast = SpatialJoin.pointInPolygon(points, polys)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val containsUdf = udf((w: String, lo: Double, la: Double) => {
      val g = graft.tiles.GeomUdfs.parse(w)
      g.contains(g.getFactory.createPoint(
        new org.locationtech.jts.geom.Coordinate(lo, la)))
    })
    val brute = points.crossJoin(polys)
      .filter(containsUdf(col("wkt"), col("lon"), col("lat")))
      .select("id", "poly_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(fast == brute,
      s"missing=${(brute -- fast).take(5)} extra=${(fast -- brute).take(5)}")
    assert(brute.nonEmpty, "fixture produced no contained points")
  }

  test("points inside the hole are excluded") {
    val inHole = points.filter(
      col("lon") > -144 && col("lon") < -136 && col("lat") > -55 && col("lat") < -35)
      .select("id").as[Long].collect().toSet
    if (inHole.nonEmpty) {
      val joined = SpatialJoin.pointInPolygon(points, polys)
        .filter(col("poly_id") === 2L)
        .select("id").as[Long].collect().toSet
      assert(inHole.intersect(joined).isEmpty, "hole points leaked into the join")
    }
  }

  test("each contained pair appears exactly once (disjoint cover, no dedup)") {
    val rows = SpatialJoin.pointInPolygon(points, polys)
      .groupBy("id", "poly_id").count()
      .filter(col("count") > 1)
    assert(rows.isEmpty, "duplicate candidate pairs emitted")
  }
}
