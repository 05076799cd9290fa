package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator computing the bbox union of a WKT geometry column —
  * the per-group "region extent" statistic the reference tracks imperatively
  * for its insert regions (`/root/reference/src/main/kotlin/io/marauder/tank/
  * cache/Region.kt:28-54`), as a proper distributed aggregate: commutative
  * merge, partial aggregation on the map side, no geometry crossing the
  * shuffle (only 4 doubles per group).
  */
object BBoxAgg {

  final case class BBox(minX: Double, minY: Double, maxX: Double, maxY: Double)

  val Empty: BBox = BBox(Double.PositiveInfinity, Double.PositiveInfinity,
    Double.NegativeInfinity, Double.NegativeInfinity)

  private object agg extends Aggregator[String, BBox, BBox] {
    override def zero: BBox = Empty
    override def reduce(b: BBox, wkt: String): BBox = {
      if (wkt == null) return b
      // skip unparseable WKT (one bad row must not kill the aggregate) and
      // EMPTY geometries (JTS null-envelope is (0,-1,0,-1) — folding it in
      // would drag the group's bbox toward the origin)
      val geom =
        try graft.tiles.GeomUdfs.parse(wkt)
        catch { case _: Exception => return b }
      if (geom.isEmpty) return b
      val env = geom.getEnvelopeInternal
      BBox(math.min(b.minX, env.getMinX), math.min(b.minY, env.getMinY),
        math.max(b.maxX, env.getMaxX), math.max(b.maxY, env.getMaxY))
    }
    override def merge(a: BBox, b: BBox): BBox =
      BBox(math.min(a.minX, b.minX), math.min(a.minY, b.minY),
        math.max(a.maxX, b.maxX), math.max(a.maxY, b.maxY))
    override def finish(r: BBox): BBox = r
    override def bufferEncoder: Encoder[BBox] = Encoders.product[BBox]
    override def outputEncoder: Encoder[BBox] = Encoders.product[BBox]
  }

  /** Column form: bbox(geometryWkt) -> STRUCT<minX,minY,maxX,maxY>. */
  def bbox(geometry: Column): Column = udaf(agg).apply(geometry)
}
