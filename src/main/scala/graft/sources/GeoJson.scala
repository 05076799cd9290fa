package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Minimal GeoJSON-geometry → WKT converter (Jackson is already on Spark's
  * classpath; JTS has no GeoJSON reader in jts-core). Covers the geometry
  * types the reference ingests (`/root/reference/src/main/kotlin/io/marauder/
  * tank/application.kt:386-392` handles Polygon explicitly; the charged
  * models cover the rest of the simple-feature set).
  */
object GeoJson {

  @transient private lazy val mappers =
    ThreadLocal.withInitial[ObjectMapper](() => new ObjectMapper())

  def toWkt(geometryJson: String): String = {
    if (geometryJson == null) return null
    try {
      val node = mappers.get.readTree(geometryJson)
      val t = node.get("type").asText()
      val c = node.get("coordinates")
      t match {
        case "Point" => s"POINT (${pos(c)})"
        case "MultiPoint" => s"MULTIPOINT (${seq(c, pos)})"
        case "LineString" => s"LINESTRING (${seq(c, pos)})"
        case "MultiLineString" => s"MULTILINESTRING (${seq(c, n => s"(${seq(n, pos)})")})"
        case "Polygon" => s"POLYGON (${seq(c, n => s"(${seq(n, pos)})")})"
        case "MultiPolygon" =>
          s"MULTIPOLYGON (${seq(c, p => s"(${seq(p, n => s"(${seq(n, pos)})")})")})"
        case _ => null
      }
    } catch { case _: Exception => null }
  }

  private def pos(n: JsonNode): String =
    s"${n.get(0).asDouble()} ${n.get(1).asDouble()}"

  private def seq(n: JsonNode, f: JsonNode => String): String = {
    val parts = (0 until n.size()).map(i => f(n.get(i)))
    parts.mkString(", ")
  }

  /** WKT → GeoJSON geometry (the read-path inverse, for A4-style feature
    * responses). Uses JTS for parsing; emits plain JSON text.
    */
  def fromWkt(wkt: String): String = {
    import org.locationtech.jts.geom._
    if (wkt == null) return null
    val g = graft.tiles.GeomUdfs.parse(wkt)
    def p(c: Coordinate): String = s"[${c.getX},${c.getY}]"
    def ring(cs: Array[Coordinate]): String = cs.map(p).mkString("[", ",", "]")
    def polyCoords(poly: Polygon): String =
      (ring(poly.getExteriorRing.getCoordinates) +:
        (0 until poly.getNumInteriorRing)
          .map(i => ring(poly.getInteriorRingN(i).getCoordinates)))
        .mkString("[", ",", "]")
    def geomJson(g: Geometry): String = g match {
      // a true GEOMETRYCOLLECTION needs RFC 7946's "geometries" array of
      // geometry OBJECTS (Multi* types still use "coordinates")
      case gc: GeometryCollection if g.getGeometryType == "GeometryCollection" =>
        val members = (0 until gc.getNumGeometries)
          .map(i => geomJson(gc.getGeometryN(i))).mkString("[", ",", "]")
        s"""{"type":"GeometryCollection","geometries":$members}"""
      case _ =>
        s"""{"type":"${g.getGeometryType}","coordinates":${coords(g)}}"""
    }
    def coords(g: Geometry): String = g match {
      case pt: Point =>
        Option(pt.getCoordinate).map(p).getOrElse("[]") // POINT EMPTY
      case l: LineString => ring(l.getCoordinates)
      case poly: Polygon => polyCoords(poly)
      case multi: GeometryCollection =>
        (0 until multi.getNumGeometries).map(i => coords(multi.getGeometryN(i)))
          .mkString("[", ",", "]")
    }
    geomJson(g)
  }
}
