package graft.core

/** Slippy-map / WebMercator tile math.
  *
  * Mirrors the semantics the reference gets from its `charged` dependency's
  * `Projector` (call sites: `/root/reference/src/main/kotlin/io/marauder/tank/
  * tiling/Tyler.kt:127-134`, `application.kt:371-400`): standard OSM slippy
  * tile numbering, plus the unit-square [0,1) world projection used by the
  * tile pipeline.
  *
  * IMPORTANT: the arithmetic here is intentionally written as the exact same
  * IEEE operation sequence as the DuckDB oracle SQL in
  * [[graft.queries.Spatial]] so that `floor` lands on the same integer on
  * both sides.
  */
object WebMercator {

  private def clamp(v: Int, hi: Int): Int = math.max(0, math.min(hi, v))

  /** Slippy tile X index of a longitude at zoom z. */
  def tileX(lon: Double, z: Int): Int = {
    val n = (1L << z).toDouble
    clamp(math.floor((lon + 180.0) / 360.0 * n).toInt, (1 << z) - 1)
  }

  /** Slippy tile Y index of a latitude at zoom z. */
  def tileY(lat: Double, z: Int): Int = {
    val latRad = math.toRadians(lat)
    val n = (1L << z).toDouble
    val y = (1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi) / 2.0 * n
    clamp(math.floor(y).toInt, (1 << z) - 1)
  }

  /** World X in [0,1): unit-square WebMercator projection of a longitude. */
  def projX(lon: Double): Double = (lon + 180.0) / 360.0

  /** World Y in [0,1): unit-square WebMercator projection of a latitude. */
  def projY(lat: Double): Double = {
    val latRad = math.toRadians(lat)
    (1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi) / 2.0
  }

  /** West edge longitude of tile column x at zoom z. */
  def tileLon(x: Double, z: Int): Double = x / (1L << z).toDouble * 360.0 - 180.0

  /** North edge latitude of tile row y at zoom z. */
  def tileLat(y: Double, z: Int): Double = {
    val n = math.Pi - 2.0 * math.Pi * y / (1L << z).toDouble
    math.toDegrees(math.atan(math.sinh(n)))
  }

  /** (lonMin, latMin, lonMax, latMax) of tile (z, x, y). */
  def tileBBox(z: Int, x: Int, y: Int): (Double, Double, Double, Double) =
    (tileLon(x, z), tileLat(y + 1, z), tileLon(x + 1, z), tileLat(y, z))

  /** Great-circle distance in km (haversine, R=6371). */
  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLon / 2) * math.sin(dLon / 2)
    2.0 * 6371.0 * math.asin(math.sqrt(a))
  }
}
