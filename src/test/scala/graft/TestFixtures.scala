package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{WebMercator, ZCurve}
import graft.tiles.GeomUdfs

/** FIXTURES.md §B2: the tank-shaped `features` table, built deterministically
  * from `customer` (B1 points) plus hand-written geometry edge cases around
  * an anchor tile — a polygon crossing a hash-cell boundary, a polygon
  * covering a full z=13 cell, a 3-cell linestring, a point exactly on a tile
  * corner, and a sub-pixel polygon.
  */
object TestFixtures {

  val HashLevel = 13

  /** Anchor z=13 cell (around 10E, 50N) used by the geometry edge cases. */
  val ax: Int = WebMercator.tileX(10.0, HashLevel)
  val ay: Int = WebMercator.tileY(50.0, HashLevel)
  // cell edges in lon/lat
  val lonW: Double = WebMercator.tileLon(ax, HashLevel)
  val lonE: Double = WebMercator.tileLon(ax + 1, HashLevel)
  val latN: Double = WebMercator.tileLat(ay, HashLevel)
  val latS: Double = WebMercator.tileLat(ay + 1, HashLevel)
  val dLon: Double = lonE - lonW
  val dLat: Double = latN - latS

  /** The hand-written edge-case geometries (WKT, class, value). */
  def specialWkts: Seq[(String, String, Double)] = Seq(
    // polygon straddling the east edge of the anchor cell (clip + D1 case):
    // centroid lies in the NEIGHBOR cell (ax+1) while it overlaps cell ax.
    ({
      val x0 = lonE - 0.05 * dLon; val x1 = lonE + 0.45 * dLon
      val y0 = latS + 0.3 * dLat; val y1 = latS + 0.7 * dLat
      s"POLYGON (($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))"
    }, "roads", 1.0),
    // polygon covering the entire anchor cell (plus margin)
    (s"POLYGON ((${lonW - 0.2 * dLon} ${latS - 0.2 * dLat}, ${lonE + 0.2 * dLon} ${latS - 0.2 * dLat}, " +
      s"${lonE + 0.2 * dLon} ${latN + 0.2 * dLat}, ${lonW - 0.2 * dLon} ${latN + 0.2 * dLat}, " +
      s"${lonW - 0.2 * dLon} ${latS - 0.2 * dLat}))", "buildings", 2.0),
    // linestring spanning 3 cells west-to-east through the anchor cell
    (s"LINESTRING (${lonW - 0.5 * dLon} ${latS + 0.5 * dLat}, ${lonE + 0.5 * dLon} ${latS + 0.5 * dLat})",
      "water", 3.0),
    // point exactly on the anchor tile's NW corner
    (s"POINT ($lonW $latN)", "poi", 4.0),
    // sub-pixel polygon in the cell center (< 1/4096 of the tile)
    (s"POLYGON ((${lonW + 0.5 * dLon} ${latS + 0.5 * dLat}, ${lonW + 0.5 * dLon + dLon / 8192} ${latS + 0.5 * dLat}, " +
      s"${lonW + 0.5 * dLon + dLon / 8192} ${latS + 0.5 * dLat + dLat / 8192}, ${lonW + 0.5 * dLon} ${latS + 0.5 * dLat}))",
      "poi", 5.0))

  /** The B2 features DataFrame: customer-derived points + special cases. */
  def features(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val classes = Seq("roads", "buildings", "water", "poi")
    val pts = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(
        col("c_custkey").as("id"),
        (((col("c_custkey") * 37) % 36000) / 100.0 - 180.0).as("lon"),
        (((col("c_custkey") * 53) % 17000) / 100.0 - 85.0).as("lat"),
        col("c_acctbal").as("value"))
      .select(col("id"), col("lon"), col("lat"),
        concat(lit("POINT ("), col("lon"), lit(" "), col("lat"), lit(")")).as("geometry"),
        element_at(typedLit(classes), (col("id") % 4 + 1).cast("int")).as("class"),
        col("value"))
    val hashUdf = udf((wkt: String) => GeomUdfs.centroidHash(wkt, HashLevel))
    val special = specialWkts.zipWithIndex
      .map { case ((wkt, cls, v), i) => (1000000L + i, wkt, cls, v) }
      .toDF("id", "geometry", "class", "value")
    pts.select(col("id"), col("geometry"), col("class"), col("value"))
      .unionByName(special)
      .withColumn("hash", hashUdf(col("geometry")))
      .withColumn("uid", concat(lit("uid-"), col("id")))
      .withColumn("timestamp", to_timestamp(lit("2026-01-01 00:00:00")))
      .select("hash", "uid", "timestamp", "class", "value", "geometry", "id")
  }
}
