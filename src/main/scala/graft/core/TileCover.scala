package graft.core

/** Quadtree covering of a lon/lat region — the reference's cache-invalidation
  * walk (`/root/reference/src/main/kotlin/io/marauder/tank/cache/
  * RegionManager.kt:145-177`: BFS from the root tile, `coveredBy` → take the
  * whole subtree as one node, `intersects` → recurse), generalized to return
  * the minimal set of tiles covering a bbox.
  *
  * A fully-covered quad is emitted as ONE tile (its subtree is implied), so
  * the output is O(perimeter · depth) like [[ZRange.decompose]] — but in
  * (z, x, y) tile space across zoom levels, which is what a tile-cache
  * invalidation needs.
  */
object TileCover {

  /** Minimal tile set covering [lonMin,lonMax]×[latMin,latMax]: tiles at
    * zoom <= maxZoom, where an emitted tile at z < maxZoom stands for its
    * whole subtree. Tiles are (z, x, y).
    */
  def cover(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
            maxZoom: Int): Seq[(Int, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
    // region in world-fraction coords (y down); zero-extent (point/line)
    // regions are widened by an epsilon so a region lying exactly on a tile
    // boundary still intersects its neighbors (strict tests below would
    // otherwise classify it disjoint from EVERY tile)
    val eps = 1e-12
    var rx0 = WebMercator.projX(lonMin); var rx1 = WebMercator.projX(lonMax)
    var ry0 = WebMercator.projY(latMax); var ry1 = WebMercator.projY(latMin)
    if (rx1 - rx0 < eps) { rx0 -= eps; rx1 += eps }
    if (ry1 - ry0 < eps) { ry0 -= eps; ry1 += eps }
    def rec(z: Int, x: Int, y: Int): Unit = {
      val n = (1L << z).toDouble
      val tx0 = x / n; val tx1 = (x + 1) / n
      val ty0 = y / n; val ty1 = (y + 1) / n
      if (tx1 <= rx0 || tx0 >= rx1 || ty1 <= ry0 || ty0 >= ry1) return // disjoint
      if ((tx0 >= rx0 && tx1 <= rx1 && ty0 >= ry0 && ty1 <= ry1) || z == maxZoom) {
        out += ((z, x, y))
      } else {
        rec(z + 1, x << 1, y << 1)
        rec(z + 1, (x << 1) | 1, y << 1)
        rec(z + 1, x << 1, (y << 1) | 1)
        rec(z + 1, (x << 1) | 1, (y << 1) | 1)
      }
    }
    rec(0, 0, 0)
    out.toSeq
  }

  /** True iff tile (z,x,y) is inside the subtree of any cover tile. */
  def contains(cover: Seq[(Int, Int, Int)], z: Int, x: Int, y: Int): Boolean =
    cover.exists { case (cz, cx, cy) =>
      cz <= z && (x >> (z - cz)) == cx && (y >> (z - cz)) == cy
    }
}
