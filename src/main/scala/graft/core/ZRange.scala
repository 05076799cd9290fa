package graft.core

/** Morton-range enumeration for tile requests — the reference's partition
  * pruning (`/root/reference/src/main/kotlin/io/marauder/tank/
  * application.kt:371-400`), generalized.
  *
  * A slippy tile at zoom z <= hashLevel covers an aligned 2^d x 2^d block of
  * hash-level cells (d = hashLevel - z); Morton order is contiguous on such
  * quad-aligned blocks, so the block is exactly one inclusive hash range.
  *
  * For z > hashLevel the tile nests inside a single hash-level cell. The
  * reference selects that one cell by the tile-bbox centroid
  * (application.kt:383-399) and therefore misses features whose *centroid
  * hash* lies in a neighboring cell even though their geometry overlaps the
  * tile (documented deviation D1 in SURVEY.md). [[coverWithBuffer]] fixes the
  * recall: it enumerates every hash-level cell intersecting the tile bbox
  * expanded by the clip buffer, then merges adjacent Morton ranges.
  */
object ZRange {

  /** Inclusive Morton range [lo, hi] of tile (z, x, y), for z <= hashLevel. */
  def rangeOf(z: Int, x: Int, y: Int, hashLevel: Int): (Int, Int) = {
    require(z <= hashLevel, s"rangeOf requires z <= hashLevel, got z=$z")
    val d = hashLevel - z
    val lo = ZCurve.interleave(x << d, y << d)
    val hi = ZCurve.interleave((x << d) + (1 << d) - 1, (y << d) + (1 << d) - 1)
    (lo, hi)
  }

  /** Hash ranges of all hashLevel cells whose extent intersects tile
    * (z, x, y) expanded by `bufferFrac` of the tile size on every side
    * (default 1/128 ~= the reference's buffer=64/extent=4096 * 0.5 margin,
    * application.kt:63-67). Returned ranges are merged where contiguous and
    * sorted. Works for any z (fixes D1 for z > hashLevel).
    */
  def coverWithBuffer(z: Int, x: Int, y: Int, hashLevel: Int,
                      bufferFrac: Double = 1.0 / 128.0): Seq[(Int, Int)] = {
    val max = (1 << hashLevel) - 1
    // tile extent in hash-level cell units
    val scale = math.pow(2.0, (hashLevel - z).toDouble)
    val x0 = math.max(0, math.floor((x - bufferFrac) * scale).toInt)
    val x1 = math.min(max, math.floor(((x + 1) + bufferFrac) * scale - 1e-12).toInt)
    val y0 = math.max(0, math.floor((y - bufferFrac) * scale).toInt)
    val y1 = math.min(max, math.floor(((y + 1) + bufferFrac) * scale - 1e-12).toInt)
    val ranges = for {
      cy <- y0 to y1
      cx <- x0 to x1
    } yield {
      val h = ZCurve.interleave(cx, cy)
      (h, h)
    }
    mergeRanges(ranges)
  }

  /** Merge sorted-or-unsorted inclusive ranges that touch or overlap. */
  def mergeRanges(rs: Seq[(Int, Int)]): Seq[(Int, Int)] = {
    if (rs.isEmpty) return Nil
    val sorted = rs.sortBy(_._1)
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int)](sorted.head)
    for ((lo, hi) <- sorted.tail) {
      val (plo, phi) = out.last
      if (lo.toLong <= phi.toLong + 1) out(out.size - 1) = (plo, math.max(phi, hi))
      else out += ((lo, hi))
    }
    out.toSeq
  }
}
