package graft.tiles

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._
import graft.core.ZRange

/** Serving-layer tile cache with spatial invalidation — the engine-side
  * equivalent of the reference's memcached + RegionManager pair
  * (`/root/reference/src/main/kotlin/io/marauder/tank/application.kt:358-362,
  * 469-471` and `cache/RegionManager.kt:25-177`): tank tracks bbox "regions"
  * of recent inserts and walks a quadtree from the root, invalidating every
  * cached tile whose node intersects a region (`coveredBy` → whole subtree,
  * `intersects` → recurse).
  *
  * Here the write path already knows exactly which Morton cells a commit
  * touched (the `hash` column of the written rows), so invalidation is
  * precise: a cached tile (z,x,y) dies iff its own cell cover intersects the
  * touched hash set. Tiles at z <= hashLevel map to ONE contiguous Morton
  * range (quad alignment), so the check is a sorted-range intersection — no
  * geometry, no recursion.
  */
final class TileCache(hashLevel: Int = 13,
                      cacheZoomMin: Int = 2, cacheZoomMax: Int = 15,
                      bufferFrac: Double = 1.0 / 128.0) {

  private val store = new ConcurrentHashMap[(String, Int, Int, Int), Array[Byte]]()

  def key(kind: String, z: Int, x: Int, y: Int): (String, Int, Int, Int) =
    (kind, z, x, y)

  def get(kind: String, z: Int, x: Int, y: Int): Option[Array[Byte]] =
    Option(store.get(key(kind, z, x, y)))

  /** Store only inside the cached zoom window (application.conf:14-17). */
  def put(kind: String, z: Int, x: Int, y: Int, bytes: Array[Byte]): Unit =
    if (z >= cacheZoomMin && z <= cacheZoomMax)
      store.put(key(kind, z, x, y), bytes)

  def size: Int = store.size()

  /** Invalidate every cached tile whose subtree intersects the bbox of a
    * write region — the reference's RegionManager walk as a direct call
    * (useful when only a geometry bbox is known, e.g. external writers).
    */
  def invalidateRegion(lonMin: Double, latMin: Double,
                       lonMax: Double, latMax: Double): Int = {
    val cov = graft.core.TileCover.cover(lonMin, latMin, lonMax, latMax, cacheZoomMax)
    var removed = 0
    store.keySet().asScala.toSeq.foreach { case k @ (_, z, x, y) =>
      // hit iff the tile is inside a cover subtree OR an ancestor of a cover
      // tile (its area contains part of the region)
      val hit = graft.core.TileCover.contains(cov, z, x, y) ||
        cov.exists { case (cz, cx, cy) =>
          cz > z && (cx >> (cz - z)) == x && (cy >> (cz - z)) == y
        }
      if (hit && store.remove(k) != null) removed += 1
    }
    removed
  }

  /** Invalidate every cached tile whose hash-cell cover intersects any of
    * the touched Morton cells (e.g. `df.select("hash").distinct().collect()`
    * of a write batch).
    *
    * Uses the SAME buffered cover the renderer reads from
    * (ZRange.coverWithBuffer, cf. TileService.hashPredicate): a cached tile
    * includes features from its clip-buffer halo, so a write landing only in
    * a neighboring cell that feeds that halo must still kill the tile.
    */
  def invalidateTouched(touchedHashes: Iterable[Int]): Int = {
    if (touchedHashes.isEmpty) return 0
    val sorted = touchedHashes.toArray.sorted
    var removed = 0
    store.keySet().asScala.toSeq.foreach { case k @ (_, z, x, y) =>
      val ranges = ZRange.coverWithBuffer(z, x, y, hashLevel, bufferFrac)
      val hit = ranges.exists { case (lo, hi) =>
        val i = java.util.Arrays.binarySearch(sorted, lo)
        val at = if (i >= 0) i else -i - 1
        at < sorted.length && sorted(at) <= hi
      }
      if (hit && store.remove(k) != null) removed += 1
    }
    removed
  }
}
