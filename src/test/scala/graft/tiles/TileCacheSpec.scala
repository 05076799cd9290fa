package graft.tiles

import org.scalatest.funsuite.AnyFunSuite
import graft.core.ZCurve

class TileCacheSpec extends AnyFunSuite {

  test("put respects the cached zoom window") {
    val c = new TileCache(cacheZoomMin = 2, cacheZoomMax = 15)
    c.put("tile", 1, 0, 0, Array(1))
    c.put("tile", 2, 0, 0, Array(1))
    c.put("tile", 16, 0, 0, Array(1))
    assert(c.get("tile", 1, 0, 0).isEmpty)
    assert(c.get("tile", 2, 0, 0).isDefined)
    assert(c.get("tile", 16, 0, 0).isEmpty)
  }

  test("a write touching a cell kills exactly the overlapping cached tiles") {
    val c = new TileCache()
    // cell (100, 200) at hash level 13
    val h = ZCurve.interleave(100, 200)
    // its z=9 ancestor tile, an unrelated z=9 tile, its z=13 tile,
    // a z=15 descendant, and the heatmap twin
    c.put("tile", 9, 100 >> 4, 200 >> 4, Array(1))
    c.put("tile", 9, (100 >> 4) + 5, 200 >> 4, Array(1))
    c.put("tile", 13, 100, 200, Array(1))
    c.put("tile", 15, 100 << 2, 200 << 2, Array(1))
    c.put("heatmap", 13, 100, 200, Array(1))
    c.put("tile", 13, 101, 200, Array(1)) // neighbor cell - survives

    val removed = c.invalidateTouched(Seq(h))
    // z9 ancestor + z13 + z15 descendant + heatmap twin
    assert(removed == 4, s"removed $removed")
    assert(c.get("tile", 9, (100 >> 4) + 5, 200 >> 4).isDefined)
    assert(c.get("tile", 13, 101, 200).isDefined)
    assert(c.get("tile", 13, 100, 200).isEmpty)
    assert(c.get("tile", 15, 100 << 2, 200 << 2).isEmpty)
    assert(c.get("heatmap", 13, 100, 200).isEmpty)
  }

  test("invalidation with many touched cells uses range intersection correctly") {
    val c = new TileCache()
    (0 until 16).foreach(x => c.put("tile", 13, x, 0, Array(1)))
    // touch cells x=0..7, y=0 -> kills tiles x=0..7 only
    val touched = (0 until 8).map(x => ZCurve.interleave(x, 0))
    assert(c.invalidateTouched(touched) == 8)
    assert(c.size == 8)
  }
}
