package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{WebMercator, ZCurve}

/** Pure-JVM property gates for the ST-bbox → Z-range lowering's SOUNDNESS:
  * the optimizer rewrite is only semantics-preserving if every point a
  * bbox can contain hashes into the bbox's cell cover (a missed cell =
  * silently dropped rows after pushdown — the exact conjunct can only
  * discard over-scan, never resurrect pruned rows). The spec drives random
  * bboxes including degenerate (point) boxes, antimeridian-adjacent edges,
  * and beyond-projection latitudes where WebMercator clamps.
  */
class StBboxCoverSpec extends AnyFunSuite {

  private val Level = StCentroidInBbox.HashLevel

  private def covers(cover: Seq[(Int, Int)], lon: Double, lat: Double): Boolean = {
    val h = ZCurve.interleave(
      WebMercator.tileX(lon, Level), WebMercator.tileY(lat, Level))
    cover.exists { case (lo, hi) => h >= lo && h <= hi }
  }

  test("property: every point inside a random bbox hashes into its cell cover") {
    val rnd = new scala.util.Random(42)
    (0 until 300).foreach { trial =>
      val a = rnd.nextDouble() * 360 - 180; val b = rnd.nextDouble() * 360 - 180
      // latitudes deliberately overshoot the WebMercator range (±90 vs the
      // projection's ~±85.05) to exercise the clamped paths
      val c = rnd.nextDouble() * 180 - 90; val d = rnd.nextDouble() * 180 - 90
      val (lonMin, lonMax) = (math.min(a, b), math.max(a, b))
      val (latMin, latMax) = (math.min(c, d), math.max(c, d))
      val cover = StCentroidInBbox.cellCover(lonMin, latMin, lonMax, latMax)
      assert(cover.nonEmpty, s"trial $trial: empty cover for a valid bbox")
      (0 until 30).foreach { _ =>
        val lon = lonMin + rnd.nextDouble() * (lonMax - lonMin)
        val lat = latMin + rnd.nextDouble() * (latMax - latMin)
        assert(covers(cover, lon, lat),
          s"trial $trial: ($lon, $lat) inside bbox " +
            s"[$lonMin,$latMin,$lonMax,$latMax] escaped the cover " +
            "(unsound pruning — the rewrite would drop this row)")
      }
      // corners are the classic off-by-one escapes
      Seq((lonMin, latMin), (lonMin, latMax), (lonMax, latMin), (lonMax, latMax))
        .foreach { case (lon, lat) =>
          assert(covers(cover, lon, lat), s"trial $trial: corner ($lon, $lat) escaped")
        }
    }
  }

  test("degenerate (point) bbox covers its own cell") {
    val cover = StCentroidInBbox.cellCover(13.405, 52.52, 13.405, 52.52)
    assert(cover.nonEmpty && covers(cover, 13.405, 52.52))
  }

  test("cover size stays bounded for the world bbox (predicate-size cap)") {
    val world = StCentroidInBbox.cellCover(-180, -85, 180, 85)
    assert(world.nonEmpty && world.size <= 1056,
      s"world cover has ${world.size} ranges — the max-quads cap regressed")
    // and the whole world is one Morton block at the cap's granularity,
    // so every cell must be covered
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val lon = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 170 - 85
      assert(covers(world, lon, lat))
    }
  }

  test("inverted bbox (min > max) yields an empty cover and a false predicate") {
    assert(StCentroidInBbox.cellCover(10, 10, -10, -10).isEmpty)
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.IntegerType
    val p = StCentroidInBbox.rangePredicate(
      BoundReference(0, IntegerType, nullable = false), 10, 10, -10, -10)
    assert(p == Literal(false))
  }
}
