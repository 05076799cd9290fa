package graft.tiles

import org.scalatest.funsuite.AnyFunSuite
import graft.core.WebMercator

/** T6 clip invariants (SURVEY §5.2) over seeded random geometries: output
  * always inside the buffered tile square, empty when disjoint, identity-
  * like when fully inside, and stable under re-clipping (idempotence at the
  * integer grid).
  */
class ClipSpec extends AnyFunSuite {

  private val z = 13
  private val x = WebMercator.tileX(10.0, z)
  private val y = WebMercator.tileY(50.0, z)
  private val lonW = WebMercator.tileLon(x, z)
  private val lonE = WebMercator.tileLon(x + 1, z)
  private val latN = WebMercator.tileLat(y, z)
  private val latS = WebMercator.tileLat(y + 1, z)
  private val dLon = lonE - lonW
  private val dLat = latN - latS

  private def clip(wkt: String): Option[String] =
    Option(GeomUdfs.clipToTile(wkt, z, x, y, 4096, 64))

  private def boxWkt(x0: Double, y0: Double, x1: Double, y1: Double): String =
    s"POLYGON (($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))"

  test("random polygons: clipped output stays inside the buffered square") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      // random box, possibly far outside the tile
      val cx = lonW + (rnd.nextDouble() * 6 - 3) * dLon
      val cy = latS + (rnd.nextDouble() * 6 - 3) * dLat
      val w = rnd.nextDouble() * 2 * dLon
      val h = rnd.nextDouble() * 2 * dLat
      clip(boxWkt(cx, cy, cx + w, cy + h)).foreach { out =>
        val (_, rings) = GeomUdfs.toMvtRings(out)
        rings.flatten.foreach { case (px, py) =>
          assert(px >= -64 && px <= 4160 && py >= -64 && py <= 4160,
            s"($px,$py) escaped the buffered tile for box ($cx,$cy,$w,$h)")
        }
      }
    }
  }

  test("disjoint geometry clips to empty") {
    assert(clip(boxWkt(lonW + 10 * dLon, latS, lonW + 11 * dLon, latN)).isEmpty)
    assert(clip(s"POINT (${lonW + 5 * dLon} $latS)").isEmpty)
  }

  test("geometry fully inside maps without loss") {
    val inner = boxWkt(lonW + 0.25 * dLon, latS + 0.25 * dLat,
      lonW + 0.75 * dLon, latS + 0.75 * dLat)
    val out = clip(inner)
    assert(out.isDefined)
    val (gt, rings) = GeomUdfs.toMvtRings(out.get)
    assert(gt == 3 && rings.head.size >= 4)
    // all corners strictly inside the unbuffered extent
    rings.flatten.foreach { case (px, py) =>
      assert(px > 0 && px < 4096 && py > 0 && py < 4096)
    }
  }

  test("points on the exact tile corner survive") {
    val out = clip(s"POINT ($lonW $latN)")
    assert(out.isDefined)
    assert(GeomUdfs.toMvtRings(out.get)._2.flatten.head == ((0, 0)))
  }

  test("linestring crossing the tile is cut at the buffered boundary") {
    val out = clip(s"LINESTRING (${lonW - dLon} ${latS + 0.5 * dLat}, ${lonE + dLon} ${latS + 0.5 * dLat})")
    assert(out.isDefined)
    val (gt, rings) = GeomUdfs.toMvtRings(out.get)
    assert(gt == 2)
    val xs = rings.flatten.map(_._1)
    assert(xs.min == -64 && xs.max == 4096 + 64)
  }
}
