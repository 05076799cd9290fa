package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure geo core, with a seeded generator loop (the
  * scalatest/scalacheck bridge artifact is not in the offline cache, so
  * properties are driven by a deterministic RNG directly).
  */
class CoreGeoSpec extends AnyFunSuite {

  private def forSeeded(n: Int)(body: scala.util.Random => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (1 to n).foreach(_ => body(rnd))
  }

  // ------------------------------------------------------------- ZCurve

  test("interleave/deinterleave roundtrip (property)") {
    forSeeded(500) { r =>
      val x = r.nextInt(1 << 16); val y = r.nextInt(1 << 16)
      assert(ZCurve.deinterleave(ZCurve.interleave(x, y)) == ((x, y)))
    }
  }

  test("spread/compact roundtrip (property)") {
    forSeeded(500) { r =>
      val n = r.nextInt(1 << 16)
      assert(ZCurve.compact(ZCurve.spread(n)) == n)
    }
  }

  test("morton order is contiguous on quad-aligned squares") {
    forSeeded(200) { r =>
      val z = r.nextInt(13)
      val d = 13 - z
      val qx = r.nextInt(1 << z max 1)
      val qy = r.nextInt(1 << z max 1)
      val (lo, hi) = ZRange.rangeOf(z, qx, qy, 13)
      assert(hi - lo == (1 << (2 * d)) - 1,
        s"quad ($z,$qx,$qy) not a contiguous Morton block")
    }
  }

  // ------------------------------------------------------------- ZRange

  test("rangeOf matches brute-force min/max over the quad's cells") {
    val z = 10; val x = 311; val y = 399; val hl = 13
    val d = hl - z
    val hashes = for {
      cx <- (x << d) until ((x + 1) << d)
      cy <- (y << d) until ((y + 1) << d)
    } yield ZCurve.interleave(cx, cy)
    val (lo, hi) = ZRange.rangeOf(z, x, y, hl)
    assert(lo == hashes.min && hi == hashes.max)
    assert(hashes.toSet.size == hashes.size && hashes.forall(h => h >= lo && h <= hi))
  }

  test("decompose covers exactly the rectangle (no misses, no extras)") {
    val hl = 6 // small grid so brute force is cheap
    val max = (1 << hl) - 1
    forSeeded(100) { r =>
      val x0 = r.nextInt(51); val y0 = r.nextInt(51)
      val x1 = math.min(max, x0 + r.nextInt(21))
      val y1 = math.min(max, y0 + r.nextInt(21))
      val expect = (for { cx <- x0 to x1; cy <- y0 to y1 }
        yield ZCurve.interleave(cx, cy)).toSet
      val ranges = ZRange.decompose(x0, x1, y0, y1, hl)
      val covered = ranges.flatMap { case (lo, hi) => lo to hi }.toSet
      assert(covered == expect, s"rect ($x0,$y0)-($x1,$y1)")
      // disjoint + ascending
      ranges.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1)
        case _ =>
      }
    }
  }

  test("capped decompose over-approximates but never misses") {
    val hl = 10
    val exact = ZRange.decompose(100, 200, 300, 400, hl)
    val capped = ZRange.decompose(100, 200, 300, 400, hl, maxLevel = 7)
    val cov = capped.flatMap { case (lo, hi) => lo.toLong to hi.toLong }.toSet
    val exactCov = exact.flatMap { case (lo, hi) => lo.toLong to hi.toLong }.toSet
    assert(exactCov.subsetOf(cov))
    assert(capped.size < exact.size)
  }

  test("coverWithBuffer(z<=hl, no buffer) equals rangeOf") {
    assert(ZRange.coverWithBuffer(9, 100, 200, 13, 0.0) ==
      Seq(ZRange.rangeOf(9, 100, 200, 13)))
  }

  // --------------------------------------------------------- WebMercator

  test("tile indices bounded and consistent with tile edges (property)") {
    forSeeded(300) { r =>
      val lon = r.nextDouble() * 359.8 - 179.9
      val lat = r.nextDouble() * 169.8 - 84.9
      val z = 1 + r.nextInt(15)
      val x = WebMercator.tileX(lon, z)
      val y = WebMercator.tileY(lat, z)
      assert(x >= 0 && x < (1 << z) && y >= 0 && y < (1 << z))
      assert(WebMercator.tileLon(x, z) <= lon && lon <= WebMercator.tileLon(x + 1, z))
      assert(WebMercator.tileLat(y + 1, z) <= lat && lat <= WebMercator.tileLat(y, z))
    }
  }

  test("projX/projY land in [0,1) and agree with tile math") {
    forSeeded(300) { r =>
      val lon = r.nextDouble() * 359.8 - 179.9
      val lat = r.nextDouble() * 169.8 - 84.9
      val px = WebMercator.projX(lon); val py = WebMercator.projY(lat)
      assert(px >= 0.0 && px < 1.0 && py > 0.0 && py < 1.0)
      val z = 13
      assert(math.floor(px * (1 << z)).toInt == WebMercator.tileX(lon, z))
      assert(math.floor(py * (1 << z)).toInt == WebMercator.tileY(lat, z))
    }
  }

  test("haversine: Berlin-Paris ~878 km, symmetric, zero on identity") {
    val d = WebMercator.haversineKm(52.52, 13.405, 48.8566, 2.3522)
    assert(math.abs(d - 878) < 5, s"got $d")
    assert(WebMercator.haversineKm(10, 20, 10, 20) == 0.0)
    assert(math.abs(d - WebMercator.haversineKm(48.8566, 2.3522, 52.52, 13.405)) < 1e-9)
  }

  // ------------------------------------------------------------- GeoHash

  test("geohash encode/decode: decoded center stays in the cell (property)") {
    forSeeded(300) { r =>
      val lat = r.nextDouble() * 179.8 - 89.9
      val lon = r.nextDouble() * 359.8 - 179.9
      val h = GeoHash.encode(lat, lon, 9)
      val (latLo, latHi, lonLo, lonHi) = GeoHash.bounds(h)
      assert(lat >= latLo && lat <= latHi && lon >= lonLo && lon <= lonHi)
      val (clat, clon) = GeoHash.decode(h)
      assert(clat >= latLo && clat <= latHi && clon >= lonLo && clon <= lonHi)
    }
  }

  test("geohash known vector: (57.64911, 10.40744) -> u4pruydqqvj") {
    assert(GeoHash.encode(57.64911, 10.40744, 11) == "u4pruydqqvj")
  }

  test("longer geohash prefixes nest") {
    forSeeded(200) { r =>
      val lat = r.nextDouble() * 178.0 - 89.0
      val lon = r.nextDouble() * 358.0 - 179.0
      val h8 = GeoHash.encode(lat, lon, 8)
      assert(GeoHash.encode(lat, lon, 5) == h8.take(5))
    }
  }
}
