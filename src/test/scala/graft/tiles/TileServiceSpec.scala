package graft.tiles

import org.apache.spark.sql.functions._
import graft.{SparkSpec, TestFixtures}
import graft.core.WebMercator

class TileServiceSpec extends SparkSpec {

  import TileService._

  private lazy val feats = TestFixtures.features(spark, Sf).cache()
  private val (ax, ay) = (TestFixtures.ax, TestFixtures.ay)

  test("z=13 anchor tile returns the edge-case features, clipped into buffered bounds") {
    val df = tileDf(feats, 13, ax, ay)
    val rows = df.collect()
    val uids = rows.map(_.getAs[String]("uid")).toSet
    // cell-covering polygon (1000001), 3-cell linestring (1000002) and
    // NW-corner point (1000003) all intersect; the sub-pixel polygon
    // (1000004) legitimately collapses to empty under integer pixel
    // snapping at this zoom (asserted separately at z=17)
    assert(Set("uid-1000001", "uid-1000002", "uid-1000003").subsetOf(uids),
      s"missing expected features; got $uids")
    // D1 recall fix: the boundary-straddling polygon's centroid hash is the
    // NEIGHBOR cell, yet it must appear in this tile (the reference drops it)
    assert(uids.contains("uid-1000000"), "D1 case missed: neighbor-cell-hash feature")
    // every clipped geometry stays inside the buffered tile square
    rows.foreach { r =>
      val (_, rings) = GeomUdfs.toMvtRings(r.getAs[String]("tgeom"))
      rings.flatten.foreach { case (x, y) =>
        assert(x >= -64 && x <= 4096 + 64 && y >= -64 && y <= 4096 + 64,
          s"coord ($x,$y) outside buffered extent for ${r.getAs[String]("uid")}")
      }
    }
  }

  test("attribute filter restricts the tile to the filtered class") {
    val all = tileDf(feats, 13, ax, ay).count()
    val water = tileDf(feats, 13, ax, ay, filter = Some("class" -> "water"))
    assert(water.collect().forall(_.getAs[String]("class") == "water"))
    assert(water.count() < all)
  }

  test("z=9 ancestor tile contains at least the z=13 features") {
    val n13 = tileDf(feats, 13, ax, ay).count()
    val n9 = tileDf(feats, 9, ax >> 4, ay >> 4).count()
    assert(n9 >= n13, s"ancestor tile ($n9) lost features vs child ($n13)")
  }

  test("z=15 descendant tile (z > hashLevel) still reads through the parent cell") {
    // the full-cell polygon covers every z=15 descendant of the anchor cell
    val rows = tileDf(feats, 15, ax << 2, ay << 2).collect()
    assert(rows.map(_.getAs[String]("uid")).contains("uid-1000001"))
  }

  test("sub-pixel polygon collapses at z=13 but renders at z=17") {
    val uids13 = tileDf(feats, 13, ax, ay).collect().map(_.getAs[String]("uid"))
    assert(!uids13.contains("uid-1000004"))
    val cLon = TestFixtures.lonW + 0.5 * TestFixtures.dLon + TestFixtures.dLon / 16384
    val cLat = TestFixtures.latS + 0.5 * TestFixtures.dLat + TestFixtures.dLat / 16384
    val (tx17, ty17) = (WebMercator.tileX(cLon, 17), WebMercator.tileY(cLat, 17))
    val uids17 = tileDf(feats, 17, tx17, ty17).collect().map(_.getAs[String]("uid"))
    assert(uids17.contains("uid-1000004"), s"sub-pixel polygon missing at z17: ${uids17.toSeq}")
  }

  test("tile() produces a decodable MVT with the configured layer and attrs") {
    val bytes = tile(feats, 13, ax, ay)
    val layers = Mvt.decode(bytes)
    assert(layers.map(_.name) == Seq("io.marauder.tank"))
    val fs = layers.head.features
    assert(fs.nonEmpty)
    assert(fs.forall(f => f.props.contains("class") && f.props.contains("value")))
    assert(fs.forall(f => Set(1, 2, 3).contains(f.geomType)))
  }

  test("panel(): the one-job batch read equals per-tile reads, empty tiles included") {
    // 3×3 neighborhood around the anchor: exercises features clipping into
    // MULTIPLE panel tiles (the straddling polygon, the 3-cell linestring)
    // and at least one empty member
    val tiles = for { dx <- -1 to 1; dy <- -1 to 1 } yield (ax + dx, ay + dy)
    val got = panel(feats, 13, tiles)
    assert(got.keySet == tiles.toSet)
    tiles.foreach { case (x, y) =>
      val single = tile(feats, 13, x, y)
      assert(GoldenTiles.canonical(got((x, y))) == GoldenTiles.canonical(single),
        s"panel tile ($x,$y) diverges from the single-tile read")
    }
    // the filtered form matches too (panel is cacheable-unfiltered in the
    // server, but the service-level contract covers filters)
    val fTiles = Seq((ax, ay))
    val fGot = panel(feats, 13, fTiles, filter = Some("class" -> "water"))
    assert(GoldenTiles.canonical(fGot((ax, ay))) ==
      GoldenTiles.canonical(tile(feats, 13, ax, ay, Some("class" -> "water"))))
    // a far-away empty tile still answers with the single read's empty layer
    val farT = (ax + 100, ay + 100)
    val far = panel(feats, 13, Seq(farT))
    assert(java.util.Arrays.equals(far(farT), tile(feats, 13, farT._1, farT._2)),
      "empty panel tile diverges from the single-tile empty answer")
  }

  test("heatmap counts equal the per-cell centroid counts, one groupBy") {
    val z = 6
    // densest z=6 tile by customer-point centroid
    val withTile = TestFixtures.features(spark, Sf)
      .withColumn("_cxy", GeomUdfs.centroidXY(col("geometry")))
      .withColumn("tx", floor(col("_cxy")(0) * (1 << z)).cast("int"))
      .withColumn("ty", floor(col("_cxy")(1) * (1 << z)).cast("int"))
    val top = withTile.groupBy("tx", "ty").count()
      .orderBy(col("count").desc, col("tx"), col("ty")).first()
    val (tx, ty, expected) = (top.getInt(0), top.getInt(1), top.getLong(2))
    val cells = heatmapDf(feats, z, tx, ty).collect()
    assert(cells.map(_.getAs[Long]("n")).sum == expected,
      s"heatmap total != features in tile")
    val n = gridN(z)
    assert(cells.forall { r =>
      val i = r.getAs[Int]("cell_i"); val j = r.getAs[Int]("cell_j")
      i >= 0 && i < n && j >= 0 && j < n
    })
    // MVT form carries count attrs on polygon cells
    val mvt = Mvt.decode(heatmap(feats, z, tx, ty)).head
    assert(mvt.features.nonEmpty && mvt.features.forall(f =>
      f.geomType == 3 && f.props.get("count").exists(_.asInstanceOf[Long] > 0)))
  }

  test("hash predicate prunes: anchor tile scan reads far fewer rows than the table") {
    val total = feats.count()
    val scanned = feats.filter(hashPredicate(13, ax, ay, TileConfig())).count()
    assert(scanned < total / 10, s"no pruning: $scanned of $total rows")
  }
}
