package graft.tiles

import org.scalatest.funsuite.AnyFunSuite

class MvtSpec extends AnyFunSuite {

  test("zigzag roundtrip") {
    for (v <- Seq(0, 1, -1, 5, -5, 4095, -4096, Int.MaxValue, Int.MinValue + 1))
      assert(Mvt.unzigzag(Mvt.zigzag(v)) == v)
  }

  test("point feature encodes and decodes with properties intact") {
    val f = Mvt.Feature(Some(7L), 1, Seq(Seq((100, 200))),
      Seq("class" -> "poi", "value" -> 4.5, "n" -> 3L))
    val bytes = Mvt.encode(Seq(f), "io.marauder.tank")
    val layers = Mvt.decode(bytes)
    assert(layers.map(_.name) == Seq("io.marauder.tank"))
    assert(layers.head.extent == 4096)
    val df = layers.head.features.head
    assert(df.id.contains(7L))
    assert(df.geomType == 1)
    // MoveTo(1) then zigzag(100), zigzag(200)
    assert(df.commands == Seq((1L << 3) | 1, Mvt.zigzag(100), Mvt.zigzag(200)))
    assert(df.props == Map("class" -> "poi", "value" -> 4.5, "n" -> 3L))
  }

  test("linestring commands are MoveTo + LineTo with relative deltas") {
    val f = Mvt.Feature(None, 2, Seq(Seq((2, 2), (2, 10), (10, 10))), Nil)
    val d = Mvt.decode(Mvt.encode(Seq(f), "l")).head.features.head
    assert(d.commands == Seq(
      (1L << 3) | 1, Mvt.zigzag(2), Mvt.zigzag(2),
      (2L << 3) | 2, Mvt.zigzag(0), Mvt.zigzag(8), Mvt.zigzag(8), Mvt.zigzag(0)))
  }

  test("polygon exterior ring is emitted clockwise in screen coords and closed") {
    // counter-clockwise input (negative surveyor area in y-down tile
    // coords) must be reversed by the encoder to the spec's CW exterior
    val ccwOnScreen = Seq((0, 0), (0, 10), (10, 10), (10, 0), (0, 0))
    val f = Mvt.Feature(None, 3, Seq(ccwOnScreen), Nil)
    val d = Mvt.decode(Mvt.encode(Seq(f), "p")).head.features.head
    assert(d.commands.last == 7L) // ClosePath
    // walk the commands back into absolute coords
    val coords = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var i = 0; var cx = 0; var cy = 0
    while (i < d.commands.length) {
      val cmd = d.commands(i); val id = (cmd & 7).toInt; val cnt = (cmd >> 3).toInt
      i += 1
      if (id == 1 || id == 2) {
        for (_ <- 0 until cnt) {
          cx += Mvt.unzigzag(d.commands(i)); cy += Mvt.unzigzag(d.commands(i + 1))
          coords += ((cx, cy)); i += 2
        }
      }
    }
    // MVT 2.1 §4.3.3.3 surveyor's formula over tile coords directly:
    // positive = clockwise on screen = exterior
    val ring = coords.toSeq :+ coords.head
    val area = ring.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
      x1.toLong * y2 - x2.toLong * y1
    }.sum
    assert(area > 0, s"exterior ring not clockwise on screen (area=$area)")
  }

  test("keys/values are deduplicated across features") {
    val fs = (1 to 4).map(i =>
      Mvt.Feature(None, 1, Seq(Seq((i, i))), Seq("class" -> "poi")))
    val bytes = Mvt.encode(fs, "t")
    val decoded = Mvt.decode(bytes).head
    assert(decoded.features.forall(_.props == Map("class" -> "poi")))
    // a dedup'd dictionary encodes "class"+"poi" once; 4 copies would add ~30B
    assert(bytes.length < 80, s"dictionary not deduplicated: ${bytes.length}B")
  }

  test("multi-ring polygon keeps hole orientation opposite to shell") {
    val shell = Seq((0, 0), (20, 0), (20, 20), (0, 20), (0, 0))
    val hole = Seq((5, 5), (10, 5), (10, 10), (5, 10), (5, 5))
    val f = Mvt.Feature(None, 3, Seq(shell, hole), Nil)
    val d = Mvt.decode(Mvt.encode(Seq(f), "p")).head.features.head
    assert(d.commands.count(_ == 7L) == 2) // two ClosePath commands
    assert(ringScreenAreas(d.commands).map(_ > 0) == Seq(true, false))
  }

  /** Walk a polygon command stream; screen-space signed area per ring
    * (positive = clockwise on screen = MVT exterior).
    */
  private def ringScreenAreas(cmds: Seq[Long]): Seq[Long] = {
    val areas = scala.collection.mutable.ArrayBuffer[Long]()
    val ring = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var i = 0; var cx = 0; var cy = 0
    while (i < cmds.length) {
      val cmd = cmds(i); val id = (cmd & 7).toInt; val cnt = (cmd >> 3).toInt
      i += 1
      if (id == 1 || id == 2) {
        for (_ <- 0 until cnt) {
          cx += Mvt.unzigzag(cmds(i)); cy += Mvt.unzigzag(cmds(i + 1))
          ring += ((cx, cy)); i += 2
        }
      } else if (id == 7) {
        val closed = ring.toSeq :+ ring.head
        // spec formula over tile coords directly: positive = CW = exterior
        areas += closed.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
          x1.toLong * y2 - x2.toLong * y1
        }.sum
        ring.clear()
      }
    }
    areas.toSeq
  }

  test("MultiPolygon: every exterior winds clockwise, holes counter (role-carried)") {
    // polygon 1 has a hole; polygon 2 is a plain square. Flattened ring list
    // = ext1, hole1, ext2 — ext2 must still wind as an exterior.
    val wkt = "MULTIPOLYGON (((0 0, 40 0, 40 40, 0 40, 0 0), " +
      "(10 10, 20 10, 20 20, 10 20, 10 10)), " +
      "((100 100, 140 100, 140 140, 100 140, 100 100)))"
    val (gt, rings, roles) = GeomUdfs.toMvtRingsRoles(wkt)
    assert(gt == 3 && roles == Seq(true, false, true))
    val f = Mvt.Feature(None, 3, rings, Nil, exteriors = Some(roles))
    val d = Mvt.decode(Mvt.encode(Seq(f), "p")).head.features.head
    val areas = ringScreenAreas(d.commands)
    assert(areas.length == 3)
    assert(areas(0) > 0 && areas(2) > 0,
      s"exterior rings must be clockwise on screen: $areas")
    assert(areas(1) < 0, s"hole must be counter-clockwise: $areas")
  }

  test("MultiPolygon without roles would mis-wind (guards the default)") {
    // same geometry driven through the old default: ring 2 becomes a "hole"
    val rings = Seq(
      Seq((0, 0), (40, 0), (40, 40), (0, 40), (0, 0)),
      Seq((100, 100), (140, 100), (140, 140), (100, 140), (100, 100)))
    val withRoles = Mvt.Feature(None, 3, rings, Nil, exteriors = Some(Seq(true, true)))
    val d = Mvt.decode(Mvt.encode(Seq(withRoles), "p")).head.features.head
    assert(ringScreenAreas(d.commands).forall(_ > 0))
  }
}
