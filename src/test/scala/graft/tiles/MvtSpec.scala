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
    // counter-clockwise input (screen coords) must be reversed by the encoder
    val ccwOnScreen = Seq((0, 0), (10, 0), (10, 10), (0, 10), (0, 0))
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
    // shoelace in screen coords (y down): clockwise => positive
    val ring = coords.toSeq :+ coords.head
    val area = -ring.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
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
  }
}
