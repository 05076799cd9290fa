package graft.tiles

import graft.SparkSpec

/** Golden-file regression gate for the full tile pipeline (B2 fixture →
  * prune → clip → transform → MVT encode → decode → canonical text).
  */
class GoldenTilesSpec extends SparkSpec {

  GoldenTiles.cases.foreach { case (name, kind, z, x, y) =>
    test(s"golden: $name") {
      val path = GoldenTiles.goldenPath(name)
      assert(java.nio.file.Files.exists(path),
        s"golden missing — run: sbt 'Test/runMain graft.tiles.GoldenTiles'")
      val want = java.nio.file.Files.readString(path)
      val got = GoldenTiles.render(spark, kind, z, x, y)
      assert(got == want,
        s"$name drifted from golden; if intentional regenerate and review")
    }
  }

  test("z>hashLevel edge tile RECALLS the neighbor-cell straddler (D1 semantic gate)") {
    // the golden above pins bytes; this pins the SEMANTICS those bytes
    // must carry, so `GoldenTiles.main` cannot silently regenerate the D1
    // regression into the golden: the straddling roads polygon (value 1.0,
    // hash in cell ax+1) must appear in the east-edge z=15 tile of cell ax
    val (ax, ay) = (graft.TestFixtures.ax, graft.TestFixtures.ay)
    val got = GoldenTiles.render(spark, "tile", 15, (ax << 2) + 3, (ay << 2) + 1)
    assert(got.contains("\"class\":\"roads\",\"value\":1.0"),
      s"neighbor-cell straddler missing from the edge tile (D1 regression):\n$got")
  }
}
