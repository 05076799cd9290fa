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
}
