package graft.tiles

import org.apache.spark.sql.SparkSession
import graft.TestFixtures

/** FIXTURES.md §B3 golden-tile machinery: fixed tiles over the deterministic
  * B2 features, decoded to a canonical JSON text (commands + sorted props,
  * features sorted) — stable across encoder-internal byte-layout choices.
  * Goldens live in src/test/resources/golden/; regenerate with
  *   sbt "Test/runMain graft.tiles.GoldenTiles"
  * after an INTENTIONAL change and review the diff.
  */
object GoldenTiles {

  /** The fixed tile requests: (name, kind, z, x, y). */
  def cases: Seq[(String, String, Int, Int, Int)] = {
    val (ax, ay) = (TestFixtures.ax, TestFixtures.ay)
    Seq(
      ("tile_z13_anchor", "tile", 13, ax, ay),
      ("tile_z9_ancestor", "tile", 9, ax >> 4, ay >> 4),
      ("tile_z15_descendant", "tile", 15, ax << 2, ay << 2),
      // z > hashLevel tile on the anchor cell's EAST edge: the straddling
      // roads polygon overlaps this tile but its centroid HASH lives in
      // the NEIGHBOR cell (ax+1) — a single-cell z>hashLevel scan (the
      // reference's D1 bug) would miss it, so this golden locks in the
      // coverWithBuffer cross-cell recall fix (the other tile goldens all
      // sit on cell-aligned extents); GoldenTilesSpec additionally
      // asserts the feature is PRESENT, so a regenerated golden cannot
      // silently bake the regression in
      ("tile_z15_cell_edge", "tile", 15, (ax << 2) + 3, (ay << 2) + 1),
      ("heatmap_z9", "heatmap", 9, ax >> 4, ay >> 4))
  }

  def render(spark: SparkSession, kind: String, z: Int, x: Int, y: Int): String = {
    val feats = TestFixtures.features(spark, "/root/testdata/sf0.001")
    val bytes = kind match {
      case "tile" => TileService.tile(feats, z, x, y)
      case _ => TileService.heatmap(feats, z, x, y)
    }
    canonical(bytes)
  }

  /** Decoded, canonicalized text form of an MVT. */
  def canonical(bytes: Array[Byte]): String = {
    val layers = Mvt.decode(bytes)
    layers.map { l =>
      val feats = l.features.map { f =>
        val props = f.props.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k":${v match {
            case s: String => "\"" + s + "\""
            case other => String.valueOf(other)
          }}""" }.mkString("{", ",", "}")
        s"""{"type":${f.geomType},"commands":[${f.commands.mkString(",")}],"props":$props}"""
      }.sorted
      s"""{"layer":"${l.name}","extent":${l.extent},"features":[\n  ${feats.mkString(",\n  ")}\n]}"""
    }.mkString("\n")
  }

  private val GoldenDir = "src/test/resources/golden"

  def goldenPath(name: String) = java.nio.file.Paths.get(s"$GoldenDir/$name.json")

  /** Regenerate all goldens (review the diff before committing!). */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(GoldenDir))
    cases.foreach { case (name, kind, z, x, y) =>
      val text = render(spark, kind, z, x, y)
      java.nio.file.Files.writeString(goldenPath(name), text)
      println(s"[golden] wrote $name (${text.length} chars)")
    }
    spark.stop()
  }
}
