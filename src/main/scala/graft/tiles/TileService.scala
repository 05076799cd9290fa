package graft.tiles

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.core.ZRange

/** The reference's two read products — vector tiles and count heatmaps — as
  * single pruned-scan DataFrame plans plus a driver-side MVT encode of the
  * (small-by-construction) per-tile result.
  *
  * Reference dataflow being reproduced (SURVEY.md §2.2/§2.3):
  *  - tile: Z-range prune → scan(+attr filter) → project/clip/transform → MVT
  *    (`application.kt:350-474`), but as ONE Spark scan with the hash-range
  *    and attribute predicates pushed into the parquet reader, instead of one
  *    CQL round-trip per hash cell (application.kt:403-418).
  *  - heatmap: n×n grid count (`application.kt:522-615`) as ONE groupBy over
  *    the pruned scan, instead of up to n²·|hashes| point COUNT queries
  *    (application.kt:595-599). Cells are assigned by feature-centroid
  *    position (exact), not by hash-cell membership — documented deviation
  *    D5: more accurate, same output shape.
  *
  * At 100 TB the feature table is laid out hash-sorted (bucketed/Z-ordered),
  * so the BETWEEN predicates prune to a handful of files/row-groups; each
  * tile read touches O(tile) data no matter the table size.
  */
object TileService {

  /** Tank's tiling config surface (application.conf `tyler` section). */
  final case class TileConfig(
      hashLevel: Int = 13,
      extent: Int = 4096,
      buffer: Int = 64,
      baseLayer: String = "io.marauder.tank",
      mainAttr: String = "class",
      attributes: Seq[String] = Seq("class", "value"))

  /** Hash-range predicate covering tile (z,x,y) + clip buffer (fixes the
    * reference's z>hashLevel centroid-cell recall bug — deviation D1).
    * The halo is the FULL buffer/extent fraction — the clip envelope's own
    * reach — so a feature whose centroid sits anywhere in the clip-buffer
    * zone is in the query and can render into the tile's buffer (a halved
    * halo silently dropped edge features from the outer half of the zone).
    */
  def hashPredicate(z: Int, x: Int, y: Int, cfg: TileConfig): Column = {
    val bufFrac = cfg.buffer.toDouble / cfg.extent.toDouble
    balancedOr(ZRange.coverWithBuffer(z, x, y, cfg.hashLevel, bufFrac)
      .map { case (lo, hi) => col("hash").between(lo, hi) })
  }

  /** OR with a log-depth tree — a left-deep reduce over many ranges
    * overflows Catalyst's column-conversion recursion. An empty cover (an
    * out-of-range tile yields no Morton ranges) is simply an empty result,
    * never a recursion.
    */
  private def balancedOr(cs: Seq[Column]): Column =
    if (cs.isEmpty) lit(false)
    else if (cs.size == 1) cs.head
    else {
      val (l, r) = cs.splitAt(cs.size / 2)
      balancedOr(l) || balancedOr(r)
    }

  /** The distributed tile query: pruned scan → attr filter → clip+transform.
    * Output: uid, <attributes...>, tgeom (WKT in integer tile coords).
    */
  def tileDf(features: DataFrame, z: Int, x: Int, y: Int,
             filter: Option[(String, Any)] = None,
             cfg: TileConfig = TileConfig()): DataFrame = {
    val pruned = features.filter(hashPredicate(z, x, y, cfg))
    val filtered = filter match {
      case Some((attr, v)) => pruned.filter(col(attr) === lit(v))
      case None => pruned
    }
    val clip = GeomUdfs.clipToTileUdf(z, x, y, cfg.extent, cfg.buffer)
    filtered
      .select((col("uid") +: cfg.attributes.map(col)) :+
        clip(col("geometry")).as("tgeom"): _*)
      .filter(col("tgeom").isNotNull)
  }

  /** Full tile read: scan + clip distributed, MVT encode on the driver
    * (per-tile results are bounded by the Z-range prune).
    */
  def tile(features: DataFrame, z: Int, x: Int, y: Int,
           filter: Option[(String, Any)] = None,
           cfg: TileConfig = TileConfig()): Array[Byte] = {
    val rows = tileDf(features, z, x, y, filter, cfg).collect()
    val feats = rows.toSeq.map { r =>
      val (gt, rings, roles) = GeomUdfs.toMvtRingsRoles(r.getAs[String]("tgeom"))
      val props = cfg.attributes.flatMap { a =>
        Option(r.getAs[Any](a)).map(a -> _)
      }
      Mvt.Feature(None, gt, rings, props, exteriors = Some(roles))
    }
    Mvt.encode(feats, cfg.baseLayer, cfg.extent)
  }

  /** BATCH panel read — N tiles at one zoom from ONE Spark job (the
    * cold-panel fix: ServingLatencyProbe measured one job per cold tile
    * at ~490 ms p50, so a 64-tile viewer panel paid 64 sequential jobs
    * where a single pruned scan covering the panel's merged Z-ranges
    * serves them all). Pipeline: merged-range pruned scan → per-feature
    * candidate-tile fan-out (buffered envelope vs the requested tile set —
    * a feature clips into EVERY tile whose clip-buffer halo its envelope
    * reaches, exactly [[tileDf]]'s membership) → per-(feature, tile) clip
    * → driver-side group + MVT encode (driver rows are panel-bounded: the
    * same rows the N single-tile reads would each collect). Returns bytes
    * for EVERY requested tile — an empty tile encodes the empty layer,
    * byte-identical to [[tile]]'s answer for it.
    */
  def panel(features: DataFrame, z: Int, tiles: Seq[(Int, Int)],
            filter: Option[(String, Any)] = None,
            cfg: TileConfig = TileConfig()): Map[(Int, Int), Array[Byte]] = {
    if (tiles.isEmpty) return Map.empty
    val bufFrac = cfg.buffer.toDouble / cfg.extent.toDouble
    val ranges = mergeRanges(tiles.flatMap { case (x, y) =>
      ZRange.coverWithBuffer(z, x, y, cfg.hashLevel, bufFrac)
    })
    val pruned = features.filter(balancedOr(
      ranges.map { case (lo, hi) => col("hash").between(lo, hi) }))
    val filtered = filter match {
      case Some((attr, v)) => pruned.filter(col(attr) === lit(v))
      case None => pruned
    }
    // candidate tiles of a feature: envelope (in tile units at z, expanded
    // by the clip-buffer halo) ∩ the requested set; packed (x << 32 | y)
    val tileSet = tiles.toSet
    val zz = z; val bf = bufFrac
    val candU = udf((wkt: String) => {
      val env = GeomUdfs.parse(wkt).getEnvelopeInternal
      val scale = (1L << zz).toDouble
      val x0 = math.floor(graft.core.WebMercator.projX(env.getMinX) * scale - bf).toInt
      val x1 = math.floor(graft.core.WebMercator.projX(env.getMaxX) * scale + bf).toInt
      val y0 = math.floor(graft.core.WebMercator.projY(env.getMaxY) * scale - bf).toInt
      val y1 = math.floor(graft.core.WebMercator.projY(env.getMinY) * scale + bf).toInt
      (for {
        x <- x0 to x1; y <- y0 to y1; if tileSet((x, y))
      } yield (x.toLong << 32) | (y & 0xffffffffL)).toArray
    })
    val zc = z; val ext = cfg.extent; val buf = cfg.buffer
    val clipU = udf((wkt: String, t: Long) =>
      GeomUdfs.clipToTile(wkt, zc, (t >> 32).toInt, t.toInt, ext, buf))
    val rows = filtered
      .select((col("uid") +: cfg.attributes.map(col)) :+ col("geometry") :+
        explode(candU(col("geometry"))).as("_t"): _*)
      .withColumn("tgeom", clipU(col("geometry"), col("_t")))
      .filter(col("tgeom").isNotNull)
      .drop("geometry")
      .collect()
    val byTile = rows.groupBy { r =>
      val t = r.getAs[Long]("_t"); ((t >> 32).toInt, t.toInt)
    }
    tiles.map { case (x, y) =>
      val feats = byTile.getOrElse((x, y), Array.empty[Row]).toSeq.map { r =>
        val (gt, rings, roles) = GeomUdfs.toMvtRingsRoles(r.getAs[String]("tgeom"))
        val props = cfg.attributes.flatMap { a =>
          Option(r.getAs[Any](a)).map(a -> _)
        }
        Mvt.Feature(None, gt, rings, props, exteriors = Some(roles))
      }
      (x, y) -> Mvt.encode(feats, cfg.baseLayer, cfg.extent)
    }.toMap
  }

  /** Sorted, overlap-merged hash ranges — the panel predicate stays
    * O(perimeter) sized even when adjacent tiles' covers abut or overlap
    * (their buffered halos always do).
    */
  private def mergeRanges(rs: Seq[(Int, Int)]): Seq[(Int, Int)] =
    rs.sorted.foldLeft(List.empty[(Int, Int)]) {
      case ((plo, phi) :: t, (lo, hi)) if lo <= phi + 1 =>
        (plo, math.max(phi, hi)) :: t
      case (acc, r) => r :: acc
    }.reverse

  /** Heatmap grid size: 24 for z in 1..9 else 16 (application.kt:549-553). */
  def gridN(z: Int): Int = if (z >= 1 && z <= 9) 24 else 16

  /** The distributed heatmap query: pruned scan → centroid cell → count.
    * Output: (cell_i, cell_j, n) for non-empty cells, 0 <= i,j < gridN(z).
    */
  def heatmapDf(features: DataFrame, z: Int, x: Int, y: Int,
                cfg: TileConfig = TileConfig()): DataFrame = {
    val n = gridN(z)
    val scale = (1L << z).toDouble
    val cxy = GeomUdfs.centroidXY(col("geometry"))
    features.filter(hashPredicate(z, x, y, cfg))
      .withColumn("_cxy", cxy)
      .withColumn("cell_i", floor((col("_cxy")(0) * scale - x) * n).cast("int"))
      .withColumn("cell_j", floor((col("_cxy")(1) * scale - y) * n).cast("int"))
      .filter(col("cell_i") >= 0 && col("cell_i") < n &&
        col("cell_j") >= 0 && col("cell_j") < n)
      .groupBy("cell_i", "cell_j")
      .agg(count(lit(1)).as("n"))
  }

  /** Heatmap as an MVT of cell polygons carrying a `count` attribute
    * (A9's output shape, application.kt:601-610).
    */
  def heatmap(features: DataFrame, z: Int, x: Int, y: Int,
              cfg: TileConfig = TileConfig()): Array[Byte] = {
    val n = gridN(z)
    val cellPx = cfg.extent.toDouble / n
    val rows = heatmapDf(features, z, x, y, cfg).collect()
    val feats = rows.toSeq.map { r =>
      val i = r.getAs[Int]("cell_i"); val j = r.getAs[Int]("cell_j")
      val (x0, y0) = ((i * cellPx).round.toInt, (j * cellPx).round.toInt)
      val (x1, y1) = (((i + 1) * cellPx).round.toInt, ((j + 1) * cellPx).round.toInt)
      val ring = Seq((x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0))
      Mvt.Feature(None, 3, Seq(ring), Seq("count" -> r.getAs[Long]("n")))
    }
    Mvt.encode(feats, cfg.baseLayer, cfg.extent)
  }
}
