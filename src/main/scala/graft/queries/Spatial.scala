package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{WebMercator, ZRange}
import graft.functions.GeoColumns

/** SURVEY.md §2.6 Q26–Q30: the reference's geospatial capabilities as
  * declarative Spark queries — slippy tile math, Morton hashing, Z-range
  * pruning (the reference's partition-pruning strategy,
  * application.kt:371–400), bbox heatmap (application.kt:522–615) and
  * haversine KNN.
  *
  * Points are derived arithmetically from `customer` (FIXTURES.md §B1) so the
  * DuckDB oracle can rebuild them in pure SQL. All expressions are Spark
  * built-ins (codegen, no UDFs).
  */
object Spatial {

  val HashLevel = 13

  def defs: Seq[QueryDef] =
    Seq(q26, q27, q28, q29, q30, x46_tile, x47_heatmap, x57_spatial_join,
      x58_bbox_agg, x91_st_bbox)

  /** Spark-side synthetic points (B1). */
  def points(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey").as("id"),
      ((col("c_custkey") * 37 % 36000) / 100.0 - 180.0).as("lon"),
      ((col("c_custkey") * 53 % 17000) / 100.0 - 85.0).as("lat"))

  /** Oracle-side twin of [[points]]. */
  private val PointsSql =
    """SELECT c_custkey AS id,
      |  ((c_custkey * 37) % 36000) / 100.0 - 180.0 AS lon,
      |  ((c_custkey * 53) % 17000) / 100.0 - 85.0 AS lat
      |FROM customer""".stripMargin

  private def tileXSql(lon: String, z: Int): String =
    s"CAST(FLOOR((($lon) + 180.0) / 360.0 * ${(1L << z).toDouble}) AS BIGINT)"
  private def tileYSql(lat: String, z: Int): String =
    s"CAST(FLOOR((1.0 - LN(TAN(RADIANS($lat)) + 1.0/COS(RADIANS($lat))) / PI()) / 2.0 * ${(1L << z).toDouble}) AS BIGINT)"

  // ---------------------------------------------------------------- Q26
  /** Slippy tile (x, y) at zoom 13 for every point. */
  val q26: QueryDef = QueryDef(
    "q26_tiles",
    Sql.canon(
      s"""SELECT id, lon, lat,
         |  ${tileXSql("lon", HashLevel)} AS tx,
         |  ${tileYSql("lat", HashLevel)} AS ty
         |FROM ($PointsSql)""".stripMargin,
      Seq("id", "lon", "lat", "tx", "ty"))) { (s, d) =>
    Canon(points(s, d)
      .withColumn("tx", GeoColumns.tileX(col("lon"), HashLevel))
      .withColumn("ty", GeoColumns.tileY(col("lat"), HashLevel)))
  }

  // ---------------------------------------------------------------- Q27
  /** Morton hash of the zoom-13 tile — the reference's partition key
    * (Tyler.kt:127–134, zCurve.kt:20–31) as a codegen'd column expression.
    */
  val q27: QueryDef = QueryDef(
    "q27_zcurve",
    Sql.canon(
      s"""SELECT id, tx, ty, ${Sql.interleave("tx", "ty", HashLevel)} AS hash
         |FROM (
         |  SELECT id,
         |    ${tileXSql("lon", HashLevel)} AS tx,
         |    ${tileYSql("lat", HashLevel)} AS ty
         |  FROM ($PointsSql))""".stripMargin,
      Seq("id", "tx", "ty", "hash"))) { (s, d) =>
    Canon(points(s, d)
      .withColumn("tx", GeoColumns.tileX(col("lon"), HashLevel))
      .withColumn("ty", GeoColumns.tileY(col("lat"), HashLevel))
      .withColumn("hash", GeoColumns.mortonHash(col("tx"), col("ty"), HashLevel))
      .select("id", "tx", "ty", "hash"))
  }

  // ---------------------------------------------------------------- Q28
  /** Z-range scan: count the points whose Morton hash falls inside the range
    * of one z=9 tile — the T2 pruning semantics (application.kt:371–400) as a
    * plain BETWEEN predicate. On a hash-sorted layout this is pure
    * file/row-group pruning.
    */
  val q28: QueryDef = {
    // the z=9 tile containing the point of c_custkey = 100
    val lon = ((100L * 37) % 36000) / 100.0 - 180.0
    val lat = ((100L * 53) % 17000) / 100.0 - 85.0
    val (tx9, ty9) = (WebMercator.tileX(lon, 9), WebMercator.tileY(lat, 9))
    val (lo, hi) = ZRange.rangeOf(9, tx9, ty9, HashLevel)
    QueryDef(
      "q28_zrange",
      Sql.canon(
        s"""SELECT COUNT(*) AS n_points, CAST(SUM(id) AS BIGINT) AS id_sum
           |FROM (
           |  SELECT id, ${Sql.interleave(tileXSql("lon", HashLevel), tileYSql("lat", HashLevel), HashLevel)} AS hash
           |  FROM ($PointsSql))
           |WHERE hash BETWEEN $lo AND $hi""".stripMargin,
        Seq("n_points", "id_sum"))) { (s, d) =>
      Canon(points(s, d)
        .withColumn("hash", GeoColumns.mortonHash(
          GeoColumns.tileX(col("lon"), HashLevel),
          GeoColumns.tileY(col("lat"), HashLevel), HashLevel))
        .filter(col("hash").between(lo, hi))
        .agg(count(lit(1)).as("n_points"), sum(col("id")).as("id_sum")))
    }
  }

  // ---------------------------------------------------------------- Q29
  /** Bbox containment + 16x16 count heatmap — the reference's
    * n-queries-per-cell heatmap (application.kt:534–599) collapsed into ONE
    * groupBy (stage H1–H4 of SURVEY §2.3).
    */
  val q29: QueryDef = QueryDef(
    "q29_heatmap",
    Sql.canon(
      """SELECT cell_x, cell_y, COUNT(*) AS n FROM (
        |  SELECT CAST(FLOOR((lon - (-90.0)) / 180.0 * 16.0) AS BIGINT) AS cell_x,
        |         CAST(FLOOR((lat - (-60.0)) / 120.0 * 16.0) AS BIGINT) AS cell_y
        |  FROM (SELECT c_custkey AS id,
        |          ((c_custkey * 37) % 36000) / 100.0 - 180.0 AS lon,
        |          ((c_custkey * 53) % 17000) / 100.0 - 85.0 AS lat
        |        FROM customer)
        |  WHERE lon >= -90.0 AND lon < 90.0 AND lat >= -60.0 AND lat < 60.0
        |) GROUP BY cell_x, cell_y""".stripMargin,
      Seq("cell_x", "cell_y", "n"))) { (s, d) =>
    Canon(points(s, d)
      .filter(col("lon") >= -90.0 && col("lon") < 90.0 &&
        col("lat") >= -60.0 && col("lat") < 60.0)
      .groupBy(
        floor((col("lon") - (-90.0)) / 180.0 * 16.0).as("cell_x"),
        floor((col("lat") - (-60.0)) / 120.0 * 16.0).as("cell_y"))
      .agg(count(lit(1)).as("n")))
  }

  /** A tank-shaped features table derived from B1 points (WKT geometry +
    * Morton hash partition key), entirely with codegen'd expressions.
    */
  def features(s: SparkSession, d: String): DataFrame =
    points(s, d).select(
      GeoColumns.mortonHash(
        GeoColumns.tileX(col("lon"), HashLevel),
        GeoColumns.tileY(col("lat"), HashLevel), HashLevel).cast("int").as("hash"),
      concat(lit("uid-"), col("id")).as("uid"),
      lit("poi").as("class"),
      col("id").cast("double").as("value"),
      concat(lit("POINT ("), col("lon"), lit(" "), col("lat"), lit(")")).as("geometry"))

  /** Materialized feature store (hash-range-partitioned, hash-sorted parquet
    * under /tmp, built once per sf dir): tile queries MUST run against a
    * stored layout — filtering on a hash derived inline would re-inline the
    * 26-term Morton expression into every range disjunct (≈15s of planning
    * per query), while the stored column makes the Z-range predicate a plain
    * pushed-down attribute filter with file-level min/max pruning. This is
    * the ingest-once/query-many architecture the 100 TB path assumes.
    */
  def featuresStored(s: SparkSession, d: String): DataFrame = {
    val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
    val dir = s"/tmp/graft_store/features_v1_$tag"
    // rebuild unless a COMPLETE store is present: Spark's _SUCCESS marker
    // only lands after the job commits, and the write goes to a temp dir
    // renamed into place — a crashed build can never be half-read
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      val tmp = dir + "_build_" + java.util.UUID.randomUUID().toString.take(8)
      features(s, d)
        .repartitionByRange(8, col("hash"))
        .sortWithinPartitions("hash")
        .write.mode("overwrite").parquet(tmp)
      deleteRecursively(new java.io.File(dir))
      if (!new java.io.File(tmp).renameTo(new java.io.File(dir)))
        throw new java.io.IOException(s"could not publish feature store to $dir")
    }
    s.read.parquet(dir)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  // the z=9 tile containing the point of c_custkey = 100 (same as q28)
  private val (t9x, t9y) = {
    val lon = ((100L * 37) % 36000) / 100.0 - 180.0
    val lat = ((100L * 53) % 17000) / 100.0 - 85.0
    (WebMercator.tileX(lon, 9), WebMercator.tileY(lat, 9))
  }

  // ---------------------------------------------------------------- x46/x47
  /** The reference's core read product — the vector-tile query (SURVEY §2.2
    * T1–T7) — as one pruned scan + clip over the features table (rows-only:
    * MVT geometry bytes are golden-tested in TileServiceSpec, not
    * SQL-expressible).
    */
  val x46_tile: QueryDef = QueryDef.rowsOnly("x46_tile") { (s, d) =>
    Canon(graft.tiles.TileService.tileDf(featuresStored(s, d), 9, t9x, t9y))
  }

  /** The count-heatmap query (SURVEY §2.3 H1–H4) as one groupBy. */
  val x47_heatmap: QueryDef = QueryDef.rowsOnly("x47_heatmap") { (s, d) =>
    Canon(graft.tiles.TileService.heatmapDf(featuresStored(s, d), 9, t9x, t9y))
  }

  // ---------------------------------------------------------------- x91
  /** The declared SURVEY §4/§7 stretch goal, landed: an ST-style spatial
    * predicate on the features STORE that the optimizer
    * ([[graft.functions.SpatialPredicateRewrite]]) auto-lowers to pushed
    * Z-range scans — the caller writes geometric intent
    * (`st_centroid_in_bbox(geometry, bbox)`), never touches ZRange, and the
    * plan still prunes on the stored hash exactly like the hand-built tile
    * path (PlanSpec gates the pushed ranges + retained exact conjunct).
    * Bbox edges sit at .005 so no 2-decimal B1 point lands on a boundary;
    * the box sits in the sw quadrant the B1 derivation populates at EVERY
    * SF (sf0.001's 150 ids only reach lon ≤ -124.5, lat ≤ -5.5).
    * The oracle replays the centroid test arithmetically over the point
    * derivation — if the lowered cover ever dropped a cell (recall bug) or
    * the exact conjunct were lost (over-scan leak), rows would differ and
    * the hash compare fails.
    */
  val x91_st_bbox: QueryDef = QueryDef(
    "x91_st_bbox",
    Sql.canon(
      s"""SELECT 'uid-' || CAST(id AS VARCHAR) AS uid, CAST(id AS DOUBLE) AS value
         |FROM ($PointsSql)
         |WHERE lon >= -170.005 AND lon <= -140.005
         |  AND lat >= -80.005 AND lat <= -40.005""".stripMargin,
      Seq("uid", "value"))) { (s, d) =>
    graft.functions.GraftFunctions.register(s) // installs the rewrite rule
    Canon(featuresStored(s, d)
      .filter(graft.functions.GeoColumns.centroidInBbox(
        col("geometry"), -170.005, -80.005, -140.005, -40.005))
      .select(col("uid"), col("value")))
  }

  // ---------------------------------------------------------------- Q30
  /** Haversine top-50 nearest points to a fixed coordinate; ordering and the
    * top-k cut both happen on the ROUNDED distance (+ id tie-break) so the
    * selected set is deterministic across engines.
    */
  val q30: QueryDef = QueryDef(
    "q30_haversine",
    Sql.canon(
      s"""SELECT id, lon, lat,
         |  ROUND(2.0 * 6371.0 * ASIN(SQRT(
         |    POWER(SIN(RADIANS(lat - 52.52) / 2), 2) +
         |    COS(RADIANS(52.52)) * COS(RADIANS(lat)) * POWER(SIN(RADIANS(lon - 13.405) / 2), 2)
         |  )), 4) AS dist_km
         |FROM ($PointsSql)
         |ORDER BY dist_km, id LIMIT 50""".stripMargin,
      Seq("id", "lon", "lat", "dist_km"))) { (s, d) =>
    Canon(points(s, d)
      .withColumn("dist_km",
        round(GeoColumns.haversineKmTo(col("lat"), col("lon"), 52.52, 13.405), 4))
      .orderBy(col("dist_km").asc, col("id").asc)
      .limit(50))
  }

  // ---------------------------------------------------------------- x57
  /** Point-in-polygon spatial join ([[graft.operators.SpatialJoin]]) against
    * region-derived bboxes. Edges sit at x.xx5 so no 2-decimal B1 point can
    * land on a boundary (where JTS `contains` excludes but SQL `>=` would
    * include); the oracle replays the containment arithmetically.
    */
  val x57_spatial_join: QueryDef = QueryDef(
    "x57_spatial_join",
    Sql.canon(
      s"""SELECT p.id, r.r_regionkey AS poly_id
         |FROM ($PointsSql) p JOIN region r
         |  ON p.lon >= -170.005 + 62*r.r_regionkey
         | AND p.lon <  -170.005 + 62*r.r_regionkey + 50.01
         | AND p.lat >= -70.005 + 25*r.r_regionkey
         | AND p.lat <  -70.005 + 25*r.r_regionkey + 35.01""".stripMargin,
      Seq("id", "poly_id"))) { (s, d) =>
    val x0 = lit(-170.005) + col("r_regionkey") * 62
    val y0 = lit(-70.005) + col("r_regionkey") * 25
    val x1 = x0 + 50.01
    val y1 = y0 + 35.01
    val polys = Tables.region(s, d).select(
      col("r_regionkey").as("poly_id"),
      concat(lit("POLYGON (("),
        concat_ws(", ",
          concat(x0, lit(" "), y0), concat(x1, lit(" "), y0),
          concat(x1, lit(" "), y1), concat(x0, lit(" "), y1),
          concat(x0, lit(" "), y0)),
        lit("))")).as("wkt"))
    Canon(graft.operators.SpatialJoin.pointInPolygon(points(s, d), polys)
      .select(col("id"), col("poly_id")))
  }

  // ---------------------------------------------------------------- x58
  /** Per-group bbox union via the custom typed Aggregator
    * ([[graft.functions.BBoxAgg]]); the oracle reduces to MIN/MAX because
    * the fixture geometries are points — which is exactly what makes the
    * custom aggregate hash-checkable.
    */
  val x58_bbox_agg: QueryDef = QueryDef(
    "x58_bbox_agg",
    Sql.canon(
      s"""SELECT id % 7 AS grp, MIN(lon) AS min_x, MIN(lat) AS min_y,
         |  MAX(lon) AS max_x, MAX(lat) AS max_y, COUNT(*) AS n
         |FROM ($PointsSql) GROUP BY id % 7""".stripMargin,
      Seq("grp", "min_x", "min_y", "max_x", "max_y", "n"))) { (s, d) =>
    val pts = points(s, d).select(
      (col("id") % 7).as("grp"),
      concat(lit("POINT ("), col("lon"), lit(" "), col("lat"), lit(")")).as("geometry"))
    Canon(pts.groupBy(col("grp"))
      .agg(graft.functions.BBoxAgg.bbox(col("geometry")).as("bb"),
        count(lit(1)).as("n"))
      .select(col("grp"),
        col("bb.minX").as("min_x"), col("bb.minY").as("min_y"),
        col("bb.maxX").as("max_x"), col("bb.maxY").as("max_y"), col("n")))
  }
}
