package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.tiles.GeomUdfs

/** Feature ingest + storage: the Spark-native reproduction of the reference's
  * write path and CRUD surface (SURVEY.md §1.2-§1.3, §2.4):
  *
  *  - GeoJSON FeatureCollection and NDJSON readers (A2/A3).
  *  - The §1.3 lenient coercion matrix with tank's defaults: missing
  *    property → type default; string in an int field or unparseable number →
  *    the row goes to the DEAD-LETTER output with its original JSON (the
  *    Exhauster channel, Tyler.kt:152-169 / Exhauster.kt:28-40), never into
  *    the table.
  *  - Key assignment (I4): uid from the feature id (deterministic md5-uuid
  *    when absent — deviation from tank's random UUID, for replayability),
  *    Morton `hash` of the geometry centroid at hashLevel, ingest timestamp.
  *  - Storage layout designed for the 100 TB path: rows range-partitioned
  *    and sorted by `hash`, so every parquet file covers a narrow Morton
  *    range and tile reads prune on file-level min/max statistics — the
  *    moral equivalent of tank's Cassandra partition key.
  *  - CRUD (A4-A6) + Z-range tile delete (A8) as copy-on-write snapshot
  *    rewrites (the plain-parquet analog of Delta DELETE/MERGE).
  *
  * Attr types supported: int | double | text | date (application.conf:44-54
  * semantics; `timestamp`/`uuid` are engine-assigned reserved columns).
  */
object FeatureStore {

  final case class AttrField(name: String, typ: String)

  final case class StoreConfig(
      path: String,
      attrs: Seq[AttrField],
      hashLevel: Int = 13,
      targetFileRows: Int = 4 * 1000 * 1000,
      ingestTime: String = "2026-01-01 00:00:00")

  /** Columns every feature row carries besides user attrs. */
  private val Reserved = Seq("hash", "uid", "timestamp", "geometry")

  // ------------------------------------------------------------- readers

  /** NDJSON: one GeoJSON feature per line (A3 `geojson=false`). */
  def readNdjson(spark: SparkSession, path: String, cfg: StoreConfig): Ingested =
    ingest(spark.read.text(path).select(col("value").as("raw")), cfg)

  /** Streaming NDJSON ingest (A3's true streaming twin, replacing the
    * reference's poll-dir + `.lock`-rename runner, FileWaitGroup.kt:19-73):
    * the file source tracks processed files in the checkpoint (exactly-once),
    * `maxFilesPerTrigger` bounds ingest concurrency like tank's 2-runner cap,
    * and every microbatch appends BOTH outputs — coerced rows into the
    * hash-sorted store, dead-letter rows with their original JSON.
    * Returns the started query (await/stop is the caller's business).
    */
  def startIngestStream(spark: SparkSession, srcDir: String, cfg: StoreConfig,
                        checkpoint: String,
                        maxFilesPerTrigger: Int = 2): org.apache.spark.sql.streaming.StreamingQuery = {
    val raw = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(srcDir)
      .select(col("value").as("raw"))
    ingestStream(raw, cfg, checkpoint)
  }

  /** foreachBatch split-sink for an already-built raw feature stream.
    *
    * Replay semantics: a restarted query re-invokes the last uncommitted
    * batchId; the per-batch marker file makes the re-run a no-op, so a
    * replay after a completed batch never duplicates rows. The residual
    * window is a crash BETWEEN the appends and the marker write (same
    * at-least-once boundary as any non-transactional two-sink foreachBatch
    * — full exactly-once across two sinks needs a table format).
    */
  def ingestStream(raw: DataFrame, cfg: StoreConfig,
                   checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    raw.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val marker = new org.apache.hadoop.fs.Path(
          s"${cfg.path}_batches/$batchId")
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          val r = ingest(batch, cfg)
          r.good.sortWithinPartitions("hash")
            .write.mode(SaveMode.Append).parquet(cfg.path)
          val rej = r.rejected
          if (!rej.isEmpty)
            rej.write.mode(SaveMode.Append).parquet(s"${cfg.path}_rejected")
          fs.create(marker, true).close()
        }
      }
      .start()

  /** One whole FeatureCollection document (A3 `geojson=true`). The features
    * array is split with Jackson on the driver (the reference's own
    * whole-file import loop, Tyler.kt:49-58) — NOT via Spark JSON schema
    * inference, which would unify property types ACROSS features (one
    * string-typed value stringifies the column for every feature, mass
    * dead-lettering valid rows) and re-serialize `raw`, changing derived
    * md5 uids vs NDJSON ingest of the identical features.
    */
  def readFeatureCollection(spark: SparkSession, path: String, cfg: StoreConfig): Ingested = {
    import spark.implicits._
    val text = spark.read.option("wholetext", "true").text(path)
      .collect().map(_.getString(0)).mkString
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(text)
    val feats = Option(root.get("features")).filter(_.isArray)
      .getOrElse(throw new IllegalArgumentException("not a FeatureCollection"))
    val rows = (0 until feats.size).map(i => feats.get(i).toString)
    ingest(rows.toDF("raw"), cfg)
  }

  /** Ingest result: coerced rows ready to write + dead-letter rows. */
  final case class Ingested(good: DataFrame, rejected: DataFrame)

  /** The coercion matrix over raw feature-JSON rows (column `raw`). */
  def ingest(raw: DataFrame, cfg: StoreConfig): Ingested = {
    val geomWkt = udf((g: String) => GeoJson.toWkt(g))
    val hashUdf = udf((wkt: String) => GeomUdfs.centroidHash(wkt, cfg.hashLevel))

    val attrNames = cfg.attrs.map(_.name)
    val propsU = udf((p: String) => PropsParser.parse(p, attrNames))
    var df = raw
      .withColumn("_geomjson", get_json_object(col("raw"), "$.geometry"))
      .withColumn("_props", get_json_object(col("raw"), "$.properties"))
      .withColumn("_id", get_json_object(col("raw"), "$.id"))
      .withColumn("geometry", geomWkt(col("_geomjson")))
      // ONE real JSON parse per row yields every attr's raw text + its
      // was-a-JSON-string flag. (A regex probe over the properties text
      // would false-positive on nested objects containing the same key,
      // and per-attr get_json_object re-parses the JSON per call.)
      .withColumn("_propvals", propsU(col("_props")))

    // per-attr: raw JSON text of the property (null if absent), plus the
    // string flag — tank's coercion is type-directed on the parsed JSON
    // value (Tyler.kt:75-116)
    val attrChecks: Seq[(Column, Column)] = cfg.attrs.map { a =>
      val entry = col("_propvals").getItem(a.name)
      val v = entry.getItem(0)
      val wasString = entry.getItem(1) === "1"
      val (coerced, bad) = a.typ match {
        case "int" =>
          // accepts integral JSON numbers only (IntValue, Tyler.kt:76);
          // strings and non-integral numbers dead-letter
          (coalesce(try_cast_long(v), lit(0L)).cast("int"),
            v.isNotNull && (wasString || try_cast_long(v).isNull))
        case "double" =>
          // accepts numbers and numeric strings (Tyler.kt:77-87)
          (coalesce(try_cast_double(v), lit(0.0)),
            v.isNotNull && try_cast_double(v).isNull)
        case "date" =>
          // parsed from the NAMED property (deviation D3: tank hard-codes
          // `img_date`, Tyler.kt:100-102); default 1970-01-01 (Tyler.kt:111)
          (coalesce(try_to_date_col(v), to_date(lit("1970-01-01"))),
            v.isNotNull && try_to_date_col(v).isNull)
        case _ => // text: lenient from any scalar, default ""
          (coalesce(v, lit("")), lit(false))
      }
      df = df.withColumn(a.name, coerced).withColumn(s"_bad_${a.name}", bad)
      (coerced, bad)
    }

    val anyBad = (col("geometry").isNull +: attrChecks.map(_._2))
      .reduce(_ || _)
    val withFlags = df.withColumn("_rejected", anyBad)

    val good = withFlags.filter(!col("_rejected"))
      .withColumn("uid",
        coalesce(col("_id"),
          // deterministic uuid-shaped id from the feature body
          concat_ws("-",
            substring(md5(col("raw")), 1, 8), substring(md5(col("raw")), 9, 4),
            substring(md5(col("raw")), 13, 4), substring(md5(col("raw")), 17, 4),
            substring(md5(col("raw")), 21, 12))))
      .withColumn("hash", hashUdf(col("geometry")))
      .withColumn("timestamp", to_timestamp(lit(cfg.ingestTime)))
      .select((Reserved.map(col) ++ cfg.attrs.map(a => col(a.name))): _*)

    val rejected = withFlags.filter(col("_rejected")).select(col("raw"))
    Ingested(good, rejected)
  }

  /** Executor-side single-parse property extractor: attr name ->
    * (raw text matching get_json_object semantics — unquoted for strings,
    * JSON text otherwise — and a "1"/"0" was-a-JSON-string flag).
    * Malformed / non-object properties yield no entries (every present
    * attr then reads null, exactly like the per-path probes did).
    */
  private object PropsParser extends Serializable {
    @transient private lazy val mapper =
      new com.fasterxml.jackson.databind.ObjectMapper()
    def parse(props: String, names: Seq[String]): Map[String, Seq[String]] = {
      if (props == null) return Map.empty
      val node =
        try mapper.readTree(props)
        catch { case _: Exception => return Map.empty }
      if (node == null || !node.isObject) return Map.empty
      names.flatMap { n =>
        Option(node.get(n)).map { v =>
          val text = if (v.isTextual) v.textValue else v.toString
          n -> Seq(text, if (v.isTextual) "1" else "0")
        }
      }.toMap
    }
  }

  // try_* helpers (ANSI-safe lenient casts)
  private def try_cast_long(c: Column): Column = c.try_cast("long")
  private def try_cast_double(c: Column): Column = c.try_cast("double")
  private def try_to_date_col(c: Column): Column = try_to_timestamp(c).cast("date")

  // ------------------------------------------------------------- storage

  /** Write/overwrite the store: range-partitioned + sorted by `hash` so file
    * min/max stats align with Morton ranges (tile reads prune to O(tile)
    * files at any table size).
    */
  def write(df: DataFrame, cfg: StoreConfig, partitions: Int = 0): Unit = {
    val n = if (partitions > 0) partitions
      else math.max(1, (df.count() / cfg.targetFileRows).toInt)
    df.repartitionByRange(n, col("hash"), col("uid"))
      .sortWithinPartitions("hash")
      .write.mode(SaveMode.Overwrite).parquet(cfg.path)
  }

  def read(spark: SparkSession, cfg: StoreConfig): DataFrame =
    spark.read.parquet(cfg.path)

  /** Compact the store back into the hash-sorted target layout. Streaming
    * ingest appends one (or more) small files per microbatch, which erodes
    * both scan efficiency and hash-range pruning precision over time; a
    * periodic compaction (e.g. from the maintenance side of a foreachBatch)
    * restores O(tile) file reads. Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, cfg: StoreConfig,
              partitions: Int = 0): (Int, Int) = {
    val fs = new org.apache.hadoop.fs.Path(cfg.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetCount(): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(cfg.path))
        .count(_.getPath.getName.endsWith(".parquet"))
    val before = parquetCount()
    rewrite(spark, cfg, df => {
      val n = if (partitions > 0) partitions
        else math.max(1, (df.count() / cfg.targetFileRows).toInt)
      df.repartitionByRange(n, org.apache.spark.sql.functions.col("hash"),
          org.apache.spark.sql.functions.col("uid"))
        .sortWithinPartitions("hash")
    })
    (before, parquetCount())
  }

  /** Dead-letter sink (the Exhauster channel): original JSON only. */
  def writeRejected(rejected: DataFrame, cfg: StoreConfig): Unit =
    rejected.write.mode(SaveMode.Append).parquet(s"${cfg.path}_rejected")

  // ------------------------------------------------------------- CRUD

  /** A4: point lookup by uid (plain pushed-down filter). */
  def lookup(spark: SparkSession, cfg: StoreConfig, uid: String): DataFrame =
    read(spark, cfg).filter(col("uid") === uid)

  /** A5: delete by uid — rewrites ONLY the parquet files containing the uid
    * (found via a pushed-down filter over `_metadata.file_path`); every
    * other file stays byte-identical on disk. Pass `knownHash` (e.g. from a
    * prior lookup) to prune the touched-file probe to the O(1) files whose
    * hash min/max covers it instead of scanning uid stats table-wide.
    */
  def delete(spark: SparkSession, cfg: StoreConfig, uid: String,
             knownHashes: Seq[Int] = Nil): Unit = {
    // ALL the uid's hashes must prune the probe — a uid ingested twice with
    // different geometry legitimately holds rows in different hash cells,
    // and restricting to the first would leave the others undeleted
    val touches =
      if (knownHashes.nonEmpty)
        col("hash").isin(knownHashes: _*) && col("uid") === uid
      else col("uid") === uid
    rewriteTouched(spark, cfg, touches, _.filter(col("uid") =!= uid))
  }

  /** A6: update = replace geometry/attrs of one uid, preserving every column
    * not supplied (tank re-imports the merged feature, application.kt:317-348).
    * Only the file(s) holding the uid are rewritten; if the new geometry
    * moves the row to a different Morton cell, the rewritten file simply
    * covers a wider hash range (pruning stays correct — ranges are read from
    * actual file stats).
    */
  def update(spark: SparkSession, cfg: StoreConfig, uid: String,
             newGeometryWkt: Option[String],
             newAttrs: Map[String, Any],
             knownHashes: Seq[Int] = Nil): Unit = {
    val hashUdf = udf((wkt: String) => GeomUdfs.centroidHash(wkt, cfg.hashLevel))
    val touches =
      if (knownHashes.nonEmpty)
        col("hash").isin(knownHashes: _*) && col("uid") === uid
      else col("uid") === uid
    rewriteTouched(spark, cfg, touches, df => {
      val updatedGeom = newGeometryWkt match {
        case Some(w) =>
          when(col("uid") === uid, lit(w)).otherwise(col("geometry"))
        case None => col("geometry")
      }
      val withAttrs = newAttrs.foldLeft(df.withColumn("geometry", updatedGeom)) {
        case (d, (k, v)) =>
          // pin the replacement to the column's EXISTING type: a bare lit
          // would coerce the whole column (e.g. int -> string), leaving the
          // rewritten file's schema diverging from every untouched file
          d.withColumn(k,
            when(col("uid") === uid, lit(v).cast(d.schema(k).dataType))
              .otherwise(col(k)))
      }
      withAttrs.withColumn("hash",
        when(col("uid") === uid, hashUdf(col("geometry"))).otherwise(col("hash")))
    })
  }

  /** A8: bulk delete of every feature in a tile's Z-range. The hash-range
    * predicate prunes the touched-file probe via parquet min/max stats, so
    * only the O(tile) files overlapping the tile's Morton ranges are read
    * or rewritten.
    */
  def deleteTile(spark: SparkSession, cfg: StoreConfig, z: Int, x: Int, y: Int): Unit = {
    val ranges = graft.core.ZRange.coverWithBuffer(z, x, y, cfg.hashLevel, 0.0)
    val inTile = ranges.map { case (lo, hi) => col("hash").between(lo, hi) }
      .reduce(_ || _)
    rewriteTouched(spark, cfg, inTile, _.filter(!inTile))
  }

  /** Targeted copy-on-write: rewrite ONLY the parquet files that contain at
    * least one row matching `touches`; untouched files are never read twice,
    * never rewritten, and stay byte-identical. This is the file-level-delete
    * shape of a table format (Delta/Iceberg) on plain parquet: a single-uid
    * DELETE touches O(1) files instead of rewriting the table — the round-1
    * full-table rewrite could not run at 100 TB.
    *
    * The probe scan benefits from pushdown: a hash-range `touches` predicate
    * prunes on file min/max stats (the store is hash-range-partitioned and
    * hash-sorted), so for tile deletes only O(tile) files are opened at all.
    * The swap (delete touched + move replacements in) is not atomic for
    * concurrent readers — snapshot isolation is a table format's job; the
    * reference's Cassandra store has the same read-uncommitted semantics.
    */
  private def rewriteTouched(spark: SparkSession, cfg: StoreConfig,
                             touches: Column,
                             f: DataFrame => DataFrame): Unit = {
    val touched = read(spark, cfg)
      .filter(touches)
      .select(col("_metadata.file_path").as("_file"))
      .distinct().collect().map(_.getString(0))
    if (touched.isEmpty) return
    val next = f(spark.read.parquet(touched.toIndexedSeq: _*)).cache()
    val tmp = cfg.path + "_rw_tmp"
    next.write.mode(SaveMode.Overwrite).parquet(tmp)
    next.unpersist()
    // resolve the filesystem FROM the store path — FileSystem.get(default)
    // throws "Wrong FS" whenever cfg.path lives on s3a://, hdfs://, …
    val fs = new org.apache.hadoop.fs.Path(cfg.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.foreach { fp =>
      fs.delete(new org.apache.hadoop.fs.Path(new java.net.URI(fp)), false)
    }
    val dstDir = new org.apache.hadoop.fs.Path(cfg.path)
    fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(st => fs.rename(st.getPath,
        new org.apache.hadoop.fs.Path(dstDir, st.getPath.getName)))
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  /** Full copy-on-write snapshot (compaction path): materialize the
    * transformed table, swap dirs.
    */
  private def rewrite(spark: SparkSession, cfg: StoreConfig,
                      f: DataFrame => DataFrame): Unit = {
    val tmp = cfg.path + "_tmp"
    val next = f(read(spark, cfg)).cache()
    next.write.mode(SaveMode.Overwrite).parquet(tmp)
    next.unpersist()
    val fs = new org.apache.hadoop.fs.Path(cfg.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(cfg.path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
