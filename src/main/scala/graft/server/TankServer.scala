package graft.server

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{FeatureStore, GeoJson}
import graft.sources.FeatureStore.StoreConfig
import graft.tiles.{TileCache, TileService}
import graft.tiles.TileService.TileConfig

/** Thin HTTP shim reproducing the reference's REST surface (SURVEY §2.1
  * A1–A13; routes mirror `/root/reference/src/main/kotlin/io/marauder/tank/
  * application.kt:226-619`) over the Spark engine. Built on the JDK's
  * bundled HttpServer — zero new dependencies; the engine stays the
  * library, this is serving glue.
  *
  *   GET  /                     liveness text                (A1)
  *   POST /                     ingest one GeoJSON feature   (A2)
  *   POST /_bulk                ingest NDJSON body           (A3, sync form)
  *   GET  /{uid}                feature as GeoJSON           (A4)
  *   DELETE /{uid}              delete by uid                (A5)
  *   PUT  /{uid}                update (preserves attrs)     (A6)
  *   GET  /tile/{z}/{x}/{y}?filter={"attr":v}  MVT bytes     (A7)
  *   DELETE /tile/{z}/{x}/{y}   bulk delete tile             (A8)
  *   GET  /heatmap/{z}/{x}/{y}  count-grid MVT               (A9)
  *
  * The tile/heatmap cache (A11/O5) invalidates by the Morton cells each
  * write touches. Single-threaded executor: request handling is Spark-job
  * bound anyway; scale-out is more servers over the same store.
  */
final class TankServer(spark: SparkSession, cfg: StoreConfig,
                       tileCfg: TileConfig = TileConfig(), port: Int = 0) {

  private val cache = new TileCache(tileCfg.hashLevel)
  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  private def features: DataFrame = FeatureStore.read(spark, cfg)

  def start(): Int = {
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)

  // ------------------------------------------------------------- routing

  private def handle(ex: HttpExchange): Unit = try {
    val path = ex.getRequestURI.getPath.stripSuffix("/")
    val parts = path.split("/").toList.filter(_.nonEmpty)
    (ex.getRequestMethod, parts) match {
      case ("GET", Nil) =>
        respond(ex, 200, "tankspark: Spark-native tank engine\n".getBytes, "text/plain")
      case ("POST", Nil) => postFeature(ex)
      case ("POST", List("_bulk")) => postBulk(ex)
      case ("GET", List("tile", z, x, y)) => tile(ex, z.toInt, x.toInt, y.toInt)
      case ("DELETE", List("tile", z, x, y)) => deleteTile(ex, z.toInt, x.toInt, y.toInt)
      case ("GET", List("heatmap", z, x, y)) => heatmap(ex, z.toInt, x.toInt, y.toInt)
      case ("GET", List(uid)) => getFeature(ex, uid)
      case ("DELETE", List(uid)) => deleteFeature(ex, uid)
      case ("PUT", List(uid)) => putFeature(ex, uid)
      case _ => respond(ex, 404, "not found\n".getBytes, "text/plain")
    }
  } catch {
    case e: Exception =>
      respond(ex, 500, s"error: ${e.getMessage}\n".getBytes, "text/plain")
  }

  // ------------------------------------------------------------- reads

  private def tile(ex: HttpExchange, z: Int, x: Int, y: Int): Unit = {
    val filter = parseFilter(ex)
    val cacheable = filter.isEmpty
    val cached = if (cacheable) cache.get("tile", z, x, y) else None
    val bytes = cached.getOrElse {
      val b = TileService.tile(features, z, x, y, filter, tileCfg)
      if (cacheable) cache.put("tile", z, x, y, b)
      b
    }
    respond(ex, 200, bytes, "application/x-protobuf")
  }

  private def heatmap(ex: HttpExchange, z: Int, x: Int, y: Int): Unit = {
    val bytes = cache.get("heatmap", z, x, y).getOrElse {
      val b = TileService.heatmap(features, z, x, y, tileCfg)
      cache.put("heatmap", z, x, y, b)
      b
    }
    respond(ex, 200, bytes, "application/x-protobuf")
  }

  private def getFeature(ex: HttpExchange, uid: String): Unit = {
    val rows = FeatureStore.lookup(spark, cfg, uid).collect()
    if (rows.isEmpty) { respond(ex, 404, "{}".getBytes, "application/json"); return }
    val r = rows.head
    val props = cfg.attrs.map { a =>
      val v = r.getAs[Any](a.name)
      val json = v match {
        case s: String => "\"" + s + "\""
        case d: java.sql.Date => "\"" + d + "\""
        case other => String.valueOf(other)
      }
      s""""${a.name}":$json"""
    }.mkString("{", ",", "}")
    val body =
      s"""{"type":"Feature","id":"$uid","geometry":${GeoJson.fromWkt(r.getAs[String]("geometry"))},"properties":$props}"""
    respond(ex, 200, body.getBytes("UTF-8"), "application/json")
  }

  // ------------------------------------------------------------- writes

  private def postFeature(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
    val n = ingestRaw(Seq(body))
    respond(ex, if (n == 1) 200 else 400,
      s"""{"ingested":$n}""".getBytes, "application/json")
  }

  private def postBulk(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
    val n = ingestRaw(body.linesIterator.filter(_.nonEmpty).toSeq)
    respond(ex, 200, s"""{"ingested":$n}""".getBytes, "application/json")
  }

  private def ingestRaw(lines: Seq[String]): Long = {
    import spark.implicits._
    val r = FeatureStore.ingest(lines.toDF("raw"), cfg)
    val good = r.good.cache()
    val n = good.count()
    if (n > 0) {
      good.write.mode(SaveMode.Append).parquet(cfg.path)
      cache.invalidateTouched(
        good.select("hash").distinct().collect().map(_.getInt(0)))
    }
    val rej = r.rejected
    if (!rej.isEmpty) FeatureStore.writeRejected(rej, cfg)
    good.unpersist()
    n
  }

  private def deleteFeature(ex: HttpExchange, uid: String): Unit = {
    val hashes = FeatureStore.lookup(spark, cfg, uid)
      .select("hash").collect().map(_.getInt(0))
    FeatureStore.delete(spark, cfg, uid, hashes.headOption)
    cache.invalidateTouched(hashes)
    respond(ex, 200, "{}".getBytes, "application/json")
  }

  private def putFeature(ex: HttpExchange, uid: String): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    val geomWkt = Option(node.get("geometry")).map(g => GeoJson.toWkt(g.toString))
    val props = Option(node.get("properties")).map { p =>
      cfg.attrs.flatMap { a =>
        Option(p.get(a.name)).map { v =>
          a.name -> (a.typ match {
            case "int" => v.asInt()
            case "double" => v.asDouble()
            case _ => v.asText()
          })
        }
      }.toMap[String, Any]
    }.getOrElse(Map.empty[String, Any])
    val oldHashes = FeatureStore.lookup(spark, cfg, uid)
      .select("hash").collect().map(_.getInt(0))
    FeatureStore.update(spark, cfg, uid, geomWkt, props, oldHashes.headOption)
    val newHashes = FeatureStore.lookup(spark, cfg, uid)
      .select("hash").collect().map(_.getInt(0))
    cache.invalidateTouched(oldHashes ++ newHashes)
    respond(ex, 200, "{}".getBytes, "application/json")
  }

  private def deleteTile(ex: HttpExchange, z: Int, x: Int, y: Int): Unit = {
    FeatureStore.deleteTile(spark, cfg, z, x, y)
    cache.invalidateRegion(
      graft.core.WebMercator.tileLon(x, z), graft.core.WebMercator.tileLat(y + 1, z),
      graft.core.WebMercator.tileLon(x + 1, z), graft.core.WebMercator.tileLat(y, z))
    respond(ex, 200, "{}".getBytes, "application/json")
  }

  // ------------------------------------------------------------- helpers

  private def parseFilter(ex: HttpExchange): Option[(String, Any)] = {
    val q = Option(ex.getRequestURI.getQuery).getOrElse("")
    q.split("&").find(_.startsWith("filter=")).flatMap { kv =>
      val json = java.net.URLDecoder.decode(kv.drop("filter=".length), "UTF-8")
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      val fields = node.fields()
      if (fields.hasNext) {
        val e = fields.next()
        val v: Any =
          if (e.getValue.isInt) e.getValue.asInt()
          else if (e.getValue.isDouble) e.getValue.asDouble()
          else e.getValue.asText()
        Some(e.getKey -> v)
      } else None
    }
  }

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte],
                      contentType: String): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, body.length.toLong)
    val os = ex.getResponseBody
    os.write(body)
    os.close()
  }
}
