package graft.server

import java.net.{HttpURLConnection, URI}
import graft.SparkSpec
import graft.core.WebMercator
import graft.sources.FeatureStore.{AttrField, StoreConfig}
import graft.tiles.{Mvt, TileService}

/** End-to-end drive of the REST surface: every reference route (A1-A9)
  * against a live server, including cache invalidation on writes.
  */
class TankServerSpec extends SparkSpec {

  private val cfg = StoreConfig(
    path = java.nio.file.Files.createTempDirectory("graft-srv").toString + "/store",
    attrs = Seq(AttrField("class", "text"), AttrField("value", "double")))
  private val tileCfg = TileService.TileConfig(
    mainAttr = "class", attributes = Seq("class", "value"))

  private lazy val server = new TankServer(spark, cfg, tileCfg)
  private lazy val port = server.start()

  override def afterAll(): Unit = { server.stop(); super.afterAll() }

  private def http(method: String, path: String, body: Option[String] = None)
      : (Int, Array[Byte]) = {
    val conn = new URI(s"http://localhost:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      os.write(b.getBytes("UTF-8")); os.close()
    }
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val bytes = if (is != null) is.readAllBytes() else Array.empty[Byte]
    conn.disconnect()
    (code, bytes)
  }

  private def feature(id: String, lon: Double, lat: Double, cls: String): String =
    s"""{"type":"Feature","id":"$id","geometry":{"type":"Point","coordinates":[$lon,$lat]},"properties":{"class":"$cls","value":1.5}}"""

  private val (lon, lat) = (10.0, 50.0)
  private val (tx, ty) = (WebMercator.tileX(lon, 13), WebMercator.tileY(lat, 13))

  test("A1: liveness") {
    val (code, body) = http("GET", "/")
    assert(code == 200 && new String(body).contains("tankspark"))
  }

  test("A2+A4: ingest one feature, read it back as GeoJSON") {
    val (code, body) = http("POST", "/", Some(feature("f1", lon, lat, "roads")))
    assert(code == 200 && new String(body) == """{"ingested":1}""")
    val (gc, gb) = http("GET", "/f1")
    val json = new String(gb)
    assert(gc == 200 && json.contains(""""id":"f1"""") &&
      json.contains(""""type":"Point"""") && json.contains(""""class":"roads""""),
      json)
  }

  test("A7: tile read returns a decodable MVT containing the feature; filters work") {
    val (code, body) = http("GET", s"/tile/13/$tx/$ty")
    assert(code == 200)
    val layer = Mvt.decode(body).head
    assert(layer.name == "io.marauder.tank")
    assert(layer.features.exists(_.props.get("class").contains("roads")))
    // attribute filter: no match -> empty tile
    val (_, filtered) = http("GET",
      s"/tile/13/$tx/$ty?filter=%7B%22class%22%3A%22water%22%7D")
    assert(Mvt.decode(filtered).head.features.isEmpty)
  }

  test("A3: bulk NDJSON ingest dead-letters bad rows and invalidates the tile cache") {
    // prime the cache
    http("GET", s"/tile/13/$tx/$ty")
    val bulk = Seq(
      feature("f2", lon + 0.0005, lat + 0.0005, "water"),
      s"""{"type":"Feature","id":"bad","geometry":{"type":"Point","coordinates":[$lon,$lat]},"properties":{"value":"not-a-number"}}""")
    val (code, body) = http("POST", "/_bulk", Some(bulk.mkString("\n")))
    assert(code == 200 && new String(body) == """{"ingested":1}""")
    // the cached tile MUST have been invalidated: f2 appears immediately
    val (_, tb) = http("GET", s"/tile/13/$tx/$ty")
    assert(Mvt.decode(tb).head.features.exists(_.props.get("class").contains("water")),
      "stale cache served after a write touching the tile")
  }

  test("A9: heatmap returns count cells") {
    val (code, body) = http("GET", s"/heatmap/13/$tx/$ty")
    assert(code == 200)
    val cells = Mvt.decode(body).head.features
    assert(cells.nonEmpty && cells.forall(_.props.get("count").exists(_.asInstanceOf[Long] > 0)))
  }

  test("A6: update preserves untouched attrs and refreshes the tile") {
    val (code, _) = http("PUT", "/f1",
      Some("""{"properties":{"class":"poi"}}"""))
    assert(code == 200)
    val (_, gb) = http("GET", "/f1")
    val json = new String(gb)
    assert(json.contains(""""class":"poi"""") && json.contains(""""value":1.5"""), json)
    val (_, tb) = http("GET", s"/tile/13/$tx/$ty")
    assert(Mvt.decode(tb).head.features.exists(_.props.get("class").contains("poi")))
  }

  test("A5: delete removes the feature from store and tiles") {
    http("DELETE", "/f1")
    val (gc, _) = http("GET", "/f1")
    assert(gc == 404)
    val (_, tb) = http("GET", s"/tile/13/$tx/$ty")
    assert(!Mvt.decode(tb).head.features.exists(_.props.get("class").contains("poi")))
  }

  test("A8: tile delete empties the tile") {
    val (code, _) = http("DELETE", s"/tile/13/$tx/$ty")
    assert(code == 200)
    val (_, tb) = http("GET", s"/tile/13/$tx/$ty")
    assert(Mvt.decode(tb).head.features.isEmpty)
  }

  test("unknown route is a 404") {
    assert(http("GET", "/no/such/route/x")._1 == 404)
  }
}
