package graft.sources

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec
import graft.sources.FeatureStore.{AttrField, StoreConfig}

class ExhausterSpec extends SparkSpec {

  import spark.implicits._

  /** Minimal collecting endpoint for the fan-out under test. */
  private def withReceiver(status: Int = 200)(
      body: (String, java.util.concurrent.ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val srv = HttpServer.create(new InetSocketAddress(0), 0)
    srv.createContext("/", (ex: HttpExchange) => {
      received.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      ex.sendResponseHeaders(status, -1)
      ex.close()
    })
    srv.start()
    try body(s"http://localhost:${srv.getAddress.getPort}/", received)
    finally srv.stop(0)
  }

  test("rejected rows POST from executors; 2xx responses are counted") {
    withReceiver() { (url, received) =>
      val rejected = Seq("""{"bad":1}""", """{"bad":2}""", """{"bad":3}""")
        .toDF("raw")
      val n = Exhauster.post(rejected, url)
      assert(n == 3, s"expected 3 posted, got $n")
      assert(received.size == 3)
      assert(received.toArray.map(_.toString).toSet ==
        Set("""{"bad":1}""", """{"bad":2}""", """{"bad":3}"""))
    }
  }

  test("a rejecting endpoint is best-effort: nothing counted, nothing thrown") {
    withReceiver(status = 500) { (url, received) =>
      val n = Exhauster.post(Seq("""{"bad":1}""").toDF("raw"), url)
      assert(n == 0)
      assert(received.size == 1) // delivered, refused
    }
  }

  test("an unreachable endpoint cannot fail the ingest path") {
    val n = Exhauster.post(Seq("""{"bad":1}""").toDF("raw"),
      "http://localhost:1/", timeoutMs = 300)
    assert(n == 0)
  }

  test("writeRejected fans out when exhausterUrl is configured") {
    withReceiver() { (url, received) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-exh").toString
      val cfg = StoreConfig(path = s"$dir/store",
        attrs = Seq(AttrField("size", "int")), exhausterUrl = Some(url))
      // a string in the int field dead-letters the row
      val bad =
        """{"type":"Feature","geometry":{"type":"Point","coordinates":[1,1]},"properties":{"size":"abc"}}"""
      val r = FeatureStore.ingest(Seq(bad).toDF("raw"), cfg)
      FeatureStore.writeRejected(r.rejected, cfg)
      assert(spark.read.parquet(s"${cfg.path}_rejected").count() == 1)
      assert(received.size == 1 && received.peek().contains("\"size\":\"abc\""))
    }
  }
}
