package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.FeatureStore._

class FeatureStoreSpec extends SparkSpec {

  private val cfg0 = StoreConfig(
    path = "",
    attrs = Seq(AttrField("size", "int"), AttrField("score", "double"),
      AttrField("name", "text"), AttrField("seen", "date")))

  private def tmpDir(): String =
    Files.createTempDirectory("graft-fs").toString

  private def featureJson(id: String, lon: Double, lat: Double,
                          props: String): String =
    s"""{"type":"Feature","id":"$id","geometry":{"type":"Point","coordinates":[$lon,$lat]},"properties":$props}"""

  private val lines = Seq(
    featureJson("a", 10.0, 50.0, """{"size":3,"score":1.5,"name":"ok","seen":"2024-05-01"}"""),
    // missing properties -> type defaults
    featureJson("b", 10.1, 50.1, """{}"""),
    // numeric STRING in a double field -> coerced (Tyler.kt:77-87)
    featureJson("c", 10.2, 50.2, """{"score":"3.5"}"""),
    // string in an int field -> dead-letter
    featureJson("d", 10.3, 50.3, """{"size":"abc"}"""),
    // integral string in an int field -> ALSO dead-letter (IntValue only)
    featureJson("e", 10.4, 50.4, """{"size":"3"}"""),
    // non-integral number in an int field -> dead-letter
    featureJson("f", 10.5, 50.5, """{"size":3.5}"""),
    // unparseable date -> dead-letter
    featureJson("g", 10.6, 50.6, """{"seen":"not-a-date"}"""),
    // no id -> deterministic uid
    s"""{"type":"Feature","geometry":{"type":"Point","coordinates":[11.0,51.0]},"properties":{"size":7}}""")

  private def ingestLines(ls: Seq[String]): Ingested = {
    import spark.implicits._
    FeatureStore.ingest(ls.toDF("raw"), cfg0)
  }

  test("coercion matrix: defaults, lenient double, strict int, dead-letter") {
    val r = ingestLines(lines)
    val good = r.good.collect().map(x => x.getAs[String]("uid") -> x).toMap
    val rejected = r.rejected.collect().map(_.getString(0))

    assert(good.keySet.count(_.length > 1) >= 1) // deterministic uid row
    assert(good.contains("a") && good.contains("b") && good.contains("c"))
    // dead-letter rows carry their original JSON
    assert(rejected.length == 4)
    assert(rejected.exists(_.contains("\"size\":\"abc\"")))
    assert(rejected.exists(_.contains("\"size\":\"3\"")))
    assert(rejected.exists(_.contains("\"size\":3.5")))
    assert(rejected.exists(_.contains("not-a-date")))

    val a = good("a")
    assert(a.getAs[Int]("size") == 3 && a.getAs[Double]("score") == 1.5 &&
      a.getAs[String]("name") == "ok" &&
      a.getAs[java.sql.Date]("seen").toString == "2024-05-01")
    val b = good("b")
    assert(b.getAs[Int]("size") == 0 && b.getAs[Double]("score") == 0.0 &&
      b.getAs[String]("name") == "" &&
      b.getAs[java.sql.Date]("seen").toString == "1970-01-01")
    val c = good("c")
    assert(c.getAs[Double]("score") == 3.5)
    // every good row has a Morton hash and WKT geometry
    assert(good.values.forall(_.getAs[Int]("hash") > 0))
    assert(good.values.forall(_.getAs[String]("geometry").startsWith("POINT")))
  }

  test("FeatureCollection reader ingests the same rows as NDJSON") {
    val dir = tmpDir()
    val fcPath = s"$dir/fc.json"
    val ndPath = s"$dir/nd.json"
    val goodLines = lines.filterNot(l =>
      Seq("\"size\":\"abc\"", "\"size\":\"3\"", "\"size\":3.5", "not-a-date")
        .exists(l.contains))
    Files.writeString(java.nio.file.Paths.get(fcPath),
      s"""{"type":"FeatureCollection","features":[${goodLines.mkString(",")}]}""")
    Files.writeString(java.nio.file.Paths.get(ndPath), lines.mkString("\n"))

    val fc = FeatureStore.readFeatureCollection(spark, fcPath, cfg0)
    val nd = FeatureStore.readNdjson(spark, ndPath, cfg0)
    val fcIds = fc.good.select("uid").collect().map(_.getString(0)).toSet
    val ndIds = nd.good.select("uid").collect().map(_.getString(0)).toSet
    assert(fcIds.intersect(Set("a", "b", "c")) == Set("a", "b", "c"))
    assert(fcIds.filter(_.length == 1) == ndIds.filter(_.length == 1))
  }

  test("streaming NDJSON ingest appends good rows to the store and bad rows to dead-letter") {
    val dir = tmpDir()
    val src = s"$dir/incoming"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val cfg = cfg0.copy(path = s"$dir/store")
    val q = FeatureStore.startIngestStream(spark, src, cfg, s"$dir/ckpt")
    try {
      Files.writeString(java.nio.file.Paths.get(s"$src/batch1.ndjson"),
        Seq(lines(0), lines(1)).mkString("\n"))
      q.processAllAvailable()
      assert(FeatureStore.read(spark, cfg).count() == 2)
      // second batch: one good row, one dead-letter row
      Files.writeString(java.nio.file.Paths.get(s"$src/batch2.ndjson"),
        Seq(lines(2), lines(3)).mkString("\n"))
      q.processAllAvailable()
      assert(FeatureStore.read(spark, cfg).count() == 3)
      assert(spark.read.parquet(s"${cfg.path}_rejected").count() == 1)
      // exactly-once: reprocessing adds nothing
      q.processAllAvailable()
      assert(FeatureStore.read(spark, cfg).count() == 3)
    } finally q.stop()

    // compaction merges the per-microbatch small files, preserving rows
    val (before, after) = FeatureStore.compact(spark, cfg)
    assert(after < before, s"no compaction: $before -> $after")
    assert(FeatureStore.read(spark, cfg).count() == 3)
  }

  test("write/read roundtrip: hash-sorted layout, lookup, delete, update, tile delete") {
    val dir = tmpDir()
    val cfg = cfg0.copy(path = s"$dir/store")
    val r = ingestLines(lines)
    FeatureStore.write(r.good, cfg)
    FeatureStore.writeRejected(r.rejected, cfg)

    val stored = FeatureStore.read(spark, cfg)
    assert(stored.count() == 4)
    assert(spark.read.parquet(s"${cfg.path}_rejected").count() == 4)

    // A4 lookup
    assert(FeatureStore.lookup(spark, cfg, "a").count() == 1)

    // A6 update preserves untouched attrs
    FeatureStore.update(spark, cfg, "a", None, Map("name" -> "renamed"))
    val a = FeatureStore.lookup(spark, cfg, "a").collect().head
    assert(a.getAs[String]("name") == "renamed")
    assert(a.getAs[Int]("size") == 3, "update clobbered an untouched attr")

    // A6 geometry update recomputes the hash
    val oldHash = a.getAs[Int]("hash")
    FeatureStore.update(spark, cfg, "a", Some("POINT (-70 -30)"), Map.empty)
    val a2 = FeatureStore.lookup(spark, cfg, "a").collect().head
    assert(a2.getAs[Int]("hash") != oldHash)

    // A5 delete
    FeatureStore.delete(spark, cfg, "b")
    assert(FeatureStore.lookup(spark, cfg, "b").count() == 0)
    assert(FeatureStore.read(spark, cfg).count() == 3)

    // A8: tile delete removes everything in the z=9 tile around (10.2, 50.2)
    val tx = graft.core.WebMercator.tileX(10.2, 9)
    val ty = graft.core.WebMercator.tileY(50.2, 9)
    FeatureStore.deleteTile(spark, cfg, 9, tx, ty)
    val left = FeatureStore.read(spark, cfg).select("uid").collect().map(_.getString(0))
    assert(!left.contains("c"), s"tile delete left $left")
  }

  test("delete/update rewrite only the touched files; others stay byte-identical") {
    import spark.implicits._
    val dir = tmpDir()
    val cfg = StoreConfig(path = s"$dir/store", attrs = Seq(AttrField("v", "int")))
    // 40 well-spread points -> 8 range-partitioned files with disjoint hash ranges
    val ls = (0 until 40).map { i =>
      featureJson(s"u$i", -170.0 + i * 8.4, -80.0 + i * 4.0, s"""{"v":$i}""")
    }
    FeatureStore.write(FeatureStore.ingest(ls.toDF("raw"), cfg).good, cfg, partitions = 8)

    def snapshot(): Map[String, (Long, Long)] = {
      val d = new java.io.File(cfg.path)
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val before = snapshot()
    assert(before.size >= 4, s"need multiple files, got ${before.size}")

    val h = FeatureStore.lookup(spark, cfg, "u7").collect().head.getAs[Int]("hash")
    FeatureStore.delete(spark, cfg, "u7", Seq(h))
    assert(FeatureStore.lookup(spark, cfg, "u7").count() == 0)
    assert(FeatureStore.read(spark, cfg).count() == 39)

    val after = snapshot()
    val untouched = before.keySet.intersect(after.keySet)
    // exactly one file replaced; the surviving originals are bit-identical
    assert(untouched.size == before.size - 1,
      s"expected 1 rewritten file, got ${before.size - untouched.size}")
    untouched.foreach { name =>
      assert(before(name) == after(name), s"$name was modified in place")
    }

    // update: same contract
    FeatureStore.update(spark, cfg, "u3", None, Map("v" -> 999))
    val after2 = snapshot()
    val untouched2 = after.keySet.intersect(after2.keySet)
    assert(untouched2.size == after.size - 1)
    untouched2.foreach { name => assert(after(name) == after2(name)) }
    assert(FeatureStore.lookup(spark, cfg, "u3").collect().head.getAs[Int]("v") == 999)
    assert(FeatureStore.read(spark, cfg).count() == 39)
  }

  test("delete with multiple known hashes removes a uid present in two cells") {
    import spark.implicits._
    val dir = tmpDir()
    val cfg = StoreConfig(path = s"$dir/store", attrs = Seq(AttrField("v", "int")))
    // same uid ingested twice with far-apart geometry -> two rows whose
    // Morton hashes differ (the duplicate-uid state a double POST creates)
    val ls = Seq(
      featureJson("dup", -170.0, -80.0, """{"v":1}"""),
      featureJson("dup", 170.0, 80.0, """{"v":2}""")) ++
      (0 until 10).map(i => featureJson(s"u$i", -100.0 + i * 20.0, 0.0, s"""{"v":$i}"""))
    FeatureStore.write(FeatureStore.ingest(ls.toDF("raw"), cfg).good, cfg, partitions = 4)
    val hashes = FeatureStore.lookup(spark, cfg, "dup")
      .select("hash").collect().map(_.getInt(0)).toIndexedSeq
    assert(hashes.distinct.size == 2, s"fixture needs two cells, got $hashes")
    FeatureStore.delete(spark, cfg, "dup", hashes)
    assert(FeatureStore.lookup(spark, cfg, "dup").count() == 0,
      "a hash-pruned delete must remove EVERY row of the uid")
    assert(FeatureStore.read(spark, cfg).count() == 10)
  }
}
