package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.Tables

class BucketingSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    // the testdata tables are tiny, so auto-broadcast would replace the
    // bucket-aligned SMJ; and filter-only bucketed scans get auto-disabled
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
  }

  override def afterAll(): Unit = {
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    super.afterAll()
  }

  test("bucketed orders/lineitem join runs with no Exchange on either side") {
    Bucketing.writeBucketed(Tables.orders(spark, Sf), "orders_b", "o_orderkey")
    Bucketing.writeBucketed(Tables.lineitem(spark, Sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice"),
      "lineitem_b", "l_orderkey")

    val joined = Bucketing.coLocatedJoin(spark, "orders_b", "lineitem_b",
      "o_orderkey", "l_orderkey")
    val n = joined.count()
    assert(n == Tables.lineitem(spark, Sf).count(),
      "every lineitem row must find its order")

    val agg = joined.groupBy("o_orderkey").agg(sum("l_quantity"))
    agg.count()
    val plan = agg.queryExecution.executedPlan.toString
    // bucket-aligned join AND aggregation: no shuffle anywhere
    assert(!plan.contains("Exchange"), s"shuffle found:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"), plan)
  }

  test("bucket pruning: an equality filter reads a single bucket") {
    val df = spark.table("orders_b").filter(col("o_orderkey") === 42L)
    assert(df.count() == 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan)
  }

  test("zorderWrite: every file covers a narrow quad of BOTH columns") {
    val li = graft.queries.Tables.lineitem(spark, Sf)
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString + "/li"
    Bucketing.zorderWrite(li, "l_orderkey", "l_partkey", dir, files = 8)

    val z = spark.read.parquet(dir)
    assert(z.count() == li.count(), "rows must survive the layout change")
    val g = li.agg(min(col("l_orderkey")), max(col("l_orderkey")),
      min(col("l_partkey")), max(col("l_partkey"))).collect()(0)
    val span1 = (g.getLong(1) - g.getLong(0)).toDouble
    val span2 = (g.getLong(3) - g.getLong(2)).toDouble
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == 8, s"expected 8 files, got ${files.length}")
    // a z-ordered file covers a quad region: its min/max footer stats on
    // EACH column span a fraction of the global range — that narrowness is
    // exactly what parquet row-group pruning / a stats-aware reader exploits
    // (a single-column sort would leave the OTHER column's span at ~100%)
    val spans = files.map { f =>
      val r = spark.read.parquet(f).agg(
        min(col("l_orderkey")), max(col("l_orderkey")),
        min(col("l_partkey")), max(col("l_partkey"))).collect()(0)
      ((r.getLong(1) - r.getLong(0)) / span1, (r.getLong(3) - r.getLong(2)) / span2)
    }
    val mean1 = spans.map(_._1).sum / spans.length
    val mean2 = spans.map(_._2).sum / spans.length
    assert(mean1 <= 0.75 && mean2 <= 0.75,
      s"files not clustered: mean spans $mean1 / $mean2 of global, " +
        spans.map { case (a, b) => f"($a%.2f,$b%.2f)" }.mkString(" "))
  }

  test("zorder bin lookup is codegen'd: no interpreted UDF in the write-side plan") {
    import org.apache.spark.sql.GraftBridge
    val li = graft.queries.Tables.lineitem(spark, Sf).limit(1000)
    val Array(cuts1, cuts2) = li.stat.approxQuantile(
      Array("l_orderkey", "l_partkey"), Array(0.25, 0.5, 0.75), 0.001)
    def bin(cuts: Array[Double], c: org.apache.spark.sql.Column) =
      GraftBridge.column(graft.functions.QuantileBinExpr(
        GraftBridge.expression(c), cuts))
    val z = li.withColumn("_z", graft.functions.GeoColumns.mortonHash(
      bin(cuts1, col("l_orderkey").cast("double")),
      bin(cuts2, col("l_partkey").cast("double")), 8))
    val plan = z.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"interpreted UDF in the z-order projection:\n$plan")
    // semantics: the expression equals the plain binary-search bin per row
    val rows = z.select(col("l_orderkey").cast("double"), col("_z")).collect()
    rows.take(50).foreach { r =>
      val b1 = graft.functions.QuantileBinExpr.bin(cuts1, r.getDouble(0))
      assert(b1 >= 0 && b1 <= cuts1.length)
    }
  }

  test("writeBucketed honors a database created with a custom LOCATION") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft-customdb").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS customloc LOCATION '$dbDir'")
    try {
      Bucketing.writeBucketed(Tables.region(spark, Sf), "customloc.region_b", "r_regionkey", buckets = 2)
      assert(spark.table("customloc.region_b").count() == 5)
      // the data landed under the DB's custom location, not the warehouse guess
      val files = new java.io.File(s"$dbDir/region_b").listFiles()
      assert(files != null && files.exists(_.getName.endsWith(".parquet")),
        s"table files not under custom location $dbDir")
      // idempotent re-write cleans the REAL location (stale files would
      // double the row count under a wrong-location cleanup)
      Bucketing.writeBucketed(Tables.region(spark, Sf), "customloc.region_b", "r_regionkey", buckets = 2)
      assert(spark.table("customloc.region_b").count() == 5)
      // 3-part session-catalog name resolves too
      Bucketing.writeBucketed(Tables.region(spark, Sf),
        "spark_catalog.customloc.region_b", "r_regionkey", buckets = 2)
      assert(spark.table("customloc.region_b").count() == 5)
    } finally spark.sql("DROP DATABASE IF EXISTS customloc CASCADE")
  }

  test("writeBucketed refuses to destroy an EXTERNAL table's location by default") {
    // register an external table OVER a shared source-data directory — the
    // exact setup where deleting the resolved location would destroy data
    // the catalog never managed
    val srcDir = java.nio.file.Files.createTempDirectory("graft-extsrc").toString
    Tables.region(spark, Sf).write.mode("overwrite").parquet(srcDir)
    spark.sql(s"CREATE TABLE region_ext USING parquet LOCATION '$srcDir'")
    try {
      val e = intercept[IllegalArgumentException] {
        Bucketing.writeBucketed(Tables.region(spark, Sf), "region_ext", "r_regionkey", buckets = 2)
      }
      assert(e.getMessage.contains("EXTERNAL"), e.getMessage)
      // the source data is intact and the table still reads
      assert(spark.read.parquet(srcDir).count() == 5)
      assert(spark.table("region_ext").count() == 5)
      // the explicit escape hatch still works (location then disposable)
      Bucketing.writeBucketed(Tables.region(spark, Sf), "region_ext",
        "r_regionkey", buckets = 2, replaceExternal = true)
      assert(spark.table("region_ext").count() == 5)
    } finally spark.sql("DROP TABLE IF EXISTS region_ext")
  }
}
