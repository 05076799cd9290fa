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
}
