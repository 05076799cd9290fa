package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ApproxSpec extends SparkSpec {

  test("approx_count_distinct stays within 5% of exact at rsd=0.02") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), rsd = 0.02).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx $a vs exact $e")
    }
  }
}
