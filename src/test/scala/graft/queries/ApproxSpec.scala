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

  test("x122: GK sketch values sit within the pinned 2εN rank bounds") {
    val rows = Relational.x122_approx_quantile_gate
      .build(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Int]("within_rank_bound") == 1,
        s"${r.getAs[String]("pct")}: sketch outside its rank-error bound " +
          s"(lo=${r.getAs[Long]("lo_cents")} hi=${r.getAs[Long]("hi_cents")})")
      // the bracketing order statistics must themselves bracket the target
      assert(r.getAs[Long]("lo_cents") <= r.getAs[Long]("exact_cents") &&
        r.getAs[Long]("exact_cents") <= r.getAs[Long]("hi_cents"))
    }
  }
}
