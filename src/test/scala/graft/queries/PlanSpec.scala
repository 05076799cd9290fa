package graft.queries

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** Physical-plan shape gates: the declarative queries must actually compile
  * to the plans the 100 TB posture assumes — filters pushed into the parquet
  * scan, columns pruned, small dimensions broadcast, top-k as
  * TakeOrderedAndProject, and the tile read pruning on the stored hash.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): (DataFrame, String) = {
    val df = graft.SparkEntry.queries(name)(spark, Sf)
    df.count() // materialize so AQE settles on the final plan
    (df, df.queryExecution.executedPlan.toString)
  }

  test("q01: the shipdate filter is pushed into the lineitem scan") {
    val (_, plan) = planOf("q01_agg")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      plan)
  }

  test("q02: only the selected part columns are read") {
    val (_, plan) = planOf("q02_filter")
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("p_partkey") && read.contains("p_type") &&
      !read.contains("p_retailprice"),
      s"column pruning failed: $read")
  }

  test("q04: the region dimension joins via broadcast") {
    val (_, plan) = planOf("q04_broadcast_join")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q05: the 6-table join contains no cartesian product") {
    val (_, plan) = planOf("q05_multijoin")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q06/q07: semi and anti joins stay semi/anti in the physical plan") {
    assert(planOf("q06_semijoin")._2.contains("LeftSemi"))
    assert(planOf("q07_antijoin")._2.contains("LeftAnti"))
  }

  test("q16: global top-k compiles to TakeOrderedAndProject (no full sort)") {
    val (_, plan) = planOf("q16_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("x46: the tile read pushes hash-range predicates into the stored scan") {
    val (_, plan) = planOf("x46_tile")
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThanOrEqual(hash") || plan.contains("Or(And(")),
      plan)
  }

  test("q31: exact dedup is a single hash aggregate, partial then final") {
    val (_, plan) = planOf("q31_dedup_exact")
    assert(plan.contains("HashAggregate"), plan)
    // one shuffle for the group-by (plus at most one for the canonical sort)
    val shuffles = "Exchange".r.findAllIn(plan).length
    assert(shuffles <= 3, s"$shuffles exchanges:\n$plan")
  }
}
