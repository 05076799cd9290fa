package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s"2026-01-0$s:00")

  test("asof attaches the latest right row at-or-before the left time") {
    val left = Seq(
      (10L, 1L, t("1 12:00")), // between e1 and e2
      (11L, 1L, t("1 09:00")), // before any event -> nulls
      (12L, 1L, t("1 15:00")), // exactly at e2 -> e2 (<= tie rule)
      (13L, 2L, t("2 00:00"))  // other key
    ).toDF("order_id", "cust", "otime")
    val right = Seq(
      (100L, 1L, t("1 10:00"), "e1"),
      (101L, 1L, t("1 15:00"), "e2"),
      (102L, 1L, t("1 15:00"), "e2b"), // same-time tie -> greatest tie-break
      (103L, 2L, t("1 23:00"), "e3"),
      (104L, 3L, t("1 01:00"), "zz")   // unrelated key
    ).toDF("event_id", "user", "etime", "etype")

    val res = AsOfJoin.asof(left, right,
      leftKey = "cust", rightKey = "user",
      leftTime = "otime", rightTime = "etime",
      rightTieBreak = "event_id", payload = Seq("etype"))
      .collect().map(r => r.getAs[Long]("order_id") ->
        (Option(r.getAs[Timestamp]("asof_etime")), r.getAs[String]("asof_etype"))).toMap

    assert(res(10L) == ((Some(t("1 10:00")), "e1")))
    assert(res(11L) == ((None, null)), "left row before any right row must get nulls")
    assert(res(12L) == ((Some(t("1 15:00")), "e2b")), "tie must resolve to greatest tie-break")
    assert(res(13L) == ((Some(t("1 23:00")), "e3")))
    assert(res.size == 4, "as-of must emit exactly |left| rows")
  }

  test("asof equals the naive quadratic formulation on random data") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 200).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L)))
      .toDF("lid", "k", "lt")
    val right = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(6) + 1).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L),
        s"p$i"))
      .toDF("rid", "k2", "rt", "payload")

    val fast = AsOfJoin.asof(left, right, "k", "k2", "lt", "rt", "rid", Seq("payload"))
      .select("lid", "asof_rt", "asof_payload")

    // naive: join all earlier rows, keep max (rt, rid)
    val naive = left.join(right,
        left("k") === right("k2") && right("rt") <= left("lt"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lid")
          .orderBy(col("rt").desc_nulls_last, col("rid").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("lid"), col("rt").as("asof_rt"), col("payload").as("asof_payload"))

    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
      "merge-based as-of disagrees with naive formulation")
  }

  test("null payload values carry atomically; null keys join nothing") {
    import spark.implicits._
    val left = Seq((1L, 10L, 5L), (2L, 10L, 5L))
      .toDF("lid", "k", "lt")
      .withColumn("k", when(col("lid") === 2L, lit(null)).otherwise(col("k")))
    val right = Seq(
      (100L, 10L, 1L, Some("a")), // older row with a real payload
      (101L, 10L, 2L, None))      // NEWEST row whose payload is null
      .toDF("rid", "k2", "rt", "payload")
    val got = AsOfJoin.asof(left, right, "k", "k2", "lt", "rt", "rid",
      Seq("payload")).collect().map(r =>
      r.getAs[Long]("lid") -> (Option(r.get(r.fieldIndex("asof_rt"))),
        Option(r.getAs[String]("asof_payload")))).toMap
    // the match is the rt=2 row WITH its null payload — per-column carries
    // would resurrect 'a' from the older row (a row that never existed)
    assert(got(1L) == (Some(2L), None), s"payload torn: ${got(1L)}")
    // a null-keyed left row matches nothing (JOIN equality semantics)
    assert(got(2L) == (None, None), s"null key matched: ${got(2L)}")
  }
}
