package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of join: for each left row, attach the latest right row with the same
  * key and `rightTime <= leftTime`.
  *
  * Spark has no native as-of join, and the naive formulation
  * (`left JOIN right ON key AND rightTime <= leftTime` + rank) multiplies
  * every left row by its full right history — quadratic blowup on hot keys at
  * 100 TB. This implementation uses the merge trick instead: union both
  * inputs into one stream, shuffle ONCE by key, sort each partition by
  * (time, side), and carry the last-seen right payload forward with a
  * running `last(..., ignoreNulls)` window. Cost: one shuffle + one sort,
  * output exactly |left| rows.
  *
  * Tie rule: a right row at exactly `leftTime` matches (<=); ties among right
  * rows at the same time resolve to the greatest `rightTieBreak`.
  */
object AsOfJoin {

  /** @param payload right-side columns to carry (must exist in `right`) */
  def asof(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: String,
      payload: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    val nullOf: Map[String, Column] =
      right.schema.fields.map(f => f.name -> lit(null).cast(f.dataType)).toMap

    val l = left.select(
      (Seq(col(leftKey).as("_k"), col(leftTime).as("_t"), lit(1).as("_side"),
        lit(null).cast(right.schema(rightTieBreak).dataType).as("_tie")) ++
        leftCols.map(col) ++
        (rightTime +: payload).map(c => nullOf(c).as(s"_r_$c"))): _*)

    val r = right.select(
      (Seq(col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_side"),
        col(rightTieBreak).as("_tie")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        (rightTime +: payload).map(c => col(c).as(s"_r_$c"))): _*)

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc, col("_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = (rightTime +: payload).foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"_last_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }

    carried.filter(col("_side") === 1)
      .select((leftCols.map(col) ++
        (rightTime +: payload).map(c => col(s"_last_$c").as(s"asof_$c"))): _*)
  }

  /** Q10 shape: latest event per order at order time. */
  def latestEventPerOrder(orders: DataFrame, events: DataFrame): DataFrame =
    asof(orders.select("o_orderkey", "o_custkey", "o_orderdate"), events,
      leftKey = "o_custkey", rightKey = "user_id",
      leftTime = "o_orderdate", rightTime = "ts",
      rightTieBreak = "event_id",
      payload = Seq("event_type"))
      .select(col("o_orderkey"), col("o_orderdate"),
        col("asof_ts").as("last_event_ts"),
        col("asof_event_type").as("last_event_type"))
}
