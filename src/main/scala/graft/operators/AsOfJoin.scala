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
  * The carried value is ONE STRUCT of the whole right payload — per-column
  * carries would tear rows whenever a payload value is legitimately null
  * (stitching fields from different right rows); the struct is null exactly
  * when the row is a left row, so ignoreNulls skips left rows atomically.
  *
  * Null keys follow JOIN equality semantics (the oracle's `ON` clause):
  * null-keyed right rows match nothing and are dropped; null-keyed left
  * rows come back with null asof columns.
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
    val carryCols = (rightTime +: payload).distinct

    val rStructType = StructType(carryCols.map(c => right.schema(c)))
    val l = left.select(
      (Seq(col(leftKey).as("_k"), col(leftTime).as("_t"), lit(1).as("_side"),
        lit(null).cast(right.schema(rightTieBreak).dataType).as("_tie")) ++
        leftCols.map(col) :+
        lit(null).cast(rStructType).as("_r")): _*)

    val r = right
      .filter(col(rightKey).isNotNull) // null keys join nothing
      .select(
        (Seq(col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_side"),
          col(rightTieBreak).as("_tie")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(carryCols.map(col): _*).as("_r")): _*)

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc, col("_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_last", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select((leftCols.map(col) ++
        carryCols.map(c => col(s"_last.$c").as(s"asof_$c"))): _*)
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
