package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, MapType}

/** Deliberate skew mitigation for hot keys, complementing AQE's runtime
  * skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`) for the cases
  * AQE can't fix: a single key too hot for one task even after splitting, or
  * aggregations (AQE only splits joins).
  *
  * Both helpers salt DETERMINISTICALLY (hash of row content, not `rand()`),
  * so retried/speculated tasks produce identical output — a requirement for
  * exactly-once sinks.
  */
object SkewJoin {

  /** Inner equi-join with the left side salted into `buckets` sub-keys and
    * the right side replicated once per salt value. Hot left keys spread
    * over `buckets` tasks; right-side duplication is bounded by
    * |right| × buckets (keep the right side the smaller relation).
    */
  /** Deterministic salt source: every hashable column. MapType is not a
    * valid xxhash64 input (analysis error) and binary payloads would hash
    * megabytes per row just to pick a bucket — both excluded.
    */
  private def saltSource(df: DataFrame): Seq[Column] =
    df.schema.fields
      .filterNot(f => f.dataType.isInstanceOf[MapType] || f.dataType == BinaryType)
      .map(f => col(f.name)).toSeq match {
      case Nil => Seq(lit(0L)) // nothing hashable: degenerate single bucket
      case cs => cs
    }

  /** The deterministic salt a row of `df` gets in [[saltedJoin]] — exposed
    * so callers/tests can observe how a hot key spreads over sub-keys.
    */
  private[graft] def saltColumn(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(saltSource(df): _*), lit(buckets.toLong)).cast("int")

  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 buckets: Int = 8): DataFrame = {
    val l = left.withColumn("_salt", saltColumn(left, buckets))
    val r = right.withColumn("_salt",
      explode(typedLit((0 until buckets).toList)))
    l.join(r, l(leftKey) === r(rightKey) && l("_salt") === r("_salt"))
      .drop("_salt")
  }

  /** Two-phase salted count: partial count per (key, salt), final sum per
    * key — the hot key's first shuffle spreads over `buckets` reducers.
    * (Spark's hash aggregate already does map-side partials; explicit
    * salting matters when the DISTINCT-ish first-stage state per key is the
    * bottleneck, and documents the pattern for custom aggregations.)
    */
  def saltedCount(df: DataFrame, keyCols: Seq[String],
                  buckets: Int = 8): DataFrame = {
    val salt = pmod(xxhash64(saltSource(df): _*), lit(buckets.toLong))
    df.withColumn("_salt", salt)
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_partial")).as("n"))
  }
}
