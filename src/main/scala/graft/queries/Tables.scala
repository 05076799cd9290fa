package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * `events.ts` is stored as parquet TIMESTAMP(NANOS); we read it with
  * `spark.sql.legacy.parquet.nanosAsLong` and truncate to microseconds —
  * exactly what DuckDB does internally (its TIMESTAMP is
  * microsecond-precision), so both engines observe identical values.
  *
  * The reader branches on the schema it OBSERVED rather than trusting the
  * flag: parquet schema conversion resolves the conf via the thread-local
  * `SQLConf.get`, which under a multi-threaded caller (parallel test
  * suites) can miss a session-conf write from another thread and silently
  * read NANOS as native TIMESTAMP_NTZ instead of BIGINT. Both shapes
  * normalize to the same micro-truncated TIMESTAMP column (session TZ is
  * UTC everywhere, so the NTZ wall time IS the instant), and a fixture
  * table whose `ts` was already rewritten as a plain type round-trips too.
  */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The NTZ branch's cast resolves through the session TZ; pin it here
      // (not just in each entrypoint's builder) so the "session TZ is UTC
      // everywhere" premise holds for ANY caller on a non-UTC box.
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val df = spark.read.parquet(s"$dir/events.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _: org.apache.spark.sql.types.TimestampType => df
        case other => throw new IllegalStateException(
          s"events.ts read as unexpected type $other — expected BIGINT " +
            "nanos (legacy flag honored), TIMESTAMP_NTZ (native nanos " +
            "read), or TIMESTAMP (already-normalized fixture)")
      }
    case other =>
      spark.read.parquet(s"$dir/$other.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** See [[graft.util.Scans.fanOutForKernels]] (kept here as the
    * query-layer alias — the kernel-heavy builders in this package call
    * it on their corpus inputs).
    */
  def fanOutForKernels(df: DataFrame): DataFrame =
    graft.util.Scans.fanOutForKernels(df)
}
