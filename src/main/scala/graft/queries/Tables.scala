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

  /** Scale-adaptive scan fan-out for KERNEL-DOMINATED corpus passes — the
    * optimization-guide §2.5 "unsplittable input" case: the testdata
    * corpus ships as single-row-group parquet, so a bare scan plans ONE
    * task and a heavy per-doc kernel (gram/minhash/media UDFs — round-18
    * profiling: x114's gram pass ran 1.4 s on 1 of 32 cores) runs at
    * parallelism 1 while the rest of the session idles. File-split knobs
    * cannot fix this (a row group is the parquet split floor), so when the
    * planned scan parallelism is below half the session default this fans
    * out with ONE deterministic round-robin exchange of the raw rows (at
    * sf0.1 ~600 KB — pennies next to the 30× kernel parallelism it buys).
    * At production scale the input splits naturally (many files / row
    * groups), the predicate holds and NO exchange is added — the 100 TB
    * plan shape is unchanged; filters still push to the scan either way
    * (Catalyst sinks predicates through Repartition).
    *
    * Deliberately OPT-IN per heavy builder, NOT folded into
    * [[documents]]/[[embeddings]]: applied globally it taxed every small
    * incremental probe with 32-task stages (the user repartition's
    * partitioning is exempt from AQE coalescing, so each downstream map
    * stage inherits it — measured 150 → 2,084 tasks on x125 and a ~2×
    * wall regression on the probe family, against real wins only where
    * the per-task kernel dominates).
    */
  def fanOutForKernels(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= target) df
    else df.repartition(target)
  }
}
