package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** The events reader's schema-branching contract: parquet TIMESTAMP(NANOS)
  * reaches Spark as BIGINT only when the legacy nanosAsLong conf is
  * honored at schema-conversion time — under a multi-threaded caller the
  * thread-local SQLConf can miss it and the same file reads as native
  * TIMESTAMP_NTZ. [[Tables]] must normalize EVERY observed shape to the
  * same micro-truncated TIMESTAMP column rather than trusting the flag
  * (the round-9 full-suite race: a fixture written during such a window
  * poisoned every downstream events query).
  */
class TablesSpec extends SparkSpec {

  import spark.implicits._

  test("events.ts long-nanos path truncates to identical micros as the NTZ path") {
    val base = Tables.events(spark, Sf)
    assert(base.schema("ts").dataType == TimestampType)
    val sample = base.orderBy(col("event_id")).limit(5)
      .select(col("event_id"), col("ts")).collect()
    assert(sample.nonEmpty)

    // rewrite the same instants as TIMESTAMP_NTZ (what a dishonored-conf
    // read yields) and read back through Tables: values must be identical
    val dir = java.nio.file.Files.createTempDirectory("graft-tables").toString
    Tables.events(spark, Sf)
      .withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.parquet(s"$dir/events.parquet")
    val ntz = Tables.events(spark, dir)
    assert(ntz.schema("ts").dataType == TimestampType)
    val ntzSample = ntz.orderBy(col("event_id")).limit(5)
      .select(col("event_id"), col("ts")).collect()
    assert(ntzSample.map(_.toSeq).toSeq == sample.map(_.toSeq).toSeq,
      "NTZ-shaped events do not normalize to the long-nanos answer")
  }

  test("an already-normalized TIMESTAMP events fixture passes through unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tables").toString
    Tables.events(spark, Sf).limit(3).write.parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() == 3)
  }

  test("an unexpected ts type fails loudly instead of mis-typing downstream") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tables").toString
    Seq((1L, "oops")).toDF("event_id", "ts")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("unexpected type"))
  }
}
