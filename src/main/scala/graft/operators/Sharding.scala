package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic training-order sharding (x88) — the last materialization
  * step before writing training shards: every doc gets a (shard, pos)
  * address from a hash-derived global shuffle, so the training order is
  * reproducible from doc ids alone (no RNG state, stable under re-runs)
  * and any shard can be re-written independently.
  *
  * shard = md5-bucket of the id (mod the shard count); pos = row_number
  * within the shard in (hash, id) order. The per-shard windows are
  * shard-count-way parallel and each shard's sort IS the shard writer's
  * sort — no global order materializes anywhere.
  *
  * Two entry points for the shard count:
  *  - [[trainOrder]]: a FIXED count (the registry/oracle form — x88 pins
  *    16).
  *  - [[trainOrderBySize]]: the production form — `docsPerShard` sizes the
  *    count as ceil(total / docsPerShard), exactly as x69 derives pack
  *    shards. The total is a one-row aggregate BROADCAST back onto the
  *    scan (the x69 device): no driver-side collect, no second pass
  *    keyed by anything — the corpus is scanned once for the count (an
  *    O(1)-output map-combined aggregate) and once for the addressing.
  */
object Sharding {

  /** (shard, pos) addresses with a fixed shard count. */
  def trainOrder(docs: DataFrame, nShards: Int,
                 idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val h = md5(col(idCol).cast(StringType))
    val shard = (conv(substring(h, 1, 8), 16, 10).cast(LongType)
      % nShards).cast(IntegerType)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    docs.select(col(idCol), h.as("h"), shard.as("shard"))
      .withColumn("pos", row_number().over(w))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** (shard, pos) addresses with the shard count derived from a target
    * shard SIZE: nShards = ceil(total / docsPerShard). Hash buckets are
    * balanced, so realized shard sizes concentrate tightly around
    * `docsPerShard` (binomial, ±O(√docsPerShard)).
    */
  def trainOrderBySize(docs: DataFrame, docsPerShard: Long,
                       idCol: String = "doc_id"): DataFrame = {
    require(docsPerShard >= 1, s"docsPerShard must be >= 1, got $docsPerShard")
    val h = md5(col(idCol).cast(StringType))
    // one-row shard-count relation, broadcast onto the scan (x69 device)
    val nShards = docs.agg(count(lit(1)).as("_n"))
      .select(greatest(lit(1L),
        ceil(col("_n").cast(DoubleType) / docsPerShard).cast(LongType))
        .as("_nshards"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    docs.select(col(idCol), h.as("h"))
      .crossJoin(broadcast(nShards))
      .select(col(idCol), col("h"),
        (conv(substring(col("h"), 1, 8), 16, 10).cast(LongType)
          % col("_nshards")).cast(IntegerType).as("shard"))
      .withColumn("pos", row_number().over(w))
      .select(col(idCol), col("shard"), col("pos"))
  }
}
