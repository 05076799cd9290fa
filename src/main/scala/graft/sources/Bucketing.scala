package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins — the shuffle-elimination
  * path for the biggest recurring joins at 100 TB (orders ⋈ lineitem,
  * documents ⋈ embeddings): both sides hash-bucketed on the join key at
  * write time join WITHOUT an Exchange on either side; only the bucket-local
  * sort remains. The bucket count is fixed at write time and should be
  * sized so one bucket of the larger table fits an executor core's share
  * (e.g. 100 TB lineitem at 512 MB/bucket-file ≈ 2^between 14 and 18
  * buckets; testdata uses 8).
  */
object Bucketing {

  /** Write a DataFrame as a bucketed+sorted managed table (idempotent:
    * drops any previous table AND its leftover location first).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + s"/$table")
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucket-count tables on their bucket key; with bucketing
    * enabled (default) Catalyst plans a SortMergeJoin with NO Exchange.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
