package graft

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Ordered registry of every verifiable query (SURVEY.md §2.6 inventory +
    * x-extensions). Each has a Spark builder; most also carry a DuckDB
    * oracle.
    */
  val registry: Seq[QueryDef] =
    Relational.defs ++ EventWindows.defs ++ Spatial.defs ++
      TextOps.defs ++ VectorOps.defs ++ CurationOps.defs ++ Crud.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(registry.map(q => q.name -> q.build): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ListMap(registry.collect { case QueryDef(n, _, Some(sql)) => n -> sql }: _*)
}
