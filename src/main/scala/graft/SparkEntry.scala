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

  /** Registry entries that PRODUCE a persisted relation
    * ([[graft.operators.PairStore]]) consumed by later entries: verified
    * pairs (x84/x85 consume x40's; x89 consumes x42's; x110 consumes
    * x104b's edges) and the multimodal fingerprint/landmark kernels
    * (x104/x104b/x120 consume x103's payload fingerprints, x108 consumes
    * x107's frame fingerprints, x112 consumes x111's audio landmarks —
    * round 18: each consumer's oracle already replays the producer's
    * persisted `__VERIFY_OUT__` parquet, so consuming the SAME
    * materialization on the Spark side is the production posture —
    * fingerprint once, resolve many — not a cache trick). Building any
    * registry frame is side-effect-free; a harness that wants the
    * composition (resolution = scan of one materialization, never a
    * pipeline re-run) runs `PairStore.refresh(spark, name, sfDir)(
    * queries(name)(spark, sfDir))` for these BEFORE the consumers — as
    * [[Bench]] does, timing each producer WITH its write — or registers
    * its own written copy of the producer's output — as [[Verify]] does.
    * Declared here (not discovered) so Verify/Bench/tests share one list.
    */
  val pairProducers: Seq[String] =
    Seq("x40_minhash_lsh", "x42_embed_neardup", "x44_simhash",
      "x81_winnow_fps", "x103_payload_phash", "x104b_payload_dupedges",
      "x107_frame_phash", "x111_audio_landmarks")
}
