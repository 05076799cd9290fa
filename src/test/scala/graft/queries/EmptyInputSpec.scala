package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Robustness gate: every registry query must run (not throw) against a
  * zero-row corpus — at 100 TB, empty partitions, empty filters and
  * freshly-created tables are routine, and a driver-side `.first()`/`max`
  * on an empty aggregate is a latent crash. Empty twins of every table are
  * written once per suite from the sf0.001 schemas.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    // raw reads (no Tables post-processing) so events keeps its long-nanos
    // ts column shape and the empty twin round-trips through Tables
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$Sf/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  // CRUD queries build their own feature-store fixture (not table-driven)
  // and x46/x47 materialize a spatial store — exercised elsewhere; the
  // registry minus those must all tolerate empty inputs.
  private val skip = Set("q36a_lookup", "q36b_delete", "q36c_update",
    "x46_tile", "x47_heatmap")

  SparkEntry.queries.keys.filterNot(skip).foreach { name =>
    test(s"$name runs on empty tables") {
      val n = SparkEntry.queries(name)(spark, emptyDir).count()
      assert(n >= 0)
    }
  }

  // single-row twins hit a different edge set: window frames of one,
  // self-joins with one candidate, argmax/percentile on singletons,
  // divisions whose denominators come from a lone row
  private lazy val oneRowDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-one").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$Sf/$t.parquet").limit(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.queries.keys.filterNot(skip).foreach { name =>
    test(s"$name runs on single-row tables") {
      val n = SparkEntry.queries(name)(spark, oneRowDir).count()
      assert(n >= 0)
    }
  }

  // null-payload twins: a single documents row whose text is NULL and a
  // single embeddings row whose vector is NULL — the edge the other two
  // batteries cannot reach (kernels and HOFs must null-propagate, not
  // NPE; at 100 TB a crawl shard with null bodies is routine)
  private lazy val nullPayloadDir: String = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-nullpay").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val one = spark.read.parquet(s"$Sf/$t.parquet").limit(1)
      val out = t match {
        case "documents" =>
          one.withColumn("text", lit(null).cast("string"))
        case "embeddings" =>
          one.withColumn("embedding", lit(null).cast("array<float>"))
        case _ => one
      }
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.queries.keys.filterNot(skip).foreach { name =>
    test(s"$name runs on null-payload tables") {
      val n = SparkEntry.queries(name)(spark, nullPayloadDir).count()
      assert(n >= 0)
    }
  }

  // duplicate-row twins: every table's first two rows repeated verbatim —
  // the recrawl reality (overlapping crawl shards re-deliver identical
  // rows with identical ids). Joins fan out, "unique key" assumptions
  // break, groupBy cardinalities halve — none of it may throw
  private lazy val dupRowDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-duprow").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val two = spark.read.parquet(s"$Sf/$t.parquet").limit(2)
      two.union(two).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.queries.keys.filterNot(skip).foreach { name =>
    test(s"$name runs on duplicate-row tables") {
      val n = SparkEntry.queries(name)(spark, dupRowDir).count()
      assert(n >= 0)
    }
  }

  // hostile-text twins: a documents row whose text exercises the string
  // edges a 100 TB web crawl actually contains — astral-plane code points
  // (surrogate PAIRS in Java's UTF-16: any kernel indexing by char and
  // slicing by code point is one off-by-one from a
  // StringIndexOutOfBounds), ZWJ emoji sequences, RTL scripts, zero-width
  // joiners, combining marks, control chars, CJK, and a long
  // no-whitespace run (a "document" that is one giant token)
  private lazy val hostileTextDir: String = {
    import org.apache.spark.sql.functions._
    val hostile = "𝔘𝔫𝔦 " + // 𝔘𝔫𝔦 astral
      "👩‍👩‍👧 " + // ZWJ family
      "مرحبا שלום " + // RTL
      "étude café 中文测试 " + // combining+CJK
      "​‍﻿ ctrlchars " +
      ("x" * 5000) + " tail tokens after the run"
    val dir = java.nio.file.Files.createTempDirectory("graft-hostile").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val one = spark.read.parquet(s"$Sf/$t.parquet").limit(1)
      val out = t match {
        case "documents" => one.withColumn("text", lit(hostile))
        case _ => one
      }
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.queries.keys.filterNot(skip).foreach { name =>
    test(s"$name runs on hostile-text tables") {
      val n = SparkEntry.queries(name)(spark, hostileTextDir).count()
      assert(n >= 0)
    }
  }

  // null-LANG twins: the near-dup leg drops null-lang docs BY DESIGN
  // (three-valued-logic parity with the oracle's lang equi-join) — but a
  // crawl doc with no language tag must still receive a TRIAGE VERDICT
  // through the status/gram legs, never vanish from the verdict relation
  private lazy val nullLangDir: String = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-nulllang").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val in = spark.read.parquet(s"$Sf/$t.parquet")
      val out = if (t == "documents")
        in.withColumn("lang", lit(null).cast("string")) else in
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  Seq("x125_crawl_triage", "x126_crawl_triage_cascade",
      "x127_crawl_triage_derived").foreach { name =>
    test(s"$name: null-lang batch docs still receive a verdict " +
        "(status leg), not silence") {
      val out = SparkEntry.queries(name)(spark, nullLangDir)
        .select("doc_id", "verdict", "best_jaccard").collect()
      val batchIds = TextOps.x86Split(spark, nullLangDir)._2
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(batchIds.nonEmpty, "fixture produced an empty crawl batch")
      assert(out.map(_.getLong(0)).toSet == batchIds,
        "triage dropped docs instead of giving every batch doc a verdict")
      val verdicts = Set("drop_exact", "drop_near", "strip_spans", "keep")
      assert(out.forall(r => verdicts(r.getString(1))))
      // the near-dup leg is silent on null-lang docs (design pin):
      // best_jaccard reads 0 everywhere, never null
      assert(out.forall(r => r.getDouble(2) == 0.0),
        "null-lang docs produced near-dup scores")
    }
  }
}
