package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{SparkEntry, SparkSpec}

/** Golden-file gate for the registry queries the DuckDB oracle can't check
  * (`no_oracle` in CORRECTNESS): their outputs are deterministic (xxhash64
  * seed chains, fixed k-means seeding, fixed kernels), so any drift is a
  * regression. Goldens live in src/test/resources/golden/; regenerate with
  *   sbt "Test/runMain graft.queries.GoldenQueries"
  * after an INTENTIONAL change and review the diff.
  */
object GoldenQueries {

  /** Deterministic no-oracle registry entries (x46/x47 tile/heatmap are
    * already golden-gated through GoldenTilesSpec; x52 is Spark's HLL —
    * approx by contract but deterministic, gated here too).
    */
  val cases: Seq[String] = Seq(
    "x43_ann_lsh", "x43b_ann_ivf", "x44_simhash", "x45_simhash_neardup",
    "x49_fingerprint", "x51_multimodal_features", "x52_approx_distinct")

  def render(spark: SparkSession, name: String): String = {
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    canonical(df)
  }

  /** Canonical text: columns sorted by name; rows already in the query's
    * canonical output order (every registry query ends in a Canon sort).
    */
  def canonical(df: DataFrame): String = {
    val cols = df.columns.sorted
    val proj = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
    val header = cols.mkString("|")
    val rows = proj.collect().map { r =>
      cols.indices.map { i =>
        r.get(i) match {
          case null => "NULL"
          case a: Seq[_] => a.mkString("[", ",", "]")
          case other => String.valueOf(other)
        }
      }.mkString("|")
    }
    (header +: rows).mkString("\n")
  }

  private val GoldenDir = "src/test/resources/golden"

  def goldenPath(name: String) =
    java.nio.file.Paths.get(s"$GoldenDir/query_$name.txt")

  /** Regenerate all query goldens (review the diff before committing!). */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(GoldenDir))
    cases.foreach { name =>
      val text = render(spark, name)
      java.nio.file.Files.writeString(goldenPath(name), text)
      println(s"[golden] wrote query_$name (${text.count(_ == '\n')} rows)")
    }
    spark.stop()
  }
}

class GoldenQueriesSpec extends SparkSpec {
  GoldenQueries.cases.foreach { name =>
    test(s"golden: $name") {
      val path = GoldenQueries.goldenPath(name)
      assert(java.nio.file.Files.exists(path),
        s"golden missing — run: sbt 'Test/runMain graft.queries.GoldenQueries'")
      val want = java.nio.file.Files.readString(path)
      val got = GoldenQueries.render(spark, name)
      assert(got == want,
        s"$name drifted from golden; if intentional regenerate and review")
    }
  }
}
