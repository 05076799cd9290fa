package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Result canonicalization shared by every oracle-checked query
  * (protocol declared in SURVEY.md §2.6).
  *
  * The driver hash-compares our parquet output against a DuckDB result, so
  * both sides must produce *bit-identical* values and a *total* row order:
  *
  *  - Timestamps are emitted as UTC `yyyy-MM-dd HH:mm:ss` strings.
  *  - Sums/avgs over the 2-decimal money columns are computed on
  *    integer-scaled longs (exact, order-independent — a float sum would
  *    differ between engines at the ULP level because partial-aggregation
  *    order differs) and divided back to double with an identical operation
  *    sequence on both sides.
  *  - Only transcendental outputs (haversine, cosine, ln/exp) are rounded
  *    (4 decimals); everything else is exact and left unrounded.
  *  - Rows are fully ordered by every output column, ASC NULLS FIRST (Spark's
  *    default; DuckDB's default is NULLS LAST so oracle SQL says it
  *    explicitly).
  */
object Canon {

  /** Format timestamp columns, then totally order rows by all columns. */
  def apply(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType | TimestampNTZType =>
          date_format(col(f.name), "yyyy-MM-dd HH:mm:ss").as(f.name)
        case FloatType => col(f.name).cast(DoubleType).as(f.name)
        case _ => col(f.name)
      }
    }
    val sel = df.select(cols.toIndexedSeq: _*)
    sel.orderBy(sel.columns.map(c => col(c).asc_nulls_first).toIndexedSeq: _*)
  }

  /** Eagerly evaluate a BOUNDED final frame (per-lang / per-group
    * aggregates whose row count is group-cardinality-sized, never
    * corpus-sized) into a local relation. Builders that `.persist()`
    * intermediates for multi-consumer DAGs (x115/x117) use this to
    * release the pins before returning: the caller gets finished values,
    * so nothing downstream re-reads the unpersisted relations and the
    * session's CacheManager holds no net entries per invocation
    * (CompositionSpec gates exactly that).
    */
  def materialize(df: DataFrame, maxRows: Int = 100000): DataFrame = {
    val rows = df.collect()
    // defensive cap (ADVICE round-14): this collects to the DRIVER and is
    // only for group-cardinality-sized final frames — a corpus-sized call
    // must fail loudly, not OOM the driver
    require(rows.length <= maxRows,
      s"Canon.materialize collected ${rows.length} rows (max $maxRows): " +
        "this helper is for bounded per-group final frames only — a " +
        "corpus-sized relation must stay distributed")
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }

  /** Exact sum of a 2-decimal money column: sum(round(x*100)::long)/100.0. */
  def moneySum(c: Column): Column =
    sum(round(c * 100).cast(LongType)).cast(DoubleType) / 100.0

  /** Exact mean of a 2-decimal money column; division order matches [[Sql.moneyAvg]]. */
  def moneyAvg(c: Column): Column = moneySum(c) / count(lit(1))

  /** Exact sum of an N-decimal column at the given power-of-ten scale. */
  def scaledSum(c: Column, scale: Long): Column =
    sum(round(c * scale).cast(LongType)).cast(DoubleType) / scale.toDouble
}

/** DuckDB-side twins of the [[Canon]] helpers, emitting SQL text. */
object Sql {

  /** Wrap an inner query with an explicit column list + total order. */
  def canon(inner: String, cols: Seq[String]): String =
    s"SELECT ${cols.mkString(", ")} FROM (\n$inner\n) ORDER BY " +
      cols.map(c => s"$c ASC NULLS FIRST").mkString(", ")

  def ts(col: String): String = s"strftime($col, '%Y-%m-%d %H:%M:%S')"

  def moneySum(col: String): String =
    s"CAST(SUM(CAST(ROUND(($col)*100) AS BIGINT)) AS DOUBLE)/100.0"

  def moneyAvg(col: String): String = s"${moneySum(col)}/COUNT(*)"

  def scaledSum(col: String, scale: Long): String =
    s"CAST(SUM(CAST(ROUND(($col)*$scale) AS BIGINT)) AS DOUBLE)/$scale.0"

  /** Bit-interleave SQL (BIGINT in, BIGINT out): sum of per-bit shifts —
    * linear-size expression, exact integer arithmetic in both engines.
    */
  def interleave(x: String, y: String, bits: Int = 16): String =
    (0 until bits).flatMap(k => Seq(
      s"(((($x) >> $k) & 1) << ${2 * k})",
      s"(((($y) >> $k) & 1) << ${2 * k + 1})")).mkString("(", " + ", ")")
}
