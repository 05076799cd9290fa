package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` Column/Expression conversions for the
  * graft library's native Catalyst expressions (the supported pattern for
  * third-party expression libraries on Spark 4's ColumnNode API).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `types.AbstractDataType` is `private[sql]`; third-party expressions
    * overriding `ExpectsInputTypes.inputTypes` need the type in their
    * signature — this public alias (legal from inside the sql package)
    * lets them state it.
    */
  type SqlAbstractDataType = org.apache.spark.sql.types.AbstractDataType

  /** The physical location the session catalog resolves `table` to: the
    * existing table's ACTUAL location when it exists (correct for databases
    * created with a custom LOCATION), else the catalog's default path for
    * the identifier. Accepts 1-, 2-, and `spark_catalog.`-prefixed 3-part
    * names.
    */
  def tableLocation(spark: SparkSession, table: String): java.net.URI = {
    val (cat, ident) = resolve(spark, table)
    if (cat.tableExists(ident)) cat.getTableMetadata(ident).location
    else cat.defaultTablePath(ident)
  }

  /** True iff `table` exists and is an EXTERNAL table — i.e. its location
    * is caller-owned data the catalog does NOT manage (dropping the table
    * keeps the files; deleting the location destroys shared source data).
    */
  def isExternalTable(spark: SparkSession, table: String): Boolean = {
    val (cat, ident) = resolve(spark, table)
    cat.tableExists(ident) && cat.getTableMetadata(ident).tableType ==
      org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL
  }

  private def resolve(spark: SparkSession, table: String)
      : (org.apache.spark.sql.catalyst.catalog.SessionCatalog,
         org.apache.spark.sql.catalyst.TableIdentifier) = {
    val ss = spark.asInstanceOf[classic.SparkSession]
    val parts0 = ss.sessionState.sqlParser.parseMultipartIdentifier(table)
    val parts =
      if (parts0.length == 3 && parts0.head.equalsIgnoreCase("spark_catalog"))
        parts0.tail
      else parts0
    require(parts.length <= 2 && parts.nonEmpty,
      s"cannot resolve a session-catalog location for '$table'")
    val ident = parts match {
      case Seq(t) => org.apache.spark.sql.catalyst.TableIdentifier(t)
      case Seq(db, t) => org.apache.spark.sql.catalyst.TableIdentifier(t, Some(db))
    }
    (ss.sessionState.catalog, ident)
  }

  /** Register a native-expression function on a live session (the
    * config-time path is [[graft.functions.GraftExtensions]]).
    */
  def registerFunction(
      spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(ident, info, builder)
}
