package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Native Catalyst expression mapping a double to its quantile-bin index
  * against a fixed sorted cut array (binary search insertion point) — the
  * z-order clustered write's bin lookup ([[graft.sources.Bucketing
  * .zorderWrite]]).
  *
  * Why an Expression and not a UDF: the bin lookup sits on EVERY row of a
  * table rewrite (at 100 TB, every row of the table); a Scala UDF boxes the
  * input, allocates a Row wrapper and breaks whole-stage codegen at exactly
  * that hot spot. This node rides inside codegen as one static call against
  * a referenced `double[]`. And not a built-in expression tree: 2^bits - 1
  * chained comparisons per column would be a ~500-node tree re-inlined per
  * use.
  */
case class QuantileBinExpr(child: Expression, cuts: Array[Double])
  extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "quantile_bin"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(x: Any): Any =
    QuantileBinExpr.bin(cuts, x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cuts", cuts, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantileBinExpr.bin($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantileBinExpr =
    copy(child = newChild)
}

object QuantileBinExpr {
  /** Bin index = insertion point among the sorted cuts (exact hits belong to
    * the bin ABOVE the cut, matching the UDF this replaces).
    */
  def bin(cuts: Array[Double], x: Double): Int = {
    val i = java.util.Arrays.binarySearch(cuts, x)
    if (i >= 0) i + 1 else -(i + 1)
  }
}
