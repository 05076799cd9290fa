package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the Morton (Z-order) interleave of two
  * tile coordinates — the engine's spatial partition key (reference
  * semantics: `/root/reference/src/main/kotlin/io/marauder/tank/store/
  * zCurve.kt:20-31`).
  *
  * Why an Expression and not composed built-ins: the bit-hack interleave as
  * a built-in expression tree needs 2 shifts + 1 AND + 1 OR *per bit* (a
  * ~130-node tree). That tree gets re-inlined at every use site (e.g. each
  * Z-range disjunct of a tile predicate), blowing up optimizer time and
  * generated-code size. This node stays O(1) in the plan and compiles to a
  * single static call inside whole-stage codegen; evaluation runs the
  * branch-free magic-number spread.
  */
case class MortonHashExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zcurve_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(x: Any, y: Any): Any =
    graft.core.ZCurve.interleaveLong(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.core.ZCurve.interleaveLong($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonHashExpr =
    copy(left = newLeft, right = newRight)
}
