package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{And, Expression, GreaterThanOrEqual, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}
import graft.core.ZRange

/** `in_tile(hash, z, x, y)` — true iff a Morton hash falls inside the
  * Z-range cover of slippy tile (z, x, y) at hash level 13. The declarative
  * spatial predicate of the engine: users write the *intent* ("rows of this
  * tile") and [[TilePredicateRewrite]] lowers it to plain hash-range
  * comparisons that Catalyst pushes into the parquet scan — the optimizer-
  * rule equivalent of the reference's hand-coded Z-range enumeration
  * (`application.kt:371-400`).
  *
  * Evaluation (interpreted fallback, for non-literal tile coords) computes
  * the cover per call; the rewrite is the hot path.
  */
case class InTileExpr(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "in_tile"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 4 &&
      (children.head.dataType == LongType || children.head.dataType == IntegerType) &&
      children.tail.forall(_.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (INT|BIGINT hash, INT z, INT x, INT y)")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val h = children(0).eval(input)
    if (h == null) return null
    // null z/x/y must null-propagate: a bare asInstanceOf[Int] on null
    // yields 0 and would silently test tile (z, x, 0)
    val zv = children(1).eval(input)
    val xv = children(2).eval(input)
    val yv = children(3).eval(input)
    if (zv == null || xv == null || yv == null) return null
    val z = zv.asInstanceOf[Int]
    val x = xv.asInstanceOf[Int]
    val y = yv.asInstanceOf[Int]
    val hv = h match {
      case i: Int => i.toLong
      case l: Long => l
    }
    ZRange.coverWithBuffer(z, x, y, InTileExpr.HashLevel)
      .exists { case (lo, hi) => hv >= lo && hv <= hi }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InTileExpr = copy(children = newChildren)
}

object InTileExpr {
  val HashLevel = 13

  /** The pushable form: OR of BETWEENs over the tile's Morton cover.
    * Range literals take the hash column's own type so the comparison stays
    * cast-free (a cast would block parquet filter pushdown).
    */
  def toRangePredicate(hash: Expression, z: Int, x: Int, y: Int): Expression = {
    val lit: Int => Literal = hash.dataType match {
      case LongType => v => Literal(v.toLong)
      case _ => v => Literal(v)
    }
    ZRange.coverWithBuffer(z, x, y, HashLevel)
      .map { case (lo, hi) =>
        And(
          GreaterThanOrEqual(hash, lit(lo)),
          LessThanOrEqual(hash, lit(hi))): Expression
      }
      .reduceLeft(Or(_, _))
  }
}

/** Optimizer rule lowering literal-coordinate [[InTileExpr]] predicates to
  * range comparisons (injected via [[GraftExtensions]]); non-literal coords
  * keep the interpreted form.
  */
object TilePredicateRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case InTileExpr(Seq(hash, Literal(z: Int, IntegerType),
          Literal(x: Int, IntegerType), Literal(y: Int, IntegerType))) =>
        InTileExpr.toRangePredicate(hash, z, x, y)
    }
}
