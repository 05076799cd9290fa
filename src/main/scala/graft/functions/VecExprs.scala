package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static float-vector kernels shared by the interpreted and generated
  * paths of [[CosineSimExpr]]/[[DotProductExpr]]. Operate directly on
  * Catalyst [[ArrayData]] — no Seq[Float] materialization, no boxing.
  * Summation order is left-to-right over doubles, IDENTICAL to the UDF
  * kernels these expressions replace (and to the DuckDB oracles'
  * index-ordered SUM), so scores stay bit-equal. Null elements are not
  * supported (the embedding columns are dense; the UDF form would have
  * NPE'd on them too).
  */
object VecKernels {
  // a null SLOT would read as 0.0f through getFloat — a silently-wrong
  // similarity score. Fail loudly instead (the Seq[Float] UDFs these
  // kernels replaced NPE'd on the same input; parquet embedding columns
  // arrive as containsNull=true even when dense, so the type check alone
  // cannot reject this).
  private def badNull(i: Int): Nothing =
    throw new IllegalArgumentException(
      s"null element at index $i in a float vector — dense embeddings " +
        "required (cosine_sim/dot_f would otherwise score it as 0.0)")

  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) badNull(i)
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) badNull(i)
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }
}

private[functions] trait FloatVecBinaryExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT>, ARRAY<FLOAT>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
}

/** Cosine similarity of two float vectors as a native codegen'd expression.
  *
  * Why an Expression and not the UDF kernel it replaces: a Scala UDF forces
  * ArrayData → Seq[Float] conversion (allocation + boxing per row) and
  * breaks whole-stage codegen at every scoring site — the innermost loop of
  * the ANN/kNN plans. This node reads ArrayData in place and compiles to
  * one static call inside the generated code; the k-similarity scoring
  * stage stays in one WholeStageCodegen span.
  */
case class CosineSimExpr(left: Expression, right: Expression)
  extends FloatVecBinaryExpr {

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecKernels.cosineF($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two float vectors (codegen'd; see [[CosineSimExpr]]). */
case class DotProductExpr(left: Expression, right: Expression)
  extends FloatVecBinaryExpr {

  override def prettyName: String = "dot_f"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecKernels.dotF($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}
