package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen'd membership probe against a BROADCAST array of
  * per-bucket bloom filters ([[graft.sources.KeyBloom]]'s layout):
  * `left` = the key (LONG — the gram store — or BINARY — the md5 hash
  * store), `right` = its table-bucket id
  * ([[graft.sources.KeyBloom.bucketIdCol]] — itself codegen'd
  * `pmod(murmur3, n)`), result = whether bucket `right`'s bloom might
  * contain `left`.
  *
  * Why an Expression and not the interpreted UDF it replaces: the bloom
  * cut runs once per BATCH KEY on the incremental-probe hot path (crawl
  * cadence — every arriving document's every distinct gram); the Scala
  * UDF boxed each key, allocated a Row wrapper and broke whole-stage
  * codegen exactly there. This node rides inside codegen as one array
  * index + `mightContainLong` call, and holds the blooms by BROADCAST
  * handle — the (possibly ~100 MB) filter bytes ship to each executor
  * once per store generation via torrent blocks, not per task inside the
  * serialized plan.
  */
case class BloomBucketMightContain(left: Expression, right: Expression,
    blooms: Broadcast[Array[BloomFilter]])
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "keybloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType == LongType || left.dataType == BinaryType) &&
        right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT|BINARY key, INT bucket), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  @transient private lazy val arr: Array[BloomFilter] = blooms.value

  override protected def nullSafeEval(key: Any, bucket: Any): Any =
    left.dataType match {
      case LongType => arr(bucket.asInstanceOf[Int])
        .mightContainLong(key.asInstanceOf[Long])
      case _ => arr(bucket.asInstanceOf[Int])
        .mightContainBinary(key.asInstanceOf[Array[Byte]])
    }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("keybloomBc", blooms,
      "org.apache.spark.broadcast.Broadcast")
    val arrVar = ctx.addMutableState(
      "org.apache.spark.util.sketch.BloomFilter[]", "keyblooms",
      v => s"$v = (org.apache.spark.util.sketch.BloomFilter[]) " +
        s"$bcRef.value();")
    val call =
      if (left.dataType == LongType) "mightContainLong"
      else "mightContainBinary"
    nullSafeCodeGen(ctx, ev, (k, b) =>
      s"${ev.value} = $arrVar[$b].$call($k);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomBucketMightContain =
    copy(left = newLeft, right = newRight)
}
