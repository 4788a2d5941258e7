package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized `count_min_sketch(...)` aggregate result for an
  * item's estimated frequency. The deserialized sketch is cached by
  * CONTENT (reference check first, then length + byte equality): row
  * readers hand back a fresh byte[] copy per evaluation, so a pure
  * reference cache would never hit — the memcmp costs microseconds
  * where re-parsing the sketch costs its full size per row. The usual
  * shape broadcasts ONE sketch across the probe rows, so after the
  * first row every probe is a cache hit.
  */
case class CmsEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_estimate needs (binary sketch, string item), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  private def sketchFor(bytes: Array[Byte]): CountMinSketch = {
    if (!(bytes eq cachedBytes) &&
        (cachedBytes == null || !java.util.Arrays.equals(bytes, cachedBytes))) {
      cachedSketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    cachedSketch
  }

  override def nullSafeEval(sketch: Any, item: Any): Any =
    sketchFor(sketch.asInstanceOf[Array[Byte]])
      .estimateCount(item.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("cmsEstimate", this, classOf[CmsEstimateExpr].getName)
    nullSafeCodeGen(ctx, ev, (s, i) =>
      s"${ev.value} = (Long) $self.nullSafeEval($s, $i);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CmsEstimateExpr = copy(left = newLeft, right = newRight)
}

object CmsEstimateExpr {
  /** Column API: estimated count of `item` in a serialized CMS. */
  def cms_estimate(sketch: Column, item: Column): Column =
    GraftColumnBridge.column(
      CmsEstimateExpr(GraftColumnBridge.expression(sketch), GraftColumnBridge.expression(item)))
}
