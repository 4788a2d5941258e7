package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native sign-bit LSH bucket over the first `bits` dimensions of a
  * numeric array: bit i is set iff element i is present, non-null and
  * >= 0 — matching the HOF formulation (zip_with pads a short array
  * with nulls, and null/negative both contribute 0; Spark SQL's `>=`
  * is NaN-safe with NaN ordered ABOVE every number, so a NaN element
  * sets its bit here too). Pinned by a differential spec.
  *
  * Native because bucketing is a linear pass over the whole embedding
  * corpus in the ANN/near-dup tier; the HOF form is CodegenFallback
  * with per-row slice/sequence/pow allocations.
  */
case class SignBucketExpr(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")

  override def dataType: DataType = LongType

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_bucket needs an array<float|double> input, got ${other.simpleString}")
    }

  /** Per-row kernel; public so generated code can call it. */
  def compute(arr: ArrayData): Long = {
    val n = math.min(bits, arr.numElements())
    var code = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        // NaN sets the bit: SQL's >= orders NaN above all numbers
        if (v >= 0 || java.lang.Double.isNaN(v)) code |= 1L << i
      }
      i += 1
    }
    code
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("signBucket", this, classOf[SignBucketExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): SignBucketExpr =
    copy(child = newChild)
}

object SignBucketExpr {
  /** Column API: native sign-bit LSH bucket. */
  def sign_bucket(a: Column, bits: Int): Column =
    GraftColumnBridge.column(SignBucketExpr(GraftColumnBridge.expression(a), bits))
}
