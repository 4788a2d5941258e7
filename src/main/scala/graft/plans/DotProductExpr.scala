package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two numeric array columns (float or double
  * elements), accumulating left-to-right in double — bit-identical to
  * the higher-order formulation `aggregate(zip_with(a, b, _*_), 0.0,
  * _+_)` with elements cast to double, which is what keeps the cosine
  * queries DuckDB-oracle hash-comparable (float32 is exact in float64;
  * the summation order is pinned).
  *
  * Why native: higher-order functions are CodegenFallback — each
  * per-pair dot in the similarity joins was interpreted Column
  * machinery allocating an intermediate array per pair. This kernel is
  * a primitive loop inside whole-stage codegen; the similarity tier
  * (brute top-k, LSH/IVF verify, embedding near-dup) all sit on it.
  *
  * Null semantics match the HOF form: mismatched lengths or any null
  * element poison the sum → NULL.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val leftType = left.dataType.asInstanceOf[ArrayType]
  @transient private lazy val rightType = right.dataType.asInstanceOf[ArrayType]

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def read(arr: ArrayData, i: Int, t: ArrayType): Double =
    t.elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if ((leftType.containsNull && a.isNullAt(i)) ||
          (rightType.containsNull && b.isNullAt(i))) return null
      acc += read(a, i, leftType) * read(b, i, rightType)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(v: String, i: String, t: ArrayType) = t.elementType match {
      case FloatType => s"(double) $v.getFloat($i)"
      case _ => s"$v.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bail = ctx.freshName("bail")
      val nullCheck =
        if (leftType.containsNull || rightType.containsNull) {
          val checks = Seq(
            if (leftType.containsNull) Some(s"$a.isNullAt($i)") else None,
            if (rightType.containsNull) Some(s"$b.isNullAt($i)") else None
          ).flatten.mkString(" || ")
          s"if ($checks) { $bail = true; break; }"
        } else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bail = false;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    $nullCheck
         |    $acc += ${getter(a, i, leftType)} * ${getter(b, i, rightType)};
         |  }
         |  if ($bail) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductExpr = copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  /** Column API: native dot product of two array<float|double> columns. */
  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProductExpr(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
