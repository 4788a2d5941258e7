package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Fused int8 asymmetric-distance (ADC) score: for a float/double
  * vector `v` and integer query weights `qw` (e6 micro-units),
  * computes in ONE pass what the HOF formulation spreads over four
  * interpreted array passes (absMax, int8Quantize, zip_with,
  * aggregate) with three intermediate arrays per row:
  *
  *   amax  = max_i |v_i|                      (double)
  *   code_i = ⌊v_i·127/amax + ½⌋              (long; all-zero if amax=0)
  *   score = ⌊amax·10⁴⌋ · Σ_i code_i·qw_i     (long)
  *
  * Pure 64-bit integer result — bit-identical to the q102 DuckDB
  * oracle and to the HOF form (differential spec in FunctionsSpec
  * covers both execution modes). This is the `Similarity.annInt8Adc`
  * hot kernel: the per-row cost at 100 TB is the whole query, and the
  * HOF tax measured 8.1 s on the 100× corpus where this loop runs
  * inside whole-stage codegen with zero allocations.
  *
  * Null semantics: empty vector, length mismatch, or any null element
  * → NULL (the HOF form yields NULL for these via zip_with/aggregate
  * null poisoning; the amax=0 case is NOT null — scores 0). Sole
  * divergence: BOTH arrays empty → HOF folds an empty zip to 0, this
  * kernel returns NULL — a degenerate input annInt8Adc never builds.
  */
case class Int8AdcScoreExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val vecType = left.dataType.asInstanceOf[ArrayType]
  @transient private lazy val qwType = right.dataType.asInstanceOf[ArrayType]

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val qwOk = right.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (vecOk && qwOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int8_adc_score needs (array<float|double>, array<bigint>), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def read(arr: ArrayData, i: Int): Double =
    vecType.elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val q = r.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n == 0 || n != q.numElements()) return null
    var amax = 0.0
    var i = 0
    while (i < n) {
      if ((vecType.containsNull && v.isNullAt(i)) ||
          (qwType.containsNull && q.isNullAt(i))) return null
      val a = math.abs(read(v, i))
      if (a > amax) amax = a
      i += 1
    }
    if (amax == 0.0) return 0L
    var sum = 0L
    i = 0
    while (i < n) {
      sum += math.floor(read(v, i) * 127.0 / amax + 0.5).toLong * q.getLong(i)
      i += 1
    }
    math.floor(amax * 10000.0).toLong * sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getV = vecType.elementType match {
      case FloatType => (v: String, i: String) => s"(double) $v.getFloat($i)"
      case _ => (v: String, i: String) => s"$v.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (v, q) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val amax = ctx.freshName("amax")
      val a = ctx.freshName("a")
      val sum = ctx.freshName("sum")
      val bail = ctx.freshName("bail")
      val nullCheck =
        if (vecType.containsNull || qwType.containsNull) {
          val checks = Seq(
            if (vecType.containsNull) Some(s"$v.isNullAt($i)") else None,
            if (qwType.containsNull) Some(s"$q.isNullAt($i)") else None
          ).flatten.mkString(" || ")
          s"if ($checks) { $bail = true; break; }"
        } else ""
      s"""
         |final int $n = $v.numElements();
         |if ($n == 0 || $n != $q.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $amax = 0.0;
         |  boolean $bail = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $a = Math.abs(${getV(v, i)});
         |    if ($a > $amax) $amax = $a;
         |  }
         |  if ($bail) {
         |    ${ev.isNull} = true;
         |  } else if ($amax == 0.0) {
         |    ${ev.value} = 0L;
         |  } else {
         |    long $sum = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $sum += (long) Math.floor(${getV(v, i)} * 127.0 / $amax + 0.5) * $q.getLong($i);
         |    }
         |    ${ev.value} = (long) Math.floor($amax * 10000.0) * $sum;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Int8AdcScoreExpr = copy(left = newLeft, right = newRight)
}

object Int8AdcScoreExpr {
  /** Column API: fused int8 ADC score of a vector against e6 weights. */
  def int8_adc_score(vec: Column, qwE6: Column): Column =
    GraftColumnBridge.column(
      Int8AdcScoreExpr(GraftColumnBridge.expression(vec), GraftColumnBridge.expression(qwE6)))
}
