package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaccard similarity of two string-array columns in ONE pass:
  * |A∩B| is counted with a hash set (distinct matches, like
  * `array_intersect`) and |A∪B| is derived as |A|+|B|−|A∩B| over the
  * raw sizes — the exact formula of the Column-level formulation
  * `size(array_intersect(sa,sb)) / (size(sa)+size(sb)-size(array_intersect(sa,sb)))`
  * that this kernel replaces (pinned by a differential spec).
  *
  * Why native: the Column form names `array_intersect` twice, and a
  * join-filter predicate gets no common-subexpression elimination —
  * the most expensive per-pair operation in the near-dup verification
  * join ran twice per candidate pair. Here it is one compiled loop,
  * two hash-set passes, inside whole-stage codegen.
  *
  * A zero denominator (both arrays empty) yields NULL — a pair of
  * empty documents carries no similarity signal, and NULL drops out
  * of a `>= threshold` filter the same way NaN did.
  */
case class ArrayJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"array_jaccard needs array<string> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Per-pair kernel; public so generated code can call it. Returns
    * NaN for the empty/empty pair (mapped to NULL by the callers).
    */
  def compute(l: ArrayData, r: ArrayData): Double = {
    val na = l.numElements()
    val nb = r.numElements()
    if (na + nb == 0) return Double.NaN
    // membership set over the smaller side, probe with the larger:
    // bounds the set size at min(|A|,|B|)
    val (small, nSmall, big, nBig) =
      if (na <= nb) (l, na, r, nb) else (r, nb, l, na)
    val set = new java.util.HashSet[UTF8String](Math.max(4, nSmall * 2))
    var smallHasNull = false
    var i = 0
    while (i < nSmall) {
      if (small.isNullAt(i)) smallHasNull = true
      else set.add(small.getUTF8String(i))
      i += 1
    }
    // count DISTINCT matches from the big side (array_intersect
    // semantics): remove on hit so duplicates in the big side count once
    var inter = 0L
    var bigNullSeen = false
    i = 0
    while (i < nBig) {
      if (big.isNullAt(i)) {
        if (smallHasNull && !bigNullSeen) { inter += 1; bigNullSeen = true }
      } else if (set.remove(big.getUTF8String(i))) inter += 1
      i += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (v.isNaN) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("arrayJaccard", this, classOf[ArrayJaccardExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = $self.compute($a, $b);
         |if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayJaccardExpr = copy(left = newLeft, right = newRight)
}

object ArrayJaccardExpr {
  /** Column API: one-pass Jaccard similarity of two array<string> columns. */
  def array_jaccard(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      ArrayJaccardExpr(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
