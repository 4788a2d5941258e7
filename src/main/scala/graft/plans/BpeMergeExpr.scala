package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge round applied to a symbol sequence: every adjacent
  * (left, right) pair is replaced by the concatenation, greedy
  * leftmost non-overlapping (after a merge the scan resumes AFTER the
  * merged pair — the standard byte-pair-encoding application order,
  * and exactly what SQL `replace` does on the sentinel-delimited
  * form, which is how the q125 oracle replays it).
  *
  * Native because merge application runs |merge table| times over the
  * word-frequency basis during training: the HOF fold form
  * (`TextFunctions.bpeMergeHof`, the differential oracle) copies the
  * accumulator array per element — O(|word|²) allocations per word
  * per round, against this kernel's single output buffer.
  *
  * Null semantics: null array → null; null ELEMENTS cannot merge
  * (either side null → no match) and pass through.
  */
case class BpeMergeExpr(child: Expression, left: String, right: String)
    extends UnaryExpression {

  require(left.nonEmpty && right.nonEmpty, "merge pair sides must be non-empty")

  override def dataType: DataType = ArrayType(StringType,
    child.dataType.asInstanceOf[ArrayType].containsNull)

  @transient private lazy val l = UTF8String.fromString(left)
  @transient private lazy val r = UTF8String.fromString(right)
  @transient private lazy val lr = UTF8String.fromString(left + right)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge needs an array<string> input, got ${other.simpleString}")
  }

  /** Per-row kernel; public so generated code can call it. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (i + 1 < n && cur != null && !arr.isNullAt(i + 1) &&
          cur.equals(l) && arr.getUTF8String(i + 1).equals(r)) {
        out.add(lr)
        i += 2
      } else {
        out.add(cur)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeMerge", this, classOf[BpeMergeExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeExpr =
    copy(child = newChild)
}

object BpeMergeExpr {
  /** Column API: one greedy BPE merge round over a symbol array. */
  def bpe_merge(syms: Column, left: String, right: String): Column =
    GraftColumnBridge.column(
      BpeMergeExpr(GraftColumnBridge.expression(syms), left, right))
}
