package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Σ floor(c·ln(c)·10⁶) over a document's unigram counts — the
  * per-row entropy kernel behind the q117 information-density gate
  * (entropy = floor(ln N·10⁶) − this DIV N, all integer ops).
  *
  * Native is not an optimization here but a requirement: the HOF
  * formulation (`TextFunctions.unigramClogcE6Hof`) captures the sorted
  * token array inside lambda bodies, and Catalyst INLINES the captured
  * expression tree into each lambda — the array is re-sorted for every
  * element, turning an O(L log L) row into O(L² log L). Measured at
  * the 10× corpus: 142 s for the HOF form vs sub-second for this
  * kernel (the q102 fused-ADC finding, one tier worse). One tokenize,
  * one sort, one linear run-length pass per row; the term arithmetic
  * `floor((c · ln c) · 10⁶)` is evaluated in exactly the oracle's
  * association order, so results stay bit-equal to DuckDB's relational
  * form (the q88 determinism pattern).
  *
  * Sort order is irrelevant to correctness — only equal-run GROUPING
  * matters — so the kernel uses plain Java string order without
  * matching any engine's collation.
  */
case class UnigramClogcE6Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unigram_clogc_e6 needs a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  /** Per-row kernel; public so generated code can call it. Returns 0
    * for an empty/whitespace-only document (no runs — the Column
    * wrapper decides null semantics).
    */
  def compute(text: UTF8String): Long = {
    val toks = Kernels.wsTokens(text)
    java.util.Arrays.sort(toks, null: java.util.Comparator[String])
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      var j = i + 1
      while (j < toks.length && toks(j) == toks(i)) j += 1
      val run = j - i
      if (run > 1) {
        val c = run.toDouble
        acc += Math.floor(c * Math.log(c) * 1000000.0).toLong
      }
      i = j
    }
    acc
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("clogc", this, classOf[UnigramClogcE6Expr].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramClogcE6Expr =
    copy(child = newChild)
}

object UnigramClogcE6Expr {
  /** Column API: native Σ floor(c·ln c·10⁶) over a text column's
    * unigram counts.
    */
  def unigram_clogc_e6(text: Column): Column =
    GraftColumnBridge.column(UnigramClogcE6Expr(GraftColumnBridge.expression(text)))
}
