package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy single-pass boilerplate-span removal: scan the token stream
  * left to right; when the n-token window starting at the cursor is in
  * the flagged-span set, skip those n tokens, else emit one token and
  * advance. Rebuilds the document single-space-joined.
  *
  * Deliberately SINGLE-pass (the production boilerplate-strip
  * semantic): removal can create new adjacencies that themselves form
  * a flagged span, and those survive — iterating to a fixpoint is
  * unbounded and no curation pipeline does it. The DuckDB oracle
  * replays this exact walk with a recursive CTE (the q97
  * replay-the-procedure precedent), so the catalog entry is
  * hash-checked against an independent implementation of the same
  * greedy scan.
  *
  * The flagged set is a STATIC constructor parameter (the
  * TokenSetHitsExpr convention): the span table is bounded by
  * construction (top-k per source), so the caller collects it and
  * bakes it into the expression — a per-row hash-set probe, no join.
  * Spans whose token count ≠ n can never equal an n-token window
  * (different space counts), so passing them is harmless.
  */
case class BoilerplateStripExpr(child: Expression, spans: Seq[String], n: Int)
    extends UnaryExpression {

  require(n >= 1, s"window size must be >= 1, got $n")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"boilerplate_strip needs a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  @transient private lazy val spanSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, spans.size * 2))
    spans.foreach(s.add)
    s
  }

  /** Per-row kernel; public so generated code can call it. */
  def compute(text: UTF8String): UTF8String = {
    val toks = Kernels.wsTokens(text)
    if (toks.isEmpty) return UTF8String.EMPTY_UTF8
    val kept = new java.lang.StringBuilder(text.numBytes())
    var i = 0
    while (i < toks.length) {
      val windowFits = i + n <= toks.length
      val hit = windowFits && {
        val sb = new java.lang.StringBuilder()
        var j = i
        while (j < i + n) {
          if (j > i) sb.append(' ')
          sb.append(toks(j)); j += 1
        }
        spanSet.contains(sb.toString)
      }
      if (hit) i += n
      else {
        if (kept.length() > 0) kept.append(' ')
        kept.append(toks(i))
        i += 1
      }
    }
    UTF8String.fromString(kept.toString)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("strip", this, classOf[BoilerplateStripExpr].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): BoilerplateStripExpr =
    copy(child = newChild)
}

object BoilerplateStripExpr {
  /** Column API: greedy single-pass removal of the given n-token
    * spans from a text column.
    */
  def boilerplate_strip(text: Column, spans: Seq[String], n: Int = 4): Column =
    GraftColumnBridge.column(
      BoilerplateStripExpr(GraftColumnBridge.expression(text), spans, n))
}
