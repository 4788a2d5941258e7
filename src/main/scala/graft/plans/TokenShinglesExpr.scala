package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native token n-gram shingling: whitespace tokenize (empty tokens
  * dropped), then space-joined n-gram shingles; a doc shorter than n
  * yields ONE shingle of all its tokens (an empty doc yields [""]).
  * Pinned to the HOF formulation `Dedup.shinglesHof` by a differential
  * spec.
  *
  * Native because shingling feeds exploding joins (decontamination,
  * n-gram stats) and the hash kernels: the HOF CASE references the
  * token array four times, and with higher-order functions being
  * CodegenFallback (no CSE), split/filter re-ran 4× per row.
  */
case class TokenShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_shingles needs a string input, got ${child.dataType.simpleString}")

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** Per-row kernel; public so generated code can call it. */
  def compute(text: UTF8String): ArrayData = {
    val toks = Kernels.wsTokens(text)
    val nTok = toks.length
    var i = 0
    if (nTok < n) {
      new GenericArrayData(Array[Any](UTF8String.fromString(toks.mkString(" "))))
    } else {
      val out = new Array[Any](nTok - n + 1)
      val sb = new java.lang.StringBuilder
      i = 0
      while (i + n <= nTok) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(i + k))
          k += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokenShingles", this, classOf[TokenShinglesExpr].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenShinglesExpr =
    copy(child = newChild)
}

object TokenShinglesExpr {
  /** Column API: native token n-gram shingles over a text column. */
  def token_shingles(text: Column, n: Int): Column =
    GraftColumnBridge.column(TokenShinglesExpr(GraftColumnBridge.expression(text), n))
}
