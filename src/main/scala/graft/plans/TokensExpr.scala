package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenizer: split on whitespace runs, drop empty
  * tokens (an empty or all-whitespace document tokenizes to []).
  * Pinned to the HOF formulation `TextFunctions.tokensHof` by a
  * differential spec.
  *
  * Native matters twice here: the HOF form is CodegenFallback
  * (interpreted split+filter per evaluation), and the text-quality
  * expressions reference the token array several times per row
  * (tokenCount, stopword hits, language markers) — interpreted
  * evaluation gets NO common-subexpression elimination, so each
  * reference re-tokenized the document. A deterministic native
  * expression is CSE-eligible inside whole-stage codegen, so the
  * document tokenizes once per row however many expressions consume
  * the array.
  */
case class TokensExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ws_tokens needs a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** Per-row kernel; public so generated code can call it. */
  def compute(text: UTF8String): ArrayData = {
    val toks = Kernels.wsTokens(text)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wsTokens", this, classOf[TokensExpr].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokensExpr =
    copy(child = newChild)
}

object TokensExpr {
  /** Column API: native whitespace tokens over a text column. */
  def ws_tokens(text: Column): Column =
    GraftColumnBridge.column(TokensExpr(GraftColumnBridge.expression(text)))
}
