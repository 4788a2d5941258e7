package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count, for each of `sets`, how many whitespace tokens of the input
  * text are members — ONE tokenization and one pass over the tokens
  * for all sets together. Output: array<long>, one count per set, in
  * declaration order. Semantics per set are pinned to
  * `size(filter(tokens(text), t => t.isInCollection(set)))` by a
  * differential spec.
  *
  * This closes the last interpreted per-row pass in the text-quality
  * family: stopword ratio and the 4-language marker scorer each ran a
  * CodegenFallback `filter` lambda over the token array — five
  * interpreted walks per document. Here the walk is one compiled loop
  * with hash-set membership.
  */
case class TokenSetHitsExpr(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {

  require(sets.nonEmpty, "at least one token set required")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_set_hits needs a string input, got ${child.dataType.simpleString}")

  @transient private lazy val hashSets: Array[java.util.HashSet[String]] =
    sets.map { s =>
      val hs = new java.util.HashSet[String]()
      s.foreach(hs.add)
      hs
    }.toArray

  /** Per-row kernel; public so generated code can call it. */
  def compute(text: UTF8String): GenericArrayData = {
    val toks = Kernels.wsTokens(text)
    val counts = new Array[Long](hashSets.length)
    var i = 0
    while (i < toks.length) {
      var s = 0
      while (s < hashSets.length) {
        if (hashSets(s).contains(toks(i))) counts(s) += 1
        s += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokenSetHits", this, classOf[TokenSetHitsExpr].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetHitsExpr =
    copy(child = newChild)
}

object TokenSetHitsExpr {
  /** Column API: per-set token membership counts over a text column. */
  def token_set_hits(text: Column, sets: Seq[Seq[String]]): Column =
    GraftColumnBridge.column(
      TokenSetHitsExpr(GraftColumnBridge.expression(text), sets))
}
