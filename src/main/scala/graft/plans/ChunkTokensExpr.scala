package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token chunking kernel: tokenize, group into
  * `chunkSize`-aligned chunks (single-space-joined; the last chunk may
  * be shorter), and return ALL chunks in order as
  * `array<struct<chunk_text STRING, n_tokens BIGINT>>` — the array
  * index IS the chunk id. An empty or all-whitespace document returns
  * an empty array (its posexplode emits nothing, matching the
  * explode-groupBy formulation that dropped token-less docs).
  *
  * This replaces `TextOps.chunkTokens`'s
  * posexplode → groupBy(id, pos div k) → array_sort(collect_list)
  * shape: chunking is per-document work, so the token explode, the
  * (id, chunk_id) hash exchange and the per-group sort were never
  * inherent — one codegen'd kernel call per row builds every chunk
  * from the same token walk [[KeepFirstChunksExpr]] uses (that kernel
  * is this one plus a seen-set; their chunk boundaries are pinned to
  * each other by construction). The old aggregate formulation is kept
  * as `chunkTokensAgg`, the differential oracle.
  */
case class ChunkTokensExpr(child: Expression, chunkSize: Int)
    extends UnaryExpression {

  require(chunkSize >= 1, s"chunk size must be >= 1, got $chunkSize")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"chunk_tokens needs a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_text", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false))), containsNull = false)

  /** Per-row kernel; public so generated code can call it. */
  def compute(text: UTF8String): GenericArrayData = {
    val toks = Kernels.wsTokens(text)
    val nChunks = if (toks.isEmpty) 0 else (toks.length + chunkSize - 1) / chunkSize
    val out = new Array[Any](nChunks)
    var c = 0
    while (c < nChunks) {
      val from = c * chunkSize
      val to = math.min(from + chunkSize, toks.length)
      val sb = new java.lang.StringBuilder()
      var j = from
      while (j < to) {
        if (j > from) sb.append(' ')
        sb.append(toks(j)); j += 1
      }
      out(c) = InternalRow(UTF8String.fromString(sb.toString), (to - from).toLong)
      c += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("chunkTokens", this, classOf[ChunkTokensExpr].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkTokensExpr =
    copy(child = newChild)
}

object ChunkTokensExpr {
  /** Column API: ordered `(chunk_text, n_tokens)` chunks of a text
    * column at the given chunk size.
    */
  def chunk_tokens(text: Column, chunkSize: Int): Column =
    GraftColumnBridge.column(
      ChunkTokensExpr(GraftColumnBridge.expression(text), chunkSize))
}
