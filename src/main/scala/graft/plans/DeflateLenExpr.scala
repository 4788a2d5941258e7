package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native DEFLATE-compressed length of a string's UTF-8 bytes — the
  * compression-ratio quality signal (deflate_len / raw_len) that
  * web-corpus pipelines use as a cheap entropy proxy: near-zero ratios
  * expose machine-generated repetition that token-level gates (q75
  * repetition, q117 entropy over whitespace tokens) can miss when the
  * repetition lives inside long unbroken strings, and near-1 ratios
  * expose binary junk posing as text.
  *
  * Deterministic for a fixed (input, level, strategy, JRE): DEFLATE at
  * a fixed level is a pure function of its input bytes. That makes the
  * signal reproducible across runs and executors, but there is no
  * cross-engine SQL replay (DuckDB has no deflate-length function), so
  * q139 carries a CONTRACT oracle — planted-separation and bound
  * booleans — rather than a value-replay oracle, the q44/q65 pattern.
  *
  * Native rather than a UDF for the usual linear-pass reason: this
  * runs once per document over the whole corpus; the kernel keeps the
  * row inside whole-stage codegen and allocates one scratch buffer per
  * call (the Deflater itself is the dominant cost, not the envelope).
  * Level 6 (zlib default) mirrors what production quality-filter
  * stacks measure.
  */
case class DeflateLenExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len needs a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  /** Per-row kernel; public so generated code can call it. */
  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val d = new java.util.zip.Deflater(6, true) // raw deflate, no zlib header
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("deflateLen", this, classOf[DeflateLenExpr].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateLenExpr =
    copy(child = newChild)
}

object DeflateLenExpr {
  /** Column API: DEFLATE(level 6, raw) byte length of the UTF-8 text. */
  def deflateLen(text: Column): Column =
    GraftColumnBridge.column(DeflateLenExpr(GraftColumnBridge.expression(text)))
}
