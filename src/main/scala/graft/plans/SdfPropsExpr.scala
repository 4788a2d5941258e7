package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SDF `> <TAG>` property-block parser: one record's text in,
  * map<string,string> out. Same semantics as `SdfReader.parseProps`
  * (the Scala-function form, kept as the differential oracle):
  * multi-line values joined with \n and trimmed, malformed `>` lines
  * without a `<TAG>` skipped, later duplicate tags overwrite in first
  * position, molblock before the property section ignored.
  *
  * Native because SDF parsing is the reference workload's hottest
  * per-record path (billions of molecule blocks at full corpus
  * scale): a `udf(...)` pays the Catalyst converter boundary — the
  * result Map is built as Scala objects, then deep-converted to
  * catalyst MapData per record. This expression builds the catalyst
  * map directly.
  */
case class SdfPropsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sdf_props needs a string input, got ${child.dataType.simpleString}")

  private val tagRe = "<([^>]*)>".r

  /** Per-row kernel; public so generated code can call it. */
  def compute(text: UTF8String): MapData = {
    val lines = text.toString.split("\n", -1)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      if (line.startsWith(">")) {
        tagRe.findFirstMatchIn(line) match {
          case Some(m) =>
            val tag = m.group(1)
            val value = new StringBuilder
            i += 1
            var first = true
            while (i < lines.length && lines(i).nonEmpty && !lines(i).startsWith(">")
                && lines(i) != "$$$$") {
              if (!first) value.append('\n')
              value.append(lines(i))
              first = false
              i += 1
            }
            out(tag) = value.result().trim
          case None => i += 1
        }
      } else i += 1
    }
    val keys = new Array[Any](out.size)
    val vals = new Array[Any](out.size)
    var j = 0
    out.foreach { case (k, v) =>
      keys(j) = UTF8String.fromString(k)
      vals(j) = UTF8String.fromString(v)
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sdfProps", this, classOf[SdfPropsExpr].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): SdfPropsExpr =
    copy(child = newChild)
}

object SdfPropsExpr {
  /** Column API: native SDF property-block parser. */
  def sdf_props(record: Column): Column =
    GraftColumnBridge.column(SdfPropsExpr(GraftColumnBridge.expression(record)))
}
