package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match unigram segmentation of one word: from the
  * left, match the longest candidate piece (length `maxPieceLen` down
  * to 2) at the cursor, emit it, and advance by its length; an
  * unmatched position consumes one character and emits nothing
  * (single chars are the implicit fallback vocab). Returns the array
  * of matched multi-char pieces.
  *
  * The candidate set is a STATIC constructor parameter (the
  * `BoilerplateStripExpr` convention): candidates are bounded by the
  * count floor that created them, so the caller collects and bakes
  * them — a per-row hash-set probe, no joins, one pass over the word
  * basis. This replaced a 16-step lockstep-join formulation that was
  * correct but paid a checkpoint job plus three broadcast builds PER
  * STEP (measured 19.4 s at the 10× corpus for a vocab-sized input —
  * pure fixed overhead; the kernel form is one job).
  *
  * Matching at a position is tie-free (a candidate piece IS the
  * substring it matches), so the kernel is a pure function of
  * (word, candidate set) — the property the q148 unrolled-CTE oracle
  * relies on. Matching iterates by Unicode CODE POINTS (positions and
  * lengths alike), matching Spark SQL's `substring`/`length` (which
  * generate the candidate set) and DuckDB's `substr`/`length` in the
  * oracle — so supplementary-plane text (emoji) segments identically
  * across all three engines, not just BMP.
  */
case class GreedyPiecesExpr(child: Expression, pieces: Seq[String],
    maxPieceLen: Int) extends UnaryExpression {

  require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"greedy_pieces needs a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val pieceSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, pieces.size * 2))
    pieces.foreach(s.add)
    s
  }

  /** Per-row kernel; public so generated code can call it. Positions
    * and lengths are code points: `offs(k)` is the UTF-16 offset of
    * code point k, so `w.substring(offs(i), offs(i+l))` is exactly the
    * l-code-point slice Spark's `substring(word, i+1, l)` produced
    * when building the candidate set. For BMP-only words offs(k) == k
    * and this degenerates to the plain char loop.
    */
  def compute(word: UTF8String): ArrayData = {
    val w = word.toString
    val n = w.codePointCount(0, w.length)
    val offs = new Array[Int](n + 1)
    var k = 0
    var o = 0
    while (k < n) { offs(k) = o; o = w.offsetByCodePoints(o, 1); k += 1 }
    offs(n) = w.length
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < n) {
      var l = math.min(maxPieceLen, n - i)
      var matched = 0
      while (l >= 2 && matched == 0) {
        if (pieceSet.contains(w.substring(offs(i), offs(i + l)))) matched = l
        l -= 1
      }
      if (matched > 0) {
        out += UTF8String.fromString(w.substring(offs(i), offs(i + matched)))
        i += matched
      } else i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("greedyPieces", this, classOf[GreedyPiecesExpr].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $self.compute($w);")
  }

  override protected def withNewChildInternal(newChild: Expression): GreedyPiecesExpr =
    copy(child = newChild)
}

object GreedyPiecesExpr {
  /** Column API: matched multi-char pieces of the greedy segmentation. */
  def greedyPieces(word: Column, pieces: Seq[String], maxPieceLen: Int): Column =
    GraftColumnBridge.column(GreedyPiecesExpr(
      GraftColumnBridge.expression(word), pieces, maxPieceLen))
}
