package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Min-cost (Viterbi) unigram segmentation of one word: the dynamic
  * program dp[i] = min over piece lengths l of dp[i−l] + cost(piece
  * ending at i), followed by a backward walk that re-emits the optimal
  * path. This is the E-step kernel of unigram-LM EM training (Kudo,
  * "Subword Regularization", ACL 2018) with Viterbi (hard) counts as
  * the deterministic stand-in for lattice expected counts — every
  * choice is an integer comparison, so a SQL engine replays the
  * segmentation bit-for-bit (the [[GreedyPiecesExpr]] contract, with
  * "longest match" upgraded to "cheapest path").
  *
  * Cost model: `pieces(k)` costs `costs(k)` integer micro-nats
  * (floor(−ln(count/total)·10⁶), computed OUTSIDE the kernel by the
  * caller); a single character absent from the vocab falls back to
  * `unkCost`. Single-char pieces are ordinary vocab entries, so the
  * DP is always feasible (l = 1 is always a legal step).
  *
  * Tie-break: the backward walk at position i picks the LARGEST l
  * with dp[i−l] + cost == dp[i] — fully determined by the (word,
  * vocab, costs) triple, which is what licenses the unrolled-CTE
  * oracle (q160). Positions and lengths are Unicode code points,
  * matching Spark's `substring`/`length` and DuckDB's `substr` (the
  * GreedyPiecesExpr r10 convention).
  *
  * The vocab is a STATIC constructor parameter (bounded by the count
  * floor that created it — the BoilerplateStripExpr convention), so
  * segmentation is a per-row hash-map probe: no joins, one codegen'd
  * pass over the vocab-sized word basis per EM round.
  */
case class ViterbiPiecesExpr(child: Expression, pieces: Seq[String],
    costs: Seq[Long], maxPieceLen: Int, unkCost: Long)
  extends UnaryExpression {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
  require(pieces.length == costs.length, "pieces and costs must align")
  require(unkCost >= 0 && costs.forall(_ >= 0), "costs must be non-negative")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"viterbi_pieces needs a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val costMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](math.max(16, pieces.size * 2))
    pieces.iterator.zip(costs.iterator).foreach { case (p, c) => m.put(p, c) }
    m
  }

  /** Per-row kernel; public so generated code can call it. */
  def compute(word: UTF8String): ArrayData = {
    val w = word.toString
    val n = w.codePointCount(0, w.length)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](n + 1)
    var k = 0
    var o = 0
    while (k < n) { offs(k) = o; o = w.offsetByCodePoints(o, 1); k += 1 }
    offs(n) = w.length
    // forward DP over code-point positions
    val dp = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      val c1 = costMap.get(w.substring(offs(i - 1), offs(i)))
      var best = dp(i - 1) + (if (c1 == null) unkCost else c1.longValue())
      var l = 2
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax) {
        val c = costMap.get(w.substring(offs(i - l), offs(i)))
        if (c != null) {
          val cand = dp(i - l) + c.longValue()
          if (cand < best) best = cand
        }
        l += 1
      }
      dp(i) = best
      i += 1
    }
    // backward walk: largest l achieving dp[i] wins (the documented
    // tie-break); l = 1 always closes the walk, so it terminates
    val rev = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    i = n
    while (i > 0) {
      var l = math.min(maxPieceLen, i)
      var step = 0
      while (step == 0) {
        val piece = w.substring(offs(i - l), offs(i))
        val c = costMap.get(piece)
        val cost = if (c != null) c.longValue()
          else if (l == 1) unkCost else Long.MinValue
        if (cost != Long.MinValue && dp(i - l) + cost == dp(i)) {
          rev += UTF8String.fromString(piece)
          step = l
        } else l -= 1
      }
      i -= step
    }
    new GenericArrayData(rev.reverseIterator.toArray[Any])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("viterbiPieces", this, classOf[ViterbiPiecesExpr].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $self.compute($w);")
  }

  override protected def withNewChildInternal(newChild: Expression): ViterbiPiecesExpr =
    copy(child = newChild)
}

object ViterbiPiecesExpr {
  /** Column API: the pieces of the min-cost segmentation, in order. */
  def viterbiPieces(word: Column, pieces: Seq[String], costs: Seq[Long],
      maxPieceLen: Int, unkCost: Long): Column =
    GraftColumnBridge.column(ViterbiPiecesExpr(
      GraftColumnBridge.expression(word), pieces, costs, maxPieceLen, unkCost))
}
