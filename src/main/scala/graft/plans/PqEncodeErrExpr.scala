package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** PQ QUANTIZATION ERROR: the summed per-block best squared distance
  * Σ_b min_c Σ_j (v − cent)² — by construction the reconstruction
  * error of the code `PqEncodeExpr` assigns (same loop, accumulating
  * the winning distance instead of packing the winning id). The
  * drift monitor (q132, `Pq.ivfPqDriftStats`) scans new ingests with
  * this against the FROZEN codebook: when the delta's error pulls
  * away from the catalog's, the codebook no longer fits the data and
  * retraining is due — FAISS-style index health, integer-exact so the
  * oracle replays it from the training CTEs.
  *
  * Input/null semantics identical to `PqEncodeExpr` (float/double
  * elements e6-floored, long elements already-e6; null vector, null
  * element, or wrong length → null).
  */
case class PqEncodeErrExpr(child: Expression, codebookE6: Seq[Long],
    m: Int, ksub: Int) extends UnaryExpression {

  require(m >= 1 && m <= 8, s"m must be in [1, 8], got $m")
  require(ksub >= 1 && ksub <= 256, s"ksub must be in [1, 256], got $ksub")
  require(codebookE6.nonEmpty && codebookE6.length % (m * ksub) == 0,
    s"codebook length ${codebookE6.length} is not a multiple of m*ksub = ${m * ksub}")

  private val subdim: Int = codebookE6.length / (m * ksub)
  @transient private lazy val cb: Array[Long] = codebookE6.toArray

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val vecType = child.dataType.asInstanceOf[ArrayType]
  @transient private lazy val isFloat = vecType.elementType == FloatType
  @transient private lazy val isLong = vecType.elementType == LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode_err needs an array<float|double|bigint> input, got ${other.simpleString}")
  }

  /** Per-row kernel; public so generated code can call it. */
  def compute(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    if (n != m * subdim) return null
    val v = new Array[Long](subdim)
    var total = 0L
    var b = 0
    while (b < m) {
      var j = 0
      while (j < subdim) {
        val i = b * subdim + j
        if (vecType.containsNull && arr.isNullAt(i)) return null
        v(j) = if (isLong) arr.getLong(i)
        else {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          math.floor(x * 1000000.0).toLong
        }
        j += 1
      }
      var bestDist = Long.MaxValue
      var c = 0
      while (c < ksub) {
        var dist = 0L
        val base = (b * ksub + c) * subdim
        var k = 0
        while (k < subdim) {
          val diff = v(k) - cb(base + k)
          dist += diff * diff
          k += 1
        }
        if (dist < bestDist) bestDist = dist
        c += 1
      }
      total += bestDist
      b += 1
    }
    total
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncodeErr", this, classOf[PqEncodeErrExpr].getName)
    val tmp = ctx.freshName("err")
    nullSafeCodeGen(ctx, ev, a => s"""
      |java.lang.Long $tmp = $self.compute($a);
      |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeErrExpr =
    copy(child = newChild)
}

object PqEncodeErrExpr {
  /** Column API: summed per-block best squared distance under the
    * flattened codebook. */
  def pq_encode_err(v: Column, codebookE6: Seq[Long], m: Int, ksub: Int): Column =
    GraftColumnBridge.column(
      PqEncodeErrExpr(GraftColumnBridge.expression(v), codebookE6, m, ksub))
}
