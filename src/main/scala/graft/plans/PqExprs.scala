package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Product-quantization encode (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): split a d-dim vector
  * into `m` contiguous sub-vectors, assign each to its nearest
  * codebook centroid by squared L2 distance, and pack the `m` code
  * ids into ONE 64-bit long (8 bits per block, so m ≤ 8 and
  * ksub ≤ 256). A 64-dim float32 embedding (256 bytes) compresses to
  * 8 bytes — 32×, the step past int8's 4× (`Int8QuantizeExpr`) that
  * makes a 100 TB embedding corpus scannable from RAM-resident codes.
  *
  * All arithmetic is integer-exact so the DuckDB oracle can replay
  * it bit-for-bit: vector elements enter as ⌊x·10⁶⌋ longs (the q102
  * e6 convention), centroids are e6 longs (integer means, `div`
  * truncation — DuckDB's `//` matches), distances are Σ(v−c)² in
  * 64-bit. Ties in distance break to the SMALLER code id, making the
  * assignment a pure function of (vector, codebook) in any engine.
  *
  * Native for the `Int8AdcScoreExpr` reason: encode is a linear scan
  * of the whole corpus (both at ingest and inside every training
  * round), and the HOF/expression-tree form (`VectorFunctions
  * .pqEncodeHof`, the differential oracle) is a ~m·ksub·subdim-term
  * tree Catalyst can neither loop nor keep allocation-free.
  *
  * Null semantics: null vector → null; any null element → null;
  * length ≠ m·subdim (the codebook's layout) → null.
  *
  * `codebookE6` is flattened [block][code][bpos] — length must be
  * m·ksub·subdim with every cell present (an empty training cluster
  * keeps its prior centroid; see `Pq.trainCodebookE6`).
  *
  * Input element types: float/double elements are e6-floored per the
  * convention above; LONG elements are taken as ALREADY-e6 integers
  * verbatim — the residual path of IVF-PQ (`Pq.trainIvfPq`) trains and
  * encodes over exact integer residuals (v_e6 − coarse centroid), and
  * a float round-trip there would break the engine-exact replay.
  */
case class PqEncodeExpr(child: Expression, codebookE6: Seq[Long],
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
      s"pq_encode needs an array<float|double|bigint> input, got ${other.simpleString}")
  }

  /** Per-row kernel; public so generated code can call it. Returns
    * null (boxed) on contract violations — see null semantics above.
    */
  def compute(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    if (n != m * subdim) return null
    val v = new Array[Long](subdim)
    var packed = 0L
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
      var best = 0
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
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      packed |= best.toLong << (8 * b)
      b += 1
    }
    packed
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncodeExpr].getName)
    val tmp = ctx.freshName("packed")
    nullSafeCodeGen(ctx, ev, a => s"""
      |java.lang.Long $tmp = $self.compute($a);
      |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

object PqEncodeExpr {
  /** Column API: packed PQ codes for `v` under the flattened codebook. */
  def pq_encode(v: Column, codebookE6: Seq[Long], m: Int, ksub: Int): Column =
    GraftColumnBridge.column(
      PqEncodeExpr(GraftColumnBridge.expression(v), codebookE6, m, ksub))
}

/** Fused PQ asymmetric-distance (ADC) score: unpack the `m` 8-bit
  * codes from a packed-long `codes` column and sum the broadcast
  * query's precomputed lookup-table entries,
  *
  *   score = Σ_b lut[b·ksub + code_b],   lut[b][c] = Σ_j q_e6[b·subdim+j]·cent_e6[b][c][j]
  *
  * — the inner product of the full-precision (e6 integer) query with
  * the RECONSTRUCTED corpus vector, evaluated without touching the
  * vector: per row it is m array reads and m adds over a LongType
  * column, the cheapest possible retrieval scan shape (one packed
  * long per row on the wire, LUT built once on the driver from the
  * single query row). Pure 64-bit integer arithmetic end to end, so
  * ranks and the DuckDB oracle compare are engine-exact.
  *
  * Null semantics: null codes → null; a code ≥ ksub (corrupt pack)
  * → null rather than a wrong lookup.
  */
case class PqAdcScoreExpr(child: Expression, lutE6: Seq[Long],
    m: Int, ksub: Int) extends UnaryExpression {

  require(m >= 1 && m <= 8, s"m must be in [1, 8], got $m")
  require(lutE6.length == m * ksub,
    s"lut length ${lutE6.length} != m*ksub = ${m * ksub}")

  @transient private lazy val lut: Array[Long] = lutE6.toArray

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score needs a bigint packed-codes input, got ${other.simpleString}")
  }

  /** Per-row kernel; public so generated code can call it. */
  def compute(codes: Long): java.lang.Long = {
    var sum = 0L
    var b = 0
    while (b < m) {
      val c = ((codes >>> (8 * b)) & 0xffL).toInt
      if (c >= ksub) return null
      sum += lut(b * ksub + c)
      b += 1
    }
    sum
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcScoreExpr].getName)
    val tmp = ctx.freshName("score")
    nullSafeCodeGen(ctx, ev, a => s"""
      |java.lang.Long $tmp = $self.compute($a);
      |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcScoreExpr =
    copy(child = newChild)
}

object PqAdcScoreExpr {
  /** Column API: ADC score of packed codes against a query LUT. */
  def pq_adc_score(codes: Column, lutE6: Seq[Long], m: Int, ksub: Int): Column =
    GraftColumnBridge.column(
      PqAdcScoreExpr(GraftColumnBridge.expression(codes), lutE6, m, ksub))
}
