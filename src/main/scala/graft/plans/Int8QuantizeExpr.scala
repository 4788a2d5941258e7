package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Shared per-row machinery for the int8 storage kernels: element read
  * with float→double promotion, and the amax scan.
  */
private[plans] trait Int8VectorKernel { self: UnaryExpression =>

  @transient protected lazy val vecType: ArrayType =
    child.dataType.asInstanceOf[ArrayType]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<float|double> input, got ${other.simpleString}")
  }

  protected def read(arr: ArrayData, i: Int): Double =
    vecType.elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }

  /** max |v_i| over non-null FINITE elements (0.0 when none; NaN/±Inf
    * are corrupt-data markers, not scale candidates — see the
    * non-finite divergence note on [[Int8QuantizeExpr]]).
    */
  protected def amaxOf(v: ArrayData): Double = {
    val n = v.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      if (!(vecType.containsNull && v.isNullAt(i))) {
        val a = math.abs(read(v, i))
        if (java.lang.Double.isFinite(a) && a > amax) amax = a
      }
      i += 1
    }
    amax
  }
}

/** Native symmetric int8 quantization q_i = ⌊v_i·127/amax + ½⌋ (zeros
  * when amax = 0) in ONE pass per row.
  *
  * Native for the same reason as `UnigramClogcE6Expr`: the HOF
  * formulation (`VectorFunctions.int8QuantizeHof`) references `amax`
  * — itself `array_max(transform(v, abs))` — inside the per-element
  * lambda, and Catalyst inlines captured expression trees, so the
  * amax scan re-runs for EVERY element: O(d²) interpreted work per
  * row. Invisible at d = 64, and invisible to a `.count()`-style
  * bench (the projection prunes), but a corpus-wide quantization
  * WRITE at d = 1024+ pays it in full. This kernel is O(d), codegen-
  * and CSE-eligible, and bit-equal to the HOF form (differential
  * spec): the per-element arithmetic `⌊(v·127)/amax + ½⌋` follows
  * the identical IEEE-double association order.
  *
  * Null semantics (matches the HOF form): null array → null; empty
  * array → empty; a null ELEMENT passes through as a null element
  * and is skipped by the amax scan — on EVERY branch, including
  * amax = 0 (all elements null or zero), where non-null elements
  * 0-code but null elements stay null. The HOF oracle mirrors this
  * explicitly (`when(x.isNull, …)` in its amax==0 branch) and the
  * [null, 0.0] edge row in FunctionsSpec pins the agreement.
  *
  * Sole divergence from the HOF form: NON-FINITE elements. The HOF
  * chain poisons the whole vector (Spark's array_max ranks NaN above
  * everything, so amax goes NaN/Inf and every code degrades through
  * floor(NaN) → 0); this kernel excludes non-finite values from the
  * amax scan and 0-codes them, quantizing the remaining finite
  * elements normally — the saner contract for a corrupt element in an
  * otherwise-good embedding, pinned by spec. The embeddings data
  * contract is finite floats, so the corpus differential is exact.
  */
case class Int8QuantizeExpr(child: Expression)
    extends UnaryExpression with Int8VectorKernel {

  override def prettyName: String = "int8_quantize"

  override def dataType: DataType =
    ArrayType(LongType, containsNull = vecType.containsNull)

  /** Per-row kernel; public so generated code can call it. */
  def compute(input: ArrayData): ArrayData = {
    val v = input
    val n = v.numElements()
    val amax = amaxOf(v)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (vecType.containsNull && v.isNullAt(i)) out(i) = null
      else {
        val xd = read(v, i)
        out(i) =
          if (amax == 0.0 || !java.lang.Double.isFinite(xd)) 0L
          else math.floor(xd * 127.0 / amax + 0.5).toLong
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("q", this, classOf[Int8QuantizeExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Int8QuantizeExpr =
    copy(child = newChild)
}

object Int8QuantizeExpr {
  /** Column API: native one-pass symmetric int8 quantization. */
  def int8_quantize(v: Column): Column =
    GraftColumnBridge.column(Int8QuantizeExpr(GraftColumnBridge.expression(v)))
}

/** Native max per-element int8 reconstruction error
  * max_i |v_i − ⌊v_i·127/amax + ½⌋·amax/127| in one pass (0.0 when
  * amax = 0 or the vector is empty/all-null; null elements skipped).
  * Same O(d²)-capture rationale as [[Int8QuantizeExpr]]; bit-equal to
  * `VectorFunctions.int8ErrorHof` (identical association order per
  * element, max over doubles is order-insensitive).
  */
case class Int8ErrorExpr(child: Expression)
    extends UnaryExpression with Int8VectorKernel {

  override def prettyName: String = "int8_error"

  override def dataType: DataType = DoubleType

  /** Per-row kernel; public so generated code can call it. */
  def compute(input: ArrayData): Double = {
    val v = input
    val n = v.numElements()
    val amax = amaxOf(v)
    if (amax == 0.0) return 0.0
    var err = 0.0
    var i = 0
    while (i < n) {
      if (!(vecType.containsNull && v.isNullAt(i))) {
        val xd = read(v, i)
        if (java.lang.Double.isFinite(xd)) {
          val e = math.abs(xd - math.floor(xd * 127.0 / amax + 0.5) * amax / 127.0)
          if (e > err) err = e
        }
      }
      i += 1
    }
    err
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("e", this, classOf[Int8ErrorExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Int8ErrorExpr =
    copy(child = newChild)
}

object Int8ErrorExpr {
  /** Column API: native one-pass max int8 reconstruction error. */
  def int8_error(v: Column): Column =
    GraftColumnBridge.column(Int8ErrorExpr(GraftColumnBridge.expression(v)))
}
