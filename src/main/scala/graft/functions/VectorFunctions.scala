package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `ArrayType(FloatType)` embedding
  * columns. The hot kernel (`dot`, and `norm`/`cosine` on top of it)
  * is a native Catalyst expression with codegen — higher-order array
  * functions are CodegenFallback (interpreted, one intermediate array
  * per evaluation), which is too slow for the O(pairs) similarity
  * joins. The remaining combinators stay HOF-composed: they run once
  * per row, not once per pair.
  *
  * All arithmetic is promoted to Double before accumulating: the
  * float32 source values are exact in float64, so elementwise products
  * and left-to-right sums are bit-identical across engines computing in
  * double — which is what makes cosine similarity DuckDB-oracle
  * comparable (`list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])`).
  * The native kernel pins the same accumulation order (differential
  * spec vs `dotHof`).
  */
object VectorFunctions {

  private def d(c: Column): Column = transform(c, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    graft.plans.DotProductExpr.dot_product(a, b)

  /** Higher-order-function dot — the differential oracle for the
    * native kernel (see FunctionsSpec).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Euclidean (L2) distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)), lit(0.0), _ + _))

  /** Sign-bit LSH bucket from the first `bits` dimensions: a cheap
    * hyperplane-LSH coarse quantizer. Vectors close in cosine tend to
    * share sign patterns, so ANN search only probes the matching
    * bucket. At 100 TB the embedding table is pre-partitioned by this
    * bucket, turning an ANN query into a single-partition probe.
    */
  /** Largest |element| as a double — the symmetric-quantization scale
    * basis. NULL on an empty array.
    */
  def absMax(v: Column): Column = array_max(transform(v, x => abs(x.cast("double"))))

  /** Per-vector symmetric int8 quantization: q_i = ⌊x_i·127/amax + ½⌋
    * with amax = max|x| — the storage layout that shrinks an embedding
    * table 4× (int8 vs float32) with a bounded reconstruction error of
    * amax/254 per element. At 100 TB that is the difference between
    * scanning 25 TB and 100 TB for every ANN sweep; candidates are
    * generated on the quantized vectors and only the top-k re-scored
    * on the full-precision column. All-zero (amax = 0) vectors
    * quantize to zeros. The ⌊·+½⌋ form (not `round`) keeps the
    * arithmetic floor-based: identical IEEE-double results in any
    * engine, which is what the q81 oracle checks.
    */
  def int8Quantize(v: Column): Column =
    graft.plans.Int8QuantizeExpr.int8_quantize(v)

  /** Higher-order-function quantize — the differential oracle for
    * `Int8QuantizeExpr` (see FunctionsSpec). NOT a production path:
    * `amax` is referenced inside the per-element lambda and Catalyst
    * inlines captured expression trees, so the amax scan re-runs per
    * element — O(d²) interpreted work per row (the UnigramClogcE6Expr
    * finding, in vector form).
    */
  private[graft] def int8QuantizeHof(v: Column): Column = {
    val amax = absMax(v)
    // amax==0 branch preserves null ELEMENTS (when(x.isNull, …)) so
    // the HOF matches the kernel's null contract on that branch too —
    // a bare `transform(v, _ => lit(0L))` would 0-code them, a
    // divergence the [null, 0.0] edge row in FunctionsSpec pins.
    when(amax.isNull || amax === 0,
      transform(v, x => when(x.isNull, lit(null)).otherwise(lit(0L))))
      .otherwise(transform(v, x =>
        floor(x.cast("double") * lit(127.0) / amax + lit(0.5))))
  }

  /** Reconstruction x'_i = q_i·amax/127 from [[int8Quantize]] output. */
  def int8Dequantize(q: Column, amax: Column): Column =
    transform(q, i => i.cast("double") * amax / lit(127.0))

  /** Max per-element reconstruction error of [[int8Quantize]]:
    * max_i |x_i − q_i·amax/127| ≤ amax/254 (half a quantization step).
    */
  def int8Error(v: Column): Column =
    graft.plans.Int8ErrorExpr.int8_error(v)

  /** Higher-order-function error — the differential oracle for
    * `Int8ErrorExpr` (see FunctionsSpec). Same O(d²) lambda-capture
    * caveat as [[int8QuantizeHof]].
    */
  private[graft] def int8ErrorHof(v: Column): Column = {
    val amax = absMax(v)
    when(amax.isNull || amax === 0, lit(0.0))
      .otherwise(array_max(transform(v, x => {
        val xd = x.cast("double")
        abs(xd - floor(xd * lit(127.0) / amax + lit(0.5)) * amax / lit(127.0))
      })))
  }

  /** Hash-stable string rendering of a float array for cross-engine
    * compares: each element as floor(x·10⁶) (float32→double is exact;
    * floor is deterministic in any engine), comma-joined. Used by the
    * array-typed oracle entries (q51/q55) — pandas can't sort raw list
    * columns and raw float repr isn't hash-stable across engines.
    * DuckDB mirror: `array_to_string(list_transform(a, e ->
    * CAST(floor(CAST(e AS DOUBLE) * 1000000.0) AS BIGINT)), ',')`.
    */
  def scaledJoin(c: Column): Column =
    array_join(transform(c, e =>
      floor(e.cast("double") * lit(1000000.0)).cast("string")), ",")

  /** Fused int8 ADC score — native one-pass kernel (see
    * `plans.Int8AdcScoreExpr`): ⌊amax·10⁴⌋ · Σ ⌊x_i·127/amax + ½⌋·qw_i.
    */
  def int8AdcScore(v: Column, qwE6: Column): Column =
    graft.plans.Int8AdcScoreExpr.int8_adc_score(v, qwE6)

  /** Higher-order-function ADC score — the differential oracle for the
    * native kernel (see FunctionsSpec): absMax + int8Quantize +
    * zip_with product + aggregate, with the amax scale folded in as
    * ⌊amax·10⁴⌋. Four interpreted passes; the kernel is one.
    */
  def int8AdcScoreHof(v: Column, qwE6: Column): Column =
    floor(coalesce(absMax(v), lit(0.0)) * lit(10000.0)).cast("long") *
      aggregate(zip_with(int8QuantizeHof(v), qwE6, _ * _), lit(0L), _ + _)

  def signBucket(a: Column, bits: Int): Column =
    graft.plans.SignBucketExpr.sign_bucket(a, bits)

  /** Higher-order-function sign bucket — the differential oracle for
    * the native kernel (see FunctionsSpec).
    */
  def signBucketHof(a: Column, bits: Int): Column =
    aggregate(
      zip_with(slice(d(a), 1, bits), sequence(lit(0), lit(bits - 1)),
        (x, i) => when(x >= 0, pow(lit(2.0), i.cast("double")).cast("long")).otherwise(lit(0L))),
      lit(0L), _ + _)

  def pqEncode(v: Column, codebookE6: Seq[Long], m: Int, ksub: Int): Column =
    graft.plans.PqEncodeExpr.pq_encode(v, codebookE6, m, ksub)

  /** Expression-tree PQ encode — the differential oracle for the
    * native kernel (see PqSpec): per block, `least` over ksub
    * (distance, code) structs, distances as explicit Σ(v−c)² term
    * sums. A ~m·ksub·subdim-term static tree — fine as a spec oracle,
    * unusable as the corpus-scan production path (no loop, no reuse
    * of the floored elements across the ksub candidates). Non-null
    * vectors only (struct `least` does not replicate the kernel's
    * null-poisoning; the kernel's null contract is pinned directly).
    */
  private[graft] def pqEncodeHof(v: Column, codebookE6: Seq[Long],
      m: Int, ksub: Int, alreadyE6: Boolean = false): Column = {
    val subdim = codebookE6.length / (m * ksub)
    (0 until m).map { b =>
      val best = least((0 until ksub).map { c =>
        val dist = (0 until subdim).map { j =>
          val cent = lit(codebookE6((b * ksub + c) * subdim + j))
          val el = element_at(v, b * subdim + j + 1)
          val ve6 = if (alreadyE6) el.cast("long")
          else floor(el.cast("double") * lit(1000000.0)).cast("long")
          val dv = ve6 - cent
          dv * dv
        }.reduce(_ + _)
        struct(dist.as("d"), lit(c.toLong).as("c"))
      }: _*)
      best.getField("c") * lit(1L << (8 * b))
    }.reduce(_ + _)
  }

  def pqEncodeErr(v: Column, codebookE6: Seq[Long], m: Int, ksub: Int): Column =
    graft.plans.PqEncodeErrExpr.pq_encode_err(v, codebookE6, m, ksub)

  /** Expression-tree PQ quantization error — the differential oracle
    * for `PqEncodeErrExpr` (same caveats as [[pqEncodeHof]]). */
  private[graft] def pqEncodeErrHof(v: Column, codebookE6: Seq[Long],
      m: Int, ksub: Int, alreadyE6: Boolean = false): Column = {
    val subdim = codebookE6.length / (m * ksub)
    (0 until m).map { b =>
      least((0 until ksub).map { c =>
        (0 until subdim).map { j =>
          val cent = lit(codebookE6((b * ksub + c) * subdim + j))
          val el = element_at(v, b * subdim + j + 1)
          val ve6 = if (alreadyE6) el.cast("long")
          else floor(el.cast("double") * lit(1000000.0)).cast("long")
          val dv = ve6 - cent
          dv * dv
        }.reduce(_ + _)
      }: _*)
    }.reduce(_ + _)
  }

  def pqAdcScore(codes: Column, lutE6: Seq[Long], m: Int, ksub: Int): Column =
    graft.plans.PqAdcScoreExpr.pq_adc_score(codes, lutE6, m, ksub)

  /** Built-in-function PQ ADC score — the differential oracle for the
    * native kernel (see PqSpec): per block, element_at into the LUT
    * literal by the unpacked code.
    */
  private[graft] def pqAdcScoreHof(codes: Column, lutE6: Seq[Long],
      m: Int, ksub: Int): Column =
    (0 until m).map { b =>
      element_at(typedLit(lutE6),
        (lit(b * ksub) + shiftright(codes, 8 * b).bitwiseAND(lit(255L)).cast("int") + lit(1)).cast("int"))
    }.reduce(_ + _)
}
