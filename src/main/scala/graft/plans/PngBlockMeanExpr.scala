package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** CONTENT-TRUE image perceptual feature for the one compressed image
  * format the JDK can decode without codec dependencies: PNG, whose
  * pixel stream is zlib ([[java.util.zip.Inflater]] — the same
  * no-new-deps posture as [[DeflateLenExpr]]) under five byte-level
  * scanline filters defined by the spec itself. The kernel walks the
  * chunk layout (big-endian lengths, guarded advance — the
  * media_header discipline), inflates the concatenated IDAT stream,
  * reverses the per-row filter (None/Sub/Up/Average/Paeth), reduces
  * each pixel to integer luma ((77·r + 150·g + 29·b) >> 8; gray
  * passes through), and returns the grid×grid BLOCK-MEAN luminance
  * profile: mean_e3(b) = ⌊1000 · Σ_block lum / |block|⌋, row-major.
  *
  * Why block means and not the byte histogram: a RE-ENCODED twin
  * (different filter choices, different deflate level, an added alpha
  * channel) has completely different compressed bytes but the
  * identical decoded pixels, so its profile is bit-identical; a
  * RESIZED twin (integral nearest-neighbor scale, dimensions
  * divisible by the grid) duplicates every pixel s² times inside the
  * same block, so every block mean — and the profile — is exactly
  * unchanged. The whole-payload byte histogram (q186's tier) misses
  * both. For non-integral resizes the means drift slightly and the
  * downstream L1 gate absorbs it — approximate by nature, exact for
  * the planted contract.
  *
  * `bt601 = true` switches the COLOR reduction to the JPEG-encoder
  * integer BT.601 luma, Y = (19595·r + 38470·g + 7471·b + 32768) >>
  * 16 — the 16-bit fixed-point form virtually every JPEG encoder
  * lineage (libjpeg and descendants) uses for RGB → Y, so a color
  * PNG's profile is EXACTLY the Y-plane profile of its JPEG re-encode
  * (r15 verdict item 6: the most common COLOR cross-format twin pairs
  * at L1 = 0 instead of rounding-approximate). Grayscale payloads are
  * identical in both modes (the pixel passes through); the legacy
  * (77·r + 150·g + 29·b) >> 8 stays the default so existing profiles
  * and store signatures are unchanged.
  *
  * Supported subset (everything else → null, the [[PcmEnergyExpr]]
  * contract — unsupported shapes stay on the byte-histogram tier):
  * 8-bit depth, color types 0/2/4/6 (gray, RGB, gray+alpha, RGBA),
  * no interlace, filter method 0, dimensions ≤ 16384 with the
  * inflated image capped at 64 MiB (a forged IHDR cannot zip-bomb
  * the executor). Corrupt payloads — truncated chunks, bad zlib,
  * out-of-range filter bytes, short pixel data — return null, never
  * hang, never throw (fuzz-spec-pinned like the WAV walk). Chunk
  * CRCs are deliberately not verified: the feature wants decodable
  * content, not archival validity.
  */
case class PngBlockMeanExpr(child: Expression, grid: Int,
    bt601: Boolean = false)
    extends UnaryExpression {
  require(grid >= 1 && grid <= 7, "grid must be in [1, 7] (grid^2 sign-bucket bits)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"png_block_means needs a binary input, got ${child.dataType.simpleString}")

  private val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Per-row kernel; public so generated code can call it. */
  def compute(b: Array[Byte]): GenericArrayData = {
    if (b == null || b.length < 8 + 25) return null
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != Sig(i)) return null; i += 1 }
    def u(o: Int): Int = b(o) & 0xff
    def be32(o: Int): Long =
      (u(o).toLong << 24) | (u(o + 1) << 16) | (u(o + 2) << 8) | u(o + 3)
    // IHDR must be the first chunk (spec) — read shape, then walk for IDAT
    if (be32(8) != 13L || u(12) != 'I' || u(13) != 'H' || u(14) != 'D' || u(15) != 'R')
      return null
    val w = be32(16); val h = be32(20)
    val depth = u(24); val colorType = u(25)
    val interlace = u(28)
    if (w < 1 || h < 1 || w > 16384 || h > 16384) return null
    if (depth != 8 || interlace != 0 || u(26) != 0 || u(27) != 0) return null
    val ch = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => return null
    }
    val rowBytes = w.toInt * ch // w <= 16384, ch <= 4: fits comfortably
    val raw = h * (1L + rowBytes)
    if (raw > (1L << 26)) return null
    // chunk walk: concatenate IDAT segments (guarded Long advance)
    val idat = new java.io.ByteArrayOutputStream()
    var p = 8L
    while (p + 8 <= b.length) {
      val len = be32(p.toInt)
      val t0 = u(p.toInt + 4); val t1 = u(p.toInt + 5)
      val t2 = u(p.toInt + 6); val t3 = u(p.toInt + 7)
      if (t0 == 'I' && t1 == 'D' && t2 == 'A' && t3 == 'T') {
        val avail = math.min(len, b.length.toLong - p - 8L)
        if (avail > 0) idat.write(b, (p + 8).toInt, avail.toInt)
      }
      val next = p + 12L + len
      if (next <= p || next > b.length.toLong) p = b.length.toLong
      else p = next
    }
    val comp = idat.toByteArray
    if (comp.isEmpty) return null
    // inflate into the exact expected size; anything short or broken → null
    val img = new Array[Byte](raw.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(comp)
      var off = 0
      var progressed = true
      while (off < img.length && progressed && !inf.finished()) {
        val n = try inf.inflate(img, off, img.length - off)
          catch { case _: java.util.zip.DataFormatException => return null }
        progressed = n > 0
        off += n
      }
      if (off < img.length) return null
    } finally inf.end()
    // defilter in place per scanline (filter byte + rowBytes pixels)
    val bpp = ch
    var y = 0
    while (y < h.toInt) {
      val rs = y * (1 + rowBytes)
      val ft = img(rs) & 0xff
      if (ft > 4) return null
      val d = rs + 1
      val prev = rs - rowBytes // previous row's data start (d of y-1)
      var x = 0
      while (x < rowBytes) {
        val cur = img(d + x) & 0xff
        val a = if (x >= bpp) img(d + x - bpp) & 0xff else 0
        val up = if (y > 0) img(prev + x) & 0xff else 0
        val c = if (y > 0 && x >= bpp) img(prev + x - bpp) & 0xff else 0
        val rec = ft match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + up
          case 3 => cur + ((a + up) >> 1)
          case _ => // Paeth
            val pv = a + up - c
            val pa = math.abs(pv - a); val pb = math.abs(pv - up)
            val pc = math.abs(pv - c)
            cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
        }
        img(d + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    // grid×grid block-mean luma, integer-exact
    val g2 = grid * grid
    val sums = new Array[Long](g2)
    val counts = new Array[Long](g2)
    val wi = w.toInt; val hi = h.toInt
    y = 0
    while (y < hi) {
      val by = ((y.toLong * grid) / hi).toInt
      val d = y * (1 + rowBytes) + 1
      var x = 0
      while (x < wi) {
        val o = d + x * ch
        val lum = colorType match {
          case 0 | 4 => img(o) & 0xff
          case _ if bt601 =>
            (19595 * (img(o) & 0xff) + 38470 * (img(o + 1) & 0xff) +
              7471 * (img(o + 2) & 0xff) + 32768) >> 16
          case _ =>
            (77 * (img(o) & 0xff) + 150 * (img(o + 1) & 0xff) +
              29 * (img(o + 2) & 0xff)) >> 8
        }
        val bi = by * grid + ((x.toLong * grid) / wi).toInt
        sums(bi) += lum
        counts(bi) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Long](g2)
    i = 0
    while (i < g2) {
      out(i) = if (counts(i) == 0) 0L else (sums(i) * 1000L) / counts(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pngBlockMean", this, classOf[PngBlockMeanExpr].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = $self.compute($t);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PngBlockMeanExpr =
    copy(child = newChild)
}

object PngBlockMeanExpr {
  /** Column API: grid×grid block-mean luminance (e3) of a PNG payload. */
  def png_block_means(payload: Column, grid: Int): Column =
    GraftColumnBridge.column(
      PngBlockMeanExpr(GraftColumnBridge.expression(payload), grid))

  /** [[png_block_means]] with the luma model selectable: `bt601 = true`
    * uses the JPEG-encoder integer BT.601 reduction for color pixels
    * (cross-format exactness); false is the legacy default.
    */
  def png_block_means(payload: Column, grid: Int, bt601: Boolean): Column =
    GraftColumnBridge.column(
      PngBlockMeanExpr(GraftColumnBridge.expression(payload), grid, bt601))
}
