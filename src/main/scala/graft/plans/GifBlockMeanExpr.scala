package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** CONTENT-TRUE perceptual feature for the third real web image
  * format, completing the pixel tier's coverage of the classic crawl
  * mix (PNG [[PngBlockMeanExpr]], JPEG [[JpegBlockMeanExpr]], now
  * GIF): a hand-rolled GIF87a/89a decoder — logical-screen walk,
  * global/local color table, extension skip, sub-block
  * reassembly, the full variable-width LSB-first GIF-LZW decode
  * (code-size growth, deferred clear at 4096, the KwKwK
  * first-use-of-next-code case), 4-pass interlace row mapping — then
  * palette→luma reduction and the SAME grid×grid block-mean profile
  * as the sibling kernels: mean_e3(b) = ⌊1000·Σ lum/|block|⌋,
  * row-major, so a GIF twin of a PNG/JPEG image lands in the SAME
  * signature space ([[graft.operators.Multimodal.imageSignatures]])
  * and pairs at L1 = 0 when the decoded pixels agree.
  *
  * Luma: palette (r, g, b) reduced by the selected model — legacy
  * (77r+150g+29b)>>8 or JPEG-encoder BT.601
  * (19595r+38470g+7471b+32768)>>16 (`bt601 = true`, the q216
  * cross-format-exactness option). Both pass r=g=b GRAY palettes
  * through unchanged (the weights sum to the shift unit), so a
  * gray-ramp GIF equals its gray PNG twin under EITHER model.
  *
  * Scope (everything else → null, the [[PcmEnergyExpr]] contract —
  * unsupported shapes stay on the header/histogram tier): the FIRST
  * image descriptor decodes (animation frames 2+ are the frame
  * tier's q134 business); its own w×h are the image (placement on
  * the logical screen is composition, not content); GCE transparency
  * is ignored (a transparent index still has a palette color).
  * Caps: dims ≤ 16384 and w·h ≤ 2²⁶ (the JPEG tier's pixel-bomb
  * cap — LZW expands thousands-fold, so the cap precedes decode).
  * Corrupt payloads — truncated sub-blocks, codes beyond the
  * dictionary, indices beyond the palette, bits exhausted before the
  * frame fills — return null, never throw, never hang
  * (fuzz-spec-pinned like the siblings).
  */
case class GifBlockMeanExpr(child: Expression, grid: Int,
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
        s"gif_block_means needs a binary input, got ${child.dataType.simpleString}")

  /** Per-row kernel; public so generated code can call it. */
  def compute(b: Array[Byte]): GenericArrayData = {
    if (b == null || b.length < 6 + 7 + 10) return null
    def u(o: Int): Int = b(o) & 0xff
    def u16(o: Int): Int = u(o) | (u(o + 1) << 8)
    // signature: GIF87a / GIF89a
    if (u(0) != 'G' || u(1) != 'I' || u(2) != 'F' || u(3) != '8' ||
      (u(4) != '7' && u(4) != '9') || u(5) != 'a') return null
    // logical screen descriptor; global color table if flagged
    val lsdPacked = u(10)
    var p = 13
    var gctOff = -1; var gctSize = 0
    if ((lsdPacked & 0x80) != 0) {
      gctSize = 1 << ((lsdPacked & 7) + 1)
      gctOff = p
      p += 3 * gctSize
      if (p > b.length) return null
    }
    // block walk to the first image descriptor (skip extensions)
    while (p < b.length && u(p) != 0x2c) {
      if (u(p) == 0x3b) return null // trailer before any image
      if (u(p) != 0x21 || p + 2 > b.length) return null
      p += 2 // introducer + label
      var len = if (p < b.length) u(p) else return null
      while (len != 0) {
        p += 1 + len
        if (p >= b.length) return null
        len = u(p)
      }
      p += 1 // the 0 terminator
    }
    if (p + 10 > b.length) return null
    val w = u16(p + 5); val h = u16(p + 7)
    val idPacked = u(p + 9)
    p += 10
    if (w < 1 || h < 1 || w > 16384 || h > 16384) return null
    val npix = w.toLong * h
    if (npix > (1L << 26)) return null
    val interlaced = (idPacked & 0x40) != 0
    var palOff = gctOff; var palSize = gctSize
    if ((idPacked & 0x80) != 0) {
      palSize = 1 << ((idPacked & 7) + 1)
      palOff = p
      p += 3 * palSize
      if (p > b.length) return null
    }
    if (palOff < 0) return null // no color table at all
    if (p >= b.length) return null
    val minCode = u(p); p += 1
    if (minCode < 2 || minCode > 8) return null
    // reassemble the LZW stream from data sub-blocks (guarded walk;
    // a truncated tail concatenates what's there — decode then fails
    // cleanly on bit exhaustion)
    val lzw = new java.io.ByteArrayOutputStream()
    var ok = true
    if (p >= b.length) return null // truncated right after min-code
    var blen = u(p); p += 1
    while (ok && blen != 0) {
      val avail = math.min(blen, b.length - p)
      if (avail > 0) lzw.write(b, p, avail)
      p += blen
      if (p >= b.length) { ok = false }
      else { blen = u(p); p += 1 }
    }
    val data = lzw.toByteArray
    // --- GIF-LZW decode (App. F): variable width, LSB-first ---------
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](npix.toInt)
    var width = minCode + 1
    var nextFree = clear + 2
    var prev = -1
    var emitted = 0
    var bitPos = 0L
    val bitEnd = data.length.toLong * 8
    while (emitted < out.length) {
      if (bitPos + width > bitEnd) return null // bits ran dry mid-frame
      val byteAt = (bitPos >> 3).toInt
      val shift = (bitPos & 7).toInt
      var v = (data(byteAt) & 0xff) >> shift
      var got = 8 - shift
      while (got < width) {
        val nb = byteAt + ((got + shift) >> 3)
        v |= (data(nb) & 0xff) << got
        got += 8
      }
      val code = v & ((1 << width) - 1)
      bitPos += width
      if (code == clear) {
        width = minCode + 1; nextFree = clear + 2; prev = -1
      } else if (code == eoi) {
        return null // EOI before the frame filled
      } else {
        // materialize the code's sequence (reverse suffix walk)
        var top = 0
        var first: Byte = 0
        if (code < clear) {
          if (code >= palSize) return null
          first = code.toByte
          stack(top) = first; top = 1
        } else if (code < nextFree) {
          var c = code
          var guard = 0
          while (c >= clear) {
            stack(top) = suffix(c); top += 1
            c = prefix(c)
            guard += 1
            if (guard > 4096) return null
          }
          if (c >= palSize) return null
          first = c.toByte
          stack(top) = first; top += 1
        } else if (code == nextFree && prev >= 0 && nextFree < 4096) {
          // KwKwK: prev's sequence + its own first symbol
          var c = prev
          var guard = 0
          while (c >= clear) {
            stack(top) = suffix(c); top += 1
            c = prefix(c)
            guard += 1
            if (guard > 4096) return null
          }
          if (c >= palSize) return null
          first = c.toByte
          stack(top) = first; top += 1
          // sequence is prev ++ first: prepend first at the BOTTOM of
          // the reversed stack (it is emitted last)
          System.arraycopy(stack, 0, stack, 1, top)
          stack(0) = first
          top += 1
        } else return null // code beyond the dictionary
        if (emitted + top > out.length) return null
        var i = top - 1
        while (i >= 0) { out(emitted) = stack(i); emitted += 1; i -= 1 }
        if (prev >= 0 && nextFree < 4096) {
          prefix(nextFree) = prev
          suffix(nextFree) = first
          nextFree += 1
          if (nextFree == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    // interlace: decoded row r is actual row rowMap(r) (4-pass order)
    val rowMap = new Array[Int](h)
    if (interlaced) {
      var r = 0
      var y = 0
      while (y < h) { rowMap(r) = y; r += 1; y += 8 } // pass 1: 0,8,...
      y = 4
      while (y < h) { rowMap(r) = y; r += 1; y += 8 } // pass 2: 4,12,...
      y = 2
      while (y < h) { rowMap(r) = y; r += 1; y += 4 } // pass 3: 2,6,...
      y = 1
      while (y < h) { rowMap(r) = y; r += 1; y += 2 } // pass 4: odd rows
    } else {
      var y = 0
      while (y < h) { rowMap(y) = y; y += 1 }
    }
    // palette → luma once per ENTRY (≤ 256), not per pixel: the hot
    // loop below then reads one table cell per pixel
    val lumLut = new Array[Int](palSize)
    var e = 0
    while (e < palSize) {
      val po = palOff + 3 * e
      val red = u(po); val grn = u(po + 1); val blu = u(po + 2)
      lumLut(e) =
        if (bt601) (19595 * red + 38470 * grn + 7471 * blu + 32768) >> 16
        else (77 * red + 150 * grn + 29 * blu) >> 8
      e += 1
    }
    // grid×grid block-mean luma over palette-reduced pixels
    val g2 = grid * grid
    val sums = new Array[Long](g2)
    val counts = new Array[Long](g2)
    var r = 0
    while (r < h) {
      val y = rowMap(r)
      val by = ((y.toLong * grid) / h).toInt
      val base = r * w
      var x = 0
      while (x < w) {
        val bi = by * grid + ((x.toLong * grid) / w).toInt
        sums(bi) += lumLut(out(base + x) & 0xff)
        counts(bi) += 1
        x += 1
      }
      r += 1
    }
    val res = new Array[Long](g2)
    var i = 0
    while (i < g2) {
      res(i) = if (counts(i) == 0) 0L else (sums(i) * 1000L) / counts(i)
      i += 1
    }
    new GenericArrayData(res)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("gifBlockMean", this, classOf[GifBlockMeanExpr].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = $self.compute($t);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): GifBlockMeanExpr =
    copy(child = newChild)
}

object GifBlockMeanExpr {
  /** Column API: grid×grid block-mean luminance (e3) of a GIF payload. */
  def gif_block_means(payload: Column, grid: Int): Column =
    GraftColumnBridge.column(
      GifBlockMeanExpr(GraftColumnBridge.expression(payload), grid))

  /** [[gif_block_means]] with the luma model selectable (`bt601 = true`
    * = the JPEG-encoder integer BT.601 reduction, q216). */
  def gif_block_means(payload: Column, grid: Int, bt601: Boolean): Column =
    GraftColumnBridge.column(
      GifBlockMeanExpr(GraftColumnBridge.expression(payload), grid, bt601))
}
