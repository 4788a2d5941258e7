package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** CONTENT-TRUE image perceptual feature for BASELINE JPEG — the
  * dominant web image format, previously visible only to the header
  * tier ([[MediaHeaderExpr]]) and the byte histogram: a re-encoded or
  * resized JPEG twin (the single most common image near-dup case in a
  * crawl corpus) shares not one compressed byte with its original, so
  * content comparison needs the decoded pixels. Baseline JPEG needs no
  * codec dependency: it is Huffman coding + dequantization + an 8×8
  * inverse DCT, all implementable exactly from the public spec
  * (ITU-T T.81) — the same no-new-deps posture as the PNG tier's
  * [[java.util.zip.Inflater]] ([[PngBlockMeanExpr]], the template).
  *
  * The kernel walks the marker stream (guarded advance — the
  * media_header discipline), reads DQT/SOF/DHT/DRI, entropy-decodes
  * every MCU (all components — the bitstream is interleaved, so chroma
  * blocks must be decoded to ADVANCE even though only luma is kept),
  * dequantizes and inverse-transforms the Y blocks, and returns the
  * grid×grid BLOCK-MEAN luminance profile over the Y plane:
  * mean_e3(b) = ⌊1000 · Σ_block Y / |block|⌋, row-major — directly
  * comparable to [[PngBlockMeanExpr]]'s integer-luma profile.
  *
  * The IDCT is fixed-point (12-bit scaled cosines, two separable
  * passes) with the DC-ONLY FAST PATH computed exactly:
  * pixel = clamp(128 + (dc·q + 4) >> 3) — the standard shortcut
  * (every practical decoder has it), and the property that makes a
  * synthesized DC-only fixture integer-exact from its construction,
  * so the catalog oracle replays block means without a decoder.
  *
  * PROGRESSIVE (SOF2) Huffman payloads decode too (r14 verdict item
  * 3 — progressive is a large share of real web JPEGs, often the
  * majority on image-heavy sites): the multi-scan walk accumulates
  * per-component coefficient planes across spectral-selection bands
  * (Ss..Se) and successive-approximation bit positions (Ah/Al) per
  * T.81 G.1.2 — interleaved or single-component DC scans (first pass
  * + one-bit refinements), AC scans with EOB-run coding and the
  * refinement correction-bit walk — then dequantizes + IDCTs the luma
  * plane once after EOI. Because whole coefficient planes are
  * buffered during the scan walk, the progressive pixel cap is
  * tighter: 2^24 Y samples (16.7M px, a 4096×4096) vs baseline's
  * 2^26 — above it the payload stays on the header tier.
  *
  * Supported subset (everything else → null, the [[PcmEnergyExpr]]
  * contract — unsupported shapes stay on the byte-histogram tier):
  * baseline/extended-sequential/progressive Huffman (SOF0/SOF1/SOF2;
  * lossless and arithmetic coding → null), 8-bit precision, 1–4
  * components with sampling factors in {1, 2} and a full-resolution
  * first (luma) component, optional restart intervals, dimensions
  * ≤ 16384 with the Y plane capped at 2^26 samples sequential /
  * 2^24 progressive (a forged SOF cannot bomb the executor). Corrupt
  * payloads — truncated segments, bad Huffman codes, overrun
  * lengths, garbage entropy data, out-of-order progressive scans —
  * return null, never hang, never throw (fuzz-spec-pinned like the
  * PNG and WAV walks).
  */
case class JpegBlockMeanExpr(child: Expression, grid: Int)
    extends UnaryExpression {
  require(grid >= 1 && grid <= 7, "grid must be in [1, 7] (grid^2 sign-bucket bits)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jpeg_block_means needs a binary input, got ${child.dataType.simpleString}")

  import JpegBlockMeanExpr._

  /** Per-row kernel; public so generated code can call it. Null on
    * anything outside the supported subset — never throws.
    */
  def compute(b: Array[Byte]): GenericArrayData = {
    if (b == null || b.length < 4) return null
    def u(i: Int): Int = b(i) & 0xff
    if (u(0) != 0xff || u(1) != 0xd8) return null
    def be16(o: Int): Int = (u(o) << 8) | u(o + 1)

    // --- marker walk up to SOS ---------------------------------------
    val qt = Array.ofDim[Int](4, 64) // zigzag order, as stored
    val qtSeen = new Array[Boolean](4)
    val huff = new Array[HuffTable](8) // [tc*4 + th]
    var w = 0; var h = 0; var nComp = 0
    var compH: Array[Int] = null; var compV: Array[Int] = null
    var compQ: Array[Int] = null; var compId: Array[Int] = null
    var hmax = 0; var vmax = 0
    var dri = 0
    var sosAt = -1
    var compDc: Array[Int] = null; var compAc: Array[Int] = null
    var scanOrder: Array[Int] = null // component indices in scan order
    var progressive = false
    var sosMarkerAt = -1 // progressive: first SOS marker, scan loop entry
    var p = 2
    var done = false
    while (!done) {
      if (p + 4 > b.length) return null
      if (u(p) != 0xff) return null
      var m = u(p + 1)
      // fill bytes: consecutive FFs before a marker code
      var q = p + 1
      while (m == 0xff && q + 1 < b.length) { q += 1; m = u(q) }
      p = q - 1
      if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        p += 2 // SOI again / TEM / stray RSTn: no payload
      }
      else if (m == 0xd9) return null        // EOI before SOS: no image
      else {
        if (p + 4 > b.length) return null
        val len = be16(p + 2)
        if (len < 2 || p + 2 + len > b.length) return null
        val seg = p + 4            // segment payload start
        val segEnd = p + 2 + len   // one past payload
        m match {
          case 0xdb => // DQT: one or more tables
            if (!parseDqt(b, seg, segEnd, qt, qtSeen)) return null
          case 0xc4 => // DHT: one or more tables
            if (!parseDht(b, seg, segEnd, huff)) return null
          case 0xc0 | 0xc1 | 0xc2 => // SOF0/SOF1 sequential; SOF2 progressive
            if (nComp != 0) return null // second frame header
            progressive = m == 0xc2
            if (seg + 6 > segEnd) return null
            if (u(seg) != 8) return null // precision
            h = be16(seg + 1); w = be16(seg + 3)
            nComp = u(seg + 5)
            if (w < 1 || h < 1 || w > 16384 || h > 16384) return null
            if (nComp < 1 || nComp > 4 || seg + 6 + 3 * nComp > segEnd) return null
            if (w.toLong * h > (1L << 26)) return null
            compId = new Array[Int](nComp); compH = new Array[Int](nComp)
            compV = new Array[Int](nComp); compQ = new Array[Int](nComp)
            var c = 0
            while (c < nComp) {
              compId(c) = u(seg + 6 + 3 * c)
              val hv = u(seg + 7 + 3 * c)
              compH(c) = hv >> 4; compV(c) = hv & 0x0f
              compQ(c) = u(seg + 8 + 3 * c)
              if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2 ||
                compQ(c) > 3) return null
              if (compH(c) > hmax) hmax = compH(c)
              if (compV(c) > vmax) vmax = compV(c)
              c += 1
            }
            // the luma (first) component must be full-resolution — true
            // of every practical encoder; anything else → header tier
            if (compH(0) != hmax || compV(0) != vmax) return null
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
              0xcd | 0xce | 0xcf =>
            return null // lossless / arithmetic / hierarchical: unsupported
          case 0xdd => // DRI
            if (len != 4) return null
            dri = be16(seg)
          case 0xda => // SOS
            if (nComp == 0) return null
            if (progressive) {
              // the multi-scan walk parses every scan header itself
              sosMarkerAt = p
              done = true
            } else {
              val ns = u(seg)
              // interleaved full scan only (the baseline norm): every
              // frame component present, in frame order or a permutation
              if (ns != nComp || seg + 1 + 2 * ns + 3 > segEnd) return null
              compDc = new Array[Int](nComp); compAc = new Array[Int](nComp)
              scanOrder = new Array[Int](ns)
              val seenComp = new Array[Boolean](nComp)
              var s = 0
              while (s < ns) {
                val cs = u(seg + 1 + 2 * s)
                val ci = compId.indexOf(cs)
                // a duplicate selector would decode one component twice
                // and another never — corrupt header, not a permutation
                if (ci < 0 || seenComp(ci)) return null
                seenComp(ci) = true
                scanOrder(s) = ci
                compDc(ci) = u(seg + 2 + 2 * s) >> 4
                compAc(ci) = u(seg + 2 + 2 * s) & 0x0f
                if (compDc(ci) > 3 || compAc(ci) > 3) return null
                s += 1
              }
              sosAt = segEnd
              done = true
            }
          case _ => // APPn / COM / anything else with a length: skip
        }
        if (!done) p = segEnd
      }
    }
    if (progressive)
      return computeProgressive(b, sosMarkerAt, qt, qtSeen, huff, w, h,
        nComp, compId, compH, compV, compQ, hmax, vmax, dri)
    if (sosAt < 0) return null
    // every referenced table must exist
    var c = 0
    while (c < nComp) {
      if (!qtSeen(compQ(c))) return null
      if (huff(compDc(c)) == null || huff(4 + compAc(c)) == null) return null
      c += 1
    }

    // --- entropy decode ------------------------------------------------
    // T.81 A.2: a SINGLE-component scan is NON-INTERLEAVED — the MCU is
    // ONE data unit and the blocks cover the component's own grid in
    // raster order, REGARDLESS of its declared sampling factors (those
    // only matter relative to other components). Walking a 2×2-sampled
    // grayscale frame as interleaved MCU tiles would permute block
    // positions (and over-read the stream on non-tile-aligned dims) —
    // silently wrong means. Effective factors collapse to 1×1 here.
    if (nComp == 1) {
      compH(0) = 1; compV(0) = 1; hmax = 1; vmax = 1
    }
    val mcuW = 8 * hmax; val mcuH = 8 * vmax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    val yPlane = new Array[Byte](w * h)
    val br = new BitReader(b, sosAt)
    // Long predictor: a hostile-but-decodable stream could overflow an
    // Int across ~1M blocks into a garbage non-null signature; any
    // accumulated DC outside the coefficient range is corrupt → null
    val pred = new Array[Long](nComp)
    val coef = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    var sinceRestart = 0
    while (mcu < nMcus) {
      if (dri > 0 && sinceRestart == dri) {
        if (!br.restartMarker()) return null
        java.util.Arrays.fill(pred, 0)
        sinceRestart = 0
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var s = 0
      while (s < nComp) {
        val ci = scanOrder(s)
        val dcT = huff(compDc(ci)); val acT = huff(4 + compAc(ci))
        val qtab = qt(compQ(ci))
        var by = 0
        while (by < compV(ci)) {
          var bx = 0
          while (bx < compH(ci)) {
            // DC
            val t = br.decodeHuff(dcT)
            if (t < 0 || t > 15) return null
            val diff = if (t == 0) 0 else {
              val v = br.receive(t)
              if (v < 0) return null
              BitReader.extend(v, t)
            }
            pred(ci) += diff
            if (pred(ci) > 32767 || pred(ci) < -32768) return null
            var nAc = 0
            java.util.Arrays.fill(coef, 0)
            coef(0) = pred(ci).toInt
            // AC
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = br.decodeHuff(acT)
              if (rs < 0) return null
              val r = rs >> 4; val size = rs & 0x0f
              if (size == 0) {
                if (r == 15) k += 16 else eob = true
              } else {
                k += r
                if (k > 63) return null
                val v = br.receive(size)
                if (v < 0) return null
                coef(Zigzag(k)) = BitReader.extend(v, size) * qtab(k)
                nAc += 1
                k += 1
              }
            }
            // only the luma component is transformed; chroma blocks are
            // decoded solely to advance the interleaved bitstream
            if (ci == 0) {
              val px0 = (mx * compH(0) + bx) * 8
              val py0 = (my * compV(0) + by) * 8
              idctBlock(coef, pred(0).toInt * qtab(0), nAc, yPlane, w, h, px0, py0)
            }
            bx += 1
          }
          by += 1
        }
        s += 1
      }
      sinceRestart += 1
      mcu += 1
    }

    gridMeansOf(yPlane, w, h)
  }

  /** grid×grid block means (e3) over a decoded Y plane — the PNG
    * formula, shared by the sequential and progressive paths.
    */
  private def gridMeansOf(yPlane: Array[Byte], w: Int, h: Int): GenericArrayData = {
    val g2 = grid * grid
    val sums = new Array[Long](g2)
    val counts = new Array[Long](g2)
    var y = 0
    while (y < h) {
      val byi = ((y.toLong * grid) / h).toInt
      var x = 0
      while (x < w) {
        val bi = byi * grid + ((x.toLong * grid) / w).toInt
        sums(bi) += yPlane(y * w + x) & 0xff
        counts(bi) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Long](g2)
    var i = 0
    while (i < g2) {
      out(i) = if (counts(i) == 0) 0L else (sums(i) * 1000L) / counts(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Dequantized-coefficient 8×8 inverse DCT into the Y plane (clipped
    * at the image edge). `coef` holds dequantized values in NATURAL
    * order except coef(0), which is passed dequantized via `dc0`;
    * `nAc` counts nonzero AC terms so the DC-only case takes the EXACT
    * shortcut pixel = clamp(128 + (dc·q + 4) >> 3) — the property the
    * DC-only fixture oracle relies on.
    */
  private def idctBlock(coef: Array[Int], dc0: Int, nAc: Int,
      plane: Array[Byte], w: Int, h: Int, px0: Int, py0: Int): Unit = {
    if (nAc == 0) {
      val v = clamp(128 + ((dc0 + 4) >> 3))
      var y = py0
      val yEnd = math.min(py0 + 8, h)
      val xEnd = math.min(px0 + 8, w)
      while (y < yEnd) {
        var x = px0
        while (x < xEnd) { plane(y * w + x) = v.toByte; x += 1 }
        y += 1
      }
      return
    }
    coef(0) = dc0
    // separable fixed-point IDCT: k(u,x) = C(u)·cos((2x+1)uπ/16)/2
    // scaled ×4096; rows then columns, rounding at each pass
    val tmp = new Array[Int](64)
    var v = 0
    while (v < 8) { // row pass: for each coefficient row v, over u
      var x = 0
      while (x < 8) {
        var acc = 0L
        var uu = 0
        while (uu < 8) {
          acc += coef(v * 8 + uu).toLong * CosTab(uu * 8 + x)
          uu += 1
        }
        tmp(v * 8 + x) = ((acc + 2048L) >> 12).toInt
        x += 1
      }
      v += 1
    }
    val yEnd = math.min(py0 + 8, h)
    val xEnd = math.min(px0 + 8, w)
    var y = 0
    while (y < 8) {
      val py = py0 + y
      if (py < yEnd) {
        var x = 0
        while (x < 8) {
          val px = px0 + x
          if (px < xEnd) {
            var acc = 0L
            var vv = 0
            while (vv < 8) {
              acc += tmp(vv * 8 + x).toLong * CosTab(vv * 8 + y)
              vv += 1
            }
            plane(py * w + px) = clamp(128 + ((acc + 2048L) >> 12).toInt).toByte
          }
          x += 1
        }
      }
      y += 1
    }
  }

  /** PROGRESSIVE (SOF2) multi-scan decode (T.81 G.1.2): accumulate
    * per-component coefficient planes across spectral-selection /
    * successive-approximation scans, then dequantize + IDCT the luma
    * plane once at EOI. Every component's coefficients are tracked —
    * not just luma — because AC refinement scans read correction bits
    * conditioned on which coefficients are already nonzero, so
    * advancing the bitstream through a chroma scan REQUIRES the chroma
    * coefficient history. Coefficients are Shorts (an 8-bit-precision
    * JPEG coefficient is ≤ 11 bits + the point transform; anything
    * wider is corrupt → null), entered at `startP` = the first SOS
    * marker position. Null on anything corrupt or out of subset.
    */
  private def computeProgressive(b: Array[Byte], startP: Int,
      qt: Array[Array[Int]], qtSeen: Array[Boolean], huff: Array[HuffTable],
      w: Int, h: Int, nComp: Int, compId: Array[Int],
      compH: Array[Int], compV: Array[Int], compQ: Array[Int],
      hmax0: Int, vmax0: Int, dri0: Int): GenericArrayData = {
    def u(i: Int): Int = b(i) & 0xff
    def be16(o: Int): Int = (u(o) << 8) | u(o + 1)
    var hmax = hmax0; var vmax = vmax0
    // T.81 A.2: single-component data is non-interleaved regardless of
    // declared factors (the sequential path's rule, same reason)
    if (nComp == 1) { compH(0) = 1; compV(0) = 1; hmax = 1; vmax = 1 }
    // tighter cap than sequential: whole coefficient planes are live
    // for the duration of the scan walk (shorts: ~2 bytes/sample/comp)
    if (w.toLong * h > (1L << 24)) return null
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val bwPad = Array.tabulate(nComp)(c => mcusX * compH(c))
    val bhPad = Array.tabulate(nComp)(c => mcusY * compV(c))
    val bwAct = Array.tabulate(nComp)(c => ((w * compH(c) + hmax - 1) / hmax + 7) / 8)
    val bhAct = Array.tabulate(nComp)(c => ((h * compV(c) + vmax - 1) / vmax + 7) / 8)
    // TOTAL allocation cap across components (2^25 Shorts = 64 MiB —
    // the sequential tier's envelope): a forged 4-full-res-component
    // SOF2 at the pixel cap would otherwise allocate 2x that from a
    // ~100-byte header. 4:2:0 at the full pixel cap fits (1.5x luma);
    // 4:4:4 at the cap does not and stays on the header tier.
    var totalShorts = 0L
    var tc = 0
    while (tc < nComp) {
      totalShorts += bwPad(tc).toLong * bhPad(tc) * 64L
      tc += 1
    }
    if (totalShorts > (1L << 25)) return null
    // per-component planes allocate LAZILY at the first scan that
    // references the component — header bytes alone allocate nothing
    val coefs = new Array[Array[Short]](nComp)
    val dcDone = new Array[Boolean](nComp)
    // successive-approximation progression state per (component,
    // zigzag index): -1 = no first pass yet, else the coefficient's
    // current point-transform Al. T.81 G.1.1.1: a first pass (Ah = 0)
    // must be the coefficient's first touch, and a refinement must
    // continue from EXACTLY Al + 1 — anything else (duplicate first
    // pass, skipped bit level, overlapping band re-delivery) is a
    // corrupt progression and decodes to null, never to a garbage
    // signature.
    val alState = Array.fill(nComp)(Array.fill[Byte](64)(-1))
    var dri = dri0
    var sawScan = false
    var p = startP
    while (true) {
      if (p + 2 > b.length) return null // ran out before EOI: truncated
      if (u(p) != 0xff) return null
      var m = u(p + 1)
      var q = p + 1
      while (m == 0xff && q + 1 < b.length) { q += 1; m = u(q) }
      p = q - 1
      if (m == 0xd9) {
        // --- EOI: dequantize + IDCT the luma plane -----------------
        if (!sawScan || !dcDone(0) || !qtSeen(compQ(0))) return null
        val qtab = qt(compQ(0))
        val yPlane = new Array[Byte](w * h)
        val c0 = coefs(0)
        val stride = bwPad(0)
        val nat = new Array[Int](64)
        var by = 0
        while (by < bhAct(0)) {
          var bx = 0
          while (bx < bwAct(0)) {
            val base = (by * stride + bx) * 64
            java.util.Arrays.fill(nat, 0)
            var nAc = 0
            var k = 1
            while (k < 64) {
              val v = c0(base + k)
              if (v != 0) { nat(Zigzag(k)) = v * qtab(k); nAc += 1 }
              k += 1
            }
            idctBlock(nat, c0(base) * qtab(0), nAc, yPlane, w, h, bx * 8, by * 8)
            bx += 1
          }
          by += 1
        }
        return gridMeansOf(yPlane, w, h)
      } else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        p += 2 // TEM / stray RSTn
      } else {
        if (p + 4 > b.length) return null
        val len = be16(p + 2)
        if (len < 2 || p + 2 + len > b.length) return null
        val seg = p + 4; val segEnd = p + 2 + len
        if (m == 0xdb) {
          if (!parseDqt(b, seg, segEnd, qt, qtSeen)) return null
          p = segEnd
        } else if (m == 0xc4) {
          if (!parseDht(b, seg, segEnd, huff)) return null
          p = segEnd
        } else if (m == 0xdd) {
          if (len != 4) return null
          dri = be16(seg)
          p = segEnd
        } else if (m >= 0xc0 && m <= 0xcf) {
          return null // a second frame header (incl. DAC 0xcc): corrupt
        } else if (m == 0xda) {
          // --- one scan ----------------------------------------------
          val ns = u(seg)
          if (ns < 1 || ns > nComp || seg + 1 + 2 * ns + 3 > segEnd) return null
          val sc = new Array[Int](ns)
          val scDc = new Array[Int](ns); val scAc = new Array[Int](ns)
          val seenComp = new Array[Boolean](nComp)
          var s = 0
          while (s < ns) {
            val ci = compId.indexOf(u(seg + 1 + 2 * s))
            if (ci < 0 || seenComp(ci)) return null
            seenComp(ci) = true
            sc(s) = ci
            scDc(s) = u(seg + 2 + 2 * s) >> 4
            scAc(s) = u(seg + 2 + 2 * s) & 0x0f
            if (scDc(s) > 3 || scAc(s) > 3) return null
            s += 1
          }
          val ss = u(seg + 1 + 2 * ns); val se = u(seg + 2 + 2 * ns)
          val ah = u(seg + 3 + 2 * ns) >> 4; val al = u(seg + 3 + 2 * ns) & 0x0f
          // progressive scan-header laws: DC scans are the (0,0) band;
          // AC scans carry exactly one component; a refinement lowers
          // the point transform by exactly one bit
          if (se > 63 || (ss == 0 && se != 0) ||
            (ss > 0 && (ss > se || ns != 1)) ||
            al > 13 || (ah != 0 && ah != al + 1)) return null
          val br = new BitReader(b, segEnd)
          // lazy plane allocation: only components a scan references
          var ai = 0
          while (ai < ns) {
            val ci = sc(ai)
            if (coefs(ci) == null)
              coefs(ci) = new Array[Short](bwPad(ci) * bhPad(ci) * 64)
            ai += 1
          }
          if (ss == 0) {
            var i = 0
            while (i < ns) {
              val st = alState(sc(i))(0)
              if (ah == 0) {
                if (huff(scDc(i)) == null) return null
                if (st != -1) return null // duplicate DC first pass
              } else if (st != ah) {
                return null // refinement not continuing from Al + 1
              }
              i += 1
            }
            if (!decodeDcScan(br, coefs, sc, scDc, ah, al, huff, dri,
              mcusX, mcusY, bwPad, bwAct, bhAct, compH, compV)) return null
            var i2 = 0
            while (i2 < ns) {
              alState(sc(i2))(0) = al.toByte
              if (ah == 0) dcDone(sc(i2)) = true
              i2 += 1
            }
          } else {
            val ci = sc(0)
            if (!dcDone(ci)) return null // T.81: DC first scan precedes AC
            var k = ss
            while (k <= se) {
              val st = alState(ci)(k)
              if (ah == 0) { if (st != -1) return null } // re-delivered band
              else if (st != ah) return null // skipped/duplicated bit level
              k += 1
            }
            val acT = huff(4 + scAc(0))
            if (acT == null) return null
            if (!decodeAcScan(br, coefs(ci), bwPad(ci), bwAct(ci), bhAct(ci),
              acT, ss, se, ah, al, dri)) return null
            var k2 = ss
            while (k2 <= se) { alState(ci)(k2) = al.toByte; k2 += 1 }
          }
          sawScan = true
          val np = br.nextMarkerPos()
          if (np < 0) return null
          p = np
        } else {
          p = segEnd // APPn / COM / DNL: skip
        }
      }
    }
    null // unreachable: the loop exits only via return
  }

  /** One progressive DC scan — interleaved MCU walk when the scan
    * carries more than one component, the component's own block grid
    * otherwise. First pass (ah == 0) Huffman-decodes diffs into
    * coef << al; a refinement appends one raw bit per block at al.
    */
  private def decodeDcScan(br: BitReader, coefs: Array[Array[Short]],
      sc: Array[Int], scDc: Array[Int], ah: Int, al: Int,
      huff: Array[HuffTable], dri: Int, mcusX: Int, mcusY: Int,
      bwPad: Array[Int], bwAct: Array[Int], bhAct: Array[Int],
      compH: Array[Int], compV: Array[Int]): Boolean = {
    val ns = sc.length
    val interleaved = ns > 1
    val pred = new Array[Long](ns)
    val nMcus = if (interleaved) mcusX * mcusY else bwAct(sc(0)) * bhAct(sc(0))
    var mcu = 0
    var sinceRestart = 0
    while (mcu < nMcus) {
      if (dri > 0 && sinceRestart == dri) {
        if (!br.restartMarker()) return false
        java.util.Arrays.fill(pred, 0L)
        sinceRestart = 0
      }
      var s = 0
      while (s < ns) {
        val ci = sc(s)
        val coef = coefs(ci)
        val hC = if (interleaved) compH(ci) else 1
        val vC = if (interleaved) compV(ci) else 1
        var by = 0
        while (by < vC) {
          var bx = 0
          while (bx < hC) {
            val bX = if (interleaved) (mcu % mcusX) * compH(ci) + bx
                     else mcu % bwAct(ci)
            val bY = if (interleaved) (mcu / mcusX) * compV(ci) + by
                     else mcu / bwAct(ci)
            val idx = (bY * bwPad(ci) + bX) * 64
            if (ah == 0) {
              val t = br.decodeHuff(huff(scDc(s)))
              if (t < 0 || t > 15) return false
              val diff = if (t == 0) 0 else {
                val v = br.receive(t)
                if (v < 0) return false
                BitReader.extend(v, t)
              }
              pred(s) += diff
              val sv = pred(s) << al
              if (sv > 32767 || sv < -32768) return false
              coef(idx) = sv.toShort
            } else {
              val bit = br.bit()
              if (bit < 0) return false
              if (bit == 1) coef(idx) = (coef(idx) | (1 << al)).toShort
            }
            bx += 1
          }
          by += 1
        }
        s += 1
      }
      sinceRestart += 1
      mcu += 1
    }
    true
  }

  /** One progressive AC scan over a single component's band ss..se.
    * First pass (ah == 0): run-length symbols with EOB-run coding,
    * new coefficients entered at << al. Refinement (ah > 0, T.81
    * G.1.2.3): each symbol either starts an EOB run, inserts a new
    * ±1<<al coefficient after skipping `r` zero-HISTORY positions, or
    * (ZRL) skips 16 — and every already-nonzero coefficient passed on
    * the way reads one correction bit that may append the al-bit
    * toward its sign.
    */
  private def decodeAcScan(br: BitReader, coef: Array[Short], stride: Int,
      bw: Int, bh: Int, acT: HuffTable, ss: Int, se: Int, ah: Int, al: Int,
      dri: Int): Boolean = {
    val p1 = 1 << al; val m1 = -1 << al
    var eobrun = 0
    val nBlocks = bw * bh
    var blk = 0
    var sinceRestart = 0
    while (blk < nBlocks) {
      if (dri > 0 && sinceRestart == dri) {
        if (!br.restartMarker()) return false
        eobrun = 0 // an EOB run cannot cross a restart boundary
        sinceRestart = 0
      }
      val base = ((blk / bw) * stride + (blk % bw)) * 64
      if (ah == 0) {
        if (eobrun > 0) eobrun -= 1
        else {
          var k = ss
          var brk = false
          while (k <= se && !brk) {
            val rs = br.decodeHuff(acT)
            if (rs < 0) return false
            val r = rs >> 4; val sz = rs & 0x0f
            if (sz == 0) {
              if (r < 15) {
                eobrun = (1 << r) - 1 // this block ends here; run covers the rest
                if (r > 0) {
                  val x = br.receive(r)
                  if (x < 0) return false
                  eobrun += x
                }
                brk = true
              } else k += 16 // ZRL
            } else {
              k += r
              if (k > se) return false
              val v = br.receive(sz)
              if (v < 0) return false
              val sv = BitReader.extend(v, sz).toLong << al
              if (sv > 32767 || sv < -32768) return false
              coef(base + k) = sv.toShort
              k += 1
            }
          }
        }
      } else {
        var k = ss
        if (eobrun == 0) {
          var brk = false
          while (k <= se && !brk) {
            val rs = br.decodeHuff(acT)
            if (rs < 0) return false
            var r = rs >> 4; val sz = rs & 0x0f
            var newVal = 0
            if (sz == 0) {
              if (r < 15) {
                eobrun = 1 << r // INCLUDES this block (consumed below)
                if (r > 0) {
                  val x = br.receive(r)
                  if (x < 0) return false
                  eobrun += x
                }
                brk = true
              }
              // r == 15: ZRL — skip 16 zero-history positions below
            } else {
              if (sz != 1) return false // refinement inserts only ±1<<al
              val bt = br.bit()
              if (bt < 0) return false
              newVal = if (bt == 1) p1 else m1
            }
            if (!brk) {
              var placed = false
              while (k <= se && !placed) {
                val idx = base + k
                if (coef(idx) != 0) {
                  val bt = br.bit()
                  if (bt < 0) return false
                  if (bt == 1 && (coef(idx) & p1) == 0)
                    coef(idx) = (coef(idx) + (if (coef(idx) >= 0) p1 else m1)).toShort
                } else if (r == 0) {
                  if (newVal != 0) coef(idx) = newVal.toShort
                  placed = true
                } else r -= 1
                k += 1
              }
              if (!placed && newVal != 0) return false // band ended mid-insert
            }
          }
        }
        if (eobrun > 0) {
          // correction bits for the remaining nonzero history of this block
          while (k <= se) {
            val idx = base + k
            if (coef(idx) != 0) {
              val bt = br.bit()
              if (bt < 0) return false
              if (bt == 1 && (coef(idx) & p1) == 0)
                coef(idx) = (coef(idx) + (if (coef(idx) >= 0) p1 else m1)).toShort
            }
            k += 1
          }
          eobrun -= 1
        }
      }
      sinceRestart += 1
      blk += 1
    }
    true
  }

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jpegBlockMean", this, classOf[JpegBlockMeanExpr].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = $self.compute($t);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): JpegBlockMeanExpr =
    copy(child = newChild)
}

object JpegBlockMeanExpr {
  /** Column API: grid×grid block-mean luminance (e3) of a baseline
    * JPEG payload's decoded Y plane.
    */
  def jpeg_block_means(payload: Column, grid: Int): Column =
    GraftColumnBridge.column(
      JpegBlockMeanExpr(GraftColumnBridge.expression(payload), grid))

  /** Zigzag scan position → natural (row-major) position. */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** k(u,x) = C(u)·cos((2x+1)uπ/16)/2 scaled ×4096, u-major. */
  val CosTab: Array[Int] = {
    val t = new Array[Int](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = math.round(
          cu * math.cos((2 * x + 1) * u * math.Pi / 16.0) / 2.0 * 4096.0).toInt
        x += 1
      }
      u += 1
    }
    t
  }

  /** Parse a DQT segment payload (one or more 8-bit tables, zigzag
    * order) into `qt`/`qtSeen`; false on corrupt. Shared by the
    * header walk and the progressive inter-scan walk.
    */
  private[plans] def parseDqt(b: Array[Byte], seg: Int, segEnd: Int,
      qt: Array[Array[Int]], qtSeen: Array[Boolean]): Boolean = {
    var o = seg
    while (o < segEnd) {
      val pq = (b(o) & 0xff) >> 4; val tq = b(o) & 0x0f
      if (pq != 0 || tq > 3 || o + 1 + 64 > segEnd) return false
      var k = 0
      while (k < 64) { qt(tq)(k) = b(o + 1 + k) & 0xff; k += 1 }
      qtSeen(tq) = true
      o += 65
    }
    true
  }

  /** Parse a DHT segment payload (one or more tables) into `huff`;
    * false on corrupt (incl. an over-full code). Shared by the header
    * walk and the progressive inter-scan walk — progressive files
    * routinely redefine tables between scans.
    */
  private[plans] def parseDht(b: Array[Byte], seg: Int, segEnd: Int,
      huff: Array[HuffTable]): Boolean = {
    var o = seg
    while (o < segEnd) {
      val tc = (b(o) & 0xff) >> 4; val th = b(o) & 0x0f
      if (tc > 1 || th > 3 || o + 17 > segEnd) return false
      val counts = new Array[Int](17)
      var total = 0
      var l = 1
      while (l <= 16) { counts(l) = b(o + l) & 0xff; total += counts(l); l += 1 }
      if (total > 256 || o + 17 + total > segEnd) return false
      val vals = new Array[Int](total)
      var k = 0
      while (k < total) { vals(k) = b(o + 17 + k) & 0xff; k += 1 }
      val t = HuffTable.build(counts, vals)
      if (t == null) return false
      huff(tc * 4 + th) = t
      o += 17 + total
    }
    true
  }

  /** Canonical JPEG Huffman decode table (T.81 annex C/F layout). */
  final class HuffTable(
      val minCode: Array[Int], val maxCode: Array[Int],
      val valPtr: Array[Int], val vals: Array[Int])

  object HuffTable {
    /** Build from the DHT counts (index 1..16) + symbol list; null on
      * an over-full code (more codes at a length than the prefix space
      * allows — corrupt table).
      */
    def build(counts: Array[Int], vals: Array[Int]): HuffTable = {
      val minCode = new Array[Int](17)
      val maxCode = new Array[Int](17)
      val valPtr = new Array[Int](17)
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (code > (1 << l) - counts(l) && counts(l) > 0) return null
        valPtr(l) = k
        minCode(l) = code
        code += counts(l)
        k += counts(l)
        maxCode(l) = if (counts(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
      new HuffTable(minCode, maxCode, valPtr, vals)
    }
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * unstuffing; any marker (0xFF followed by non-zero, non-fill)
    * ends the stream — reads past it return -1, and [[restartMarker]]
    * consumes an expected RSTn.
    */
  final class BitReader(b: Array[Byte], start: Int) {
    private var p = start
    private var acc = 0
    private var nBits = 0
    private var atMarker = false

    private def fill(): Boolean = {
      if (atMarker || p >= b.length) return false
      val v = b(p) & 0xff
      if (v == 0xff) {
        if (p + 1 >= b.length) { atMarker = true; return false }
        val n = b(p + 1) & 0xff
        if (n == 0x00) { p += 2; acc = (acc << 8) | 0xff; nBits += 8; true }
        else { atMarker = true; false } // a real marker: stop here
      } else { p += 1; acc = (acc << 8) | v; nBits += 8; true }
    }

    /** Next bit, or -1 at end/marker. */
    def bit(): Int = {
      if (nBits == 0 && !fill()) return -1
      nBits -= 1
      (acc >> nBits) & 1
    }

    /** `n` raw bits MSB-first, or -1. n <= 16. */
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val bt = bit()
        if (bt < 0) return -1
        v = (v << 1) | bt
        i += 1
      }
      v
    }

    /** One Huffman symbol, or -1 on end/invalid code. */
    def decodeHuff(t: HuffTable): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        val bt = bit()
        if (bt < 0) return -1
        code = (code << 1) | bt
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l)) {
          if (code < t.minCode(l)) return -1
          return t.vals(t.valPtr(l) + code - t.minCode(l))
        }
        l += 1
      }
      -1
    }

    /** Byte-align and locate the next marker (0xFF + non-zero,
      * non-stuffing code) at or after the current byte position; -1 if
      * the stream ends first. Used between progressive scans: the
      * entropy data of a completed scan ends at pad bits, and the next
      * segment's marker follows (possibly behind 0xFF fill bytes).
      */
    def nextMarkerPos(): Int = {
      nBits = 0; acc = 0
      var q = p
      while (q + 1 < b.length) {
        if ((b(q) & 0xff) == 0xff && (b(q + 1) & 0xff) != 0x00) return q
        q += 1
      }
      -1
    }

    /** Byte-align and consume an RSTn marker; false if absent. */
    def restartMarker(): Boolean = {
      nBits = 0; acc = 0
      if (!atMarker) {
        // the marker bytes are still unconsumed input
        if (p + 1 >= b.length || (b(p) & 0xff) != 0xff) return false
      }
      if (p + 1 >= b.length) return false
      val m = b(p + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      p += 2
      atMarker = false
      true
    }
  }

  /** DC-diff magnitude-category extension (T.81 F.2.2.1): a `size`-bit
    * raw value v decodes to v when the top bit is set, else
    * v − 2^size + 1.
    */
  object BitReader {
    def extend(v: Int, size: Int): Int =
      if (size == 0) 0
      else if (v < (1 << (size - 1))) v - (1 << size) + 1
      else v
  }
}
