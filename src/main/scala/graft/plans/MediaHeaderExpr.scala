package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native media-container header parser: binary payload in, typed
  * header struct out — the header-aware tier between "opaque bytes"
  * and full codec decode (which this container cannot do; see
  * `operators.Multimodal`). Parses the real container layouts:
  *
  *  - PNG: 8-byte signature, then the IHDR chunk's big-endian
  *    width/height and the color-type byte (channels per the PNG
  *    spec: gray 1, rgb 3, palette 1, gray+alpha 2, rgba 4);
  *  - JPEG: FF D8, then a MARKER WALK over variable-length segments
  *    (APPn/COM/quant tables…) to the first SOF frame header
  *    (C0–CF minus C4/C8/CC), whose big-endian height/width and
  *    component count are the image dims — real JPEGs front-load
  *    arbitrary APP segments, so fixed offsets would be wrong;
  *  - WAV: RIFF/WAVE, then a CHUNK WALK (word-aligned sizes) to
  *    `fmt ` (channels, sample rate, block align) and `data`
  *    (frame count = data bytes / block align);
  *  - GIF: GIF87a/89a logical-screen dims, palette channels (3),
  *    and n_frames = IMAGE-DESCRIPTOR count from a walk that skips
  *    LZW data sub-blocks by length arithmetic — animation
  *    detection with zero decode (truncated tails keep the frames
  *    counted so far).
  *
  * Anything else parses as fmt='unknown' with null fields — never an
  * error, because a 100 TB media crawl always contains garbage.
  * Native Expression (not a UDF): this runs once per payload in the
  * ingest scan, and the struct is built directly in catalyst form.
  */
case class MediaHeaderExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MediaHeaderExpr.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"media_header needs a binary input, got ${child.dataType.simpleString}")

  /** Per-row kernel; public so generated code can call it. */
  def compute(b: Array[Byte]): InternalRow = {
    def u(i: Int): Int = b(i) & 0xff
    def be16(o: Int): Long = ((u(o) << 8) | u(o + 1)).toLong
    def be32(o: Int): Long =
      ((u(o).toLong << 24) | (u(o + 1) << 16) | (u(o + 2) << 8) | u(o + 3))
    def le16(o: Int): Long = ((u(o + 1) << 8) | u(o)).toLong
    def le32(o: Int): Long =
      ((u(o + 3).toLong << 24) | (u(o + 2) << 16) | (u(o + 1) << 8) | u(o))
    def ascii(o: Int, n: Int): String =
      new String(b, o, n, java.nio.charset.StandardCharsets.US_ASCII)
    def row(fmt: String, w: Any, h: Any, ch: Any, rate: Any, frames: Any) =
      InternalRow(UTF8String.fromString(fmt), w, h, ch, rate, frames)
    val unknown = row("unknown", null, null, null, null, null)
    if (b == null || b.length < 4) return unknown

    // PNG: signature + IHDR (always the first chunk, fixed offsets)
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b.length >= 26 && pngSig.indices.forall(i => u(i) == pngSig(i)) &&
        ascii(12, 4) == "IHDR") {
      val channels: Long = u(25) match {
        case 0 => 1L; case 2 => 3L; case 3 => 1L; case 4 => 2L; case 6 => 4L
        case _ => return unknown
      }
      return row("png", be32(16), be32(20), channels, null, null)
    }

    // GIF87a/89a: logical-screen dims + FRAME COUNT (image descriptors
    // walked with data sub-blocks SKIPPED, not decoded — so an
    // animated GIF reports its frame count from pure length
    // arithmetic). Palette color ⇒ channels = 3. Guarded advance like
    // the WAV walk: a truncated tail keeps whatever was counted.
    if (b.length >= 13 && ascii(0, 3) == "GIF" &&
        (ascii(3, 3) == "87a" || ascii(3, 3) == "89a")) {
      val w = le16(6); val h = le16(8)
      var p = 13
      if ((u(10) & 0x80) != 0) p += 3 * (1 << ((u(10) & 7) + 1)) // GCT
      // length-prefixed data sub-blocks until the 0 terminator — the
      // one skip shared by the extension and image-descriptor arms
      def skipSubBlocks(): Unit = {
        while (p < b.length && u(p) != 0) p += 1 + u(p)
        p += 1
      }
      var frames = 0L
      var done = false
      while (!done && p < b.length) {
        u(p) match {
          case 0x3b => done = true // trailer
          case 0x21 => // extension: label + sub-blocks
            p += 2
            skipSubBlocks()
          case 0x2c => // image descriptor (+ optional LCT + LZW blocks)
            if (p + 10 > b.length) { done = true }
            else {
              frames += 1
              val packed = u(p + 9)
              p += 10
              if ((packed & 0x80) != 0) p += 3 * (1 << ((packed & 7) + 1))
              p += 1 // LZW min code size
              skipSubBlocks()
            }
          case _ => done = true // corrupt block introducer
        }
      }
      return row("gif", w, h, 3L, null, if (frames > 0) frames else null)
    }

    // JPEG: FF D8, marker walk to the first SOF segment
    if (u(0) == 0xff && u(1) == 0xd8) {
      var p = 2
      while (p + 3 < b.length) {
        if (u(p) != 0xff) return unknown
        val m = u(p + 1)
        if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) p += 2
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (p + 9 >= b.length) return unknown
          return row("jpeg", be16(p + 7), be16(p + 5), u(p + 9).toLong, null, null)
        } else {
          val len = be16(p + 2).toInt
          if (len < 2) return unknown
          p += 2 + len
        }
      }
      return unknown
    }

    // WAV: RIFF/WAVE, chunk walk (word-aligned) to fmt + data
    if (b.length >= 12 && ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") {
      var p = 12
      var channels = -1L; var rate = -1L; var blockAlign = -1L; var dataSz = -1L
      while (p + 8 <= b.length) {
        val id = ascii(p, 4)
        val sz = le32(p + 4)
        if (id == "fmt " && p + 8 + 16 <= b.length) {
          channels = le16(p + 10)
          rate = le32(p + 12)
          blockAlign = le16(p + 20)
        } else if (id == "data") dataSz = sz
        // Advance in Long space: `sz` is an unsigned 32-bit size (up to
        // 4294967295), so Int arithmetic wraps negative for sizes >= 2^31
        // (a crafted 0xFFFFFFF8 size would make the step exactly 0 — an
        // infinite loop on the executor). A declared size that overruns
        // the payload ends the walk; whatever was parsed so far stands
        // (a truncated final `data` chunk still yields its frame count).
        val next = p.toLong + 8L + sz + (sz & 1L)
        if (next <= p || next > b.length.toLong) p = b.length
        else p = next.toInt
      }
      if (channels > 0 && rate > 0 && blockAlign > 0 && dataSz >= 0)
        return row("wav", null, null, channels, rate, dataSz / blockAlign)
      return unknown
    }
    unknown
  }

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("mediaHeader", this, classOf[MediaHeaderExpr].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): MediaHeaderExpr =
    copy(child = newChild)
}

object MediaHeaderExpr {
  val schema: StructType = StructType(Seq(
    StructField("fmt", StringType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("channels", LongType, nullable = true),
    StructField("sample_rate", LongType, nullable = true),
    StructField("n_frames", LongType, nullable = true)))

  /** Column API: native media-container header parser. */
  def media_header(payload: Column): Column =
    GraftColumnBridge.column(MediaHeaderExpr(GraftColumnBridge.expression(payload)))
}
