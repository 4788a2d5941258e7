package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** CONTENT-TRUE audio perceptual feature for the one audio format the
  * header tier can fully locate without codec dependencies: 16-bit PCM
  * WAV. The [[MediaHeaderExpr]] chunk walk (same guarded advance)
  * finds `fmt ` and `data`; the samples themselves are then just
  * little-endian int16, so the kernel computes the per-band ENERGY
  * PROFILE — the data chunk's sample sequence split into `bands` equal
  * time segments, Σ|sample| per segment — in one pass, integer-exact.
  *
  * Why energy and not the byte histogram: a volume-scaled copy
  * (every sample × c) scales every band by the same c, so the
  * NORMALIZED profile — and the occupancy-sign bucket downstream — is
  * invariant, and the cross-scaled L1 verification is exactly 0; the
  * whole-payload byte histogram sees completely different byte values
  * and misses the twin. A re-encoded container (different junk
  * chunks, different chunk order) around the same PCM yields the
  * identical profile, because only the located `data` bytes enter it.
  *
  * Returns null for anything that is not a parseable 16-bit PCM WAV
  * (compressed formats stay on the byte-histogram tier); corrupt
  * sizes follow the media_header contract — never a hang, never an
  * error. A data chunk declared past the payload end truncates to the
  * bytes present.
  */
case class PcmEnergyExpr(child: Expression, bands: Int)
    extends UnaryExpression {
  require(bands >= 1 && bands <= 64, "bands must be in [1, 64]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pcm_energy needs a binary input, got ${child.dataType.simpleString}")

  /** Per-row kernel; public so generated code can call it. */
  def compute(b: Array[Byte]): GenericArrayData = {
    if (b == null || b.length < 12) return null
    def u(i: Int): Int = b(i) & 0xff
    def ascii(o: Int, n: Int): String =
      new String(b, o, n, java.nio.charset.StandardCharsets.US_ASCII)
    def le16(o: Int): Int = (u(o + 1) << 8) | u(o)
    def le32(o: Int): Long =
      ((u(o + 3).toLong << 24) | (u(o + 2) << 16) | (u(o + 1) << 8) | u(o))
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return null
    var p = 12
    var pcm16 = false
    var dataOff = -1; var dataLen = 0
    while (p + 8 <= b.length) {
      val id = ascii(p, 4)
      val sz = le32(p + 4)
      if (id == "fmt " && p + 8 + 16 <= b.length) {
        val audioFormat = le16(p + 8)
        val bits = if (p + 8 + 16 <= b.length) le16(p + 22) else 0
        pcm16 = audioFormat == 1 && bits == 16
      } else if (id == "data" && dataOff < 0) {
        dataOff = p + 8
        dataLen = math.min(sz, (b.length - dataOff).toLong).toInt
      }
      // guarded advance (the media_header discipline): Long space,
      // stop on overrun or non-progress
      val next = p.toLong + 8L + sz + (sz & 1L)
      if (next <= p || next > b.length.toLong) p = b.length
      else p = next.toInt
    }
    if (!pcm16 || dataOff < 0) return null
    val ns = dataLen / 2
    if (ns == 0) return null
    val acc = new Array[Long](bands)
    var i = 0
    while (i < ns) {
      val s = ((b(dataOff + 2 * i + 1) << 8) |
        (b(dataOff + 2 * i) & 0xff)).toShort.toLong
      acc(((i.toLong * bands) / ns).toInt) += math.abs(s)
      i += 1
    }
    new GenericArrayData(acc)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pcmEnergy", this, classOf[PcmEnergyExpr].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = $self.compute($t);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PcmEnergyExpr =
    copy(child = newChild)
}

object PcmEnergyExpr {
  /** Column API: per-band |sample| energy of a 16-bit PCM WAV payload. */
  def pcm_energy(payload: Column, bands: Int): Column =
    GraftColumnBridge.column(
      PcmEnergyExpr(GraftColumnBridge.expression(payload), bands))
}
