package graft.parse

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** FLAC container metadata probe — `flac_meta(binary)` returns
  * struct(ok, sample_rate, channels, bits_per_sample, total_samples,
  * duration_ms, n_blocks, has_tags) from the "fLaC" metadata-block
  * walk; no audio decode (FLAC's LPC subframe decoding is codec
  * territory — the established stub boundary; the METADATA layer is
  * public-spec byte layout, the q144/q153 advisory posture). Lossless
  * audio corpora ship as FLAC, and routing needs exactly these fields:
  * duration bucketing, sample-rate/bit-depth gates, tag presence.
  *
  * Layout (public FLAC format spec): "fLaC", then metadata blocks —
  * 1-byte header (bit 7 = last-block flag, bits 0-6 = type) + 24-bit
  * big-endian length + payload. The FIRST block must be STREAMINFO
  * (type 0, 34 bytes): 16-bit min/max blocksize, 24-bit min/max
  * framesize, then a packed 64-bit group — sample rate (20 bits),
  * channels-1 (3), bits-per-sample-1 (5), total samples (36) — and a
  * 16-byte MD5 of the unencoded audio. duration_ms is the all-integer
  * total_samples·1000/sample_rate ([[MpegAudioMetaExpr]]'s contract).
  *
  * Strict walk: bad magic, a non-STREAMINFO first block, a block
  * length past payload end, a never-terminating block chain, zero
  * sample rate, or a reserved block type (127) yields ok=false with
  * null fields — never an exception. Audio frames after the last
  * metadata block are not parsed (any trailing bytes are legal). */
case class FlacMetaExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"flac_meta requires binary, got ${t.catalogString}")
  }

  override def dataType: DataType = FlacMetaExpr.schema

  override protected def nullSafeEval(input: Any): Any =
    FlacMetaExpr.meta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.parse.FlacMetaExpr.meta($c)")

  override protected def withNewChildInternal(newChild: Expression): FlacMetaExpr =
    copy(child = newChild)

  override def prettyName: String = "flac_meta"
}

object FlacMetaExpr {
  val schema: StructType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("total_samples", LongType),
    StructField("duration_ms", LongType),
    StructField("n_blocks", IntegerType),
    StructField("has_tags", BooleanType)))

  private val Bad: InternalRow = new GenericInternalRow(
    Array[Any](false, null, null, null, null, null, null, null))

  def meta(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4 + 4 + 34) return Bad
    if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return Bad
    var off = 4
    var nBlocks = 0
    var hasTags = false
    var sr = -1; var ch = -1; var bps = -1; var total = -1L
    var last = false
    while (!last) {
      if (off + 4 > b.length) return Bad // truncated block header
      val hdr = b(off) & 0xff
      last = (hdr & 0x80) != 0
      val tpe = hdr & 0x7f
      if (tpe == 127) return Bad // forbidden by spec
      val len = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) |
        (b(off + 3) & 0xff)
      if (off + 4 + len > b.length) return Bad // lying length
      if (nBlocks == 0) {
        if (tpe != 0 || len != 34) return Bad // STREAMINFO must lead
        val p = off + 4 + 10 // skip blocksize/framesize bounds
        // packed: 20-bit rate | 3-bit ch-1 | 5-bit bps-1 | 36-bit total
        sr = ((b(p) & 0xff) << 12) | ((b(p + 1) & 0xff) << 4) |
          ((b(p + 2) & 0xff) >> 4)
        ch = ((b(p + 2) >> 1) & 0x7) + 1
        bps = (((b(p + 2) & 0x1) << 4) | ((b(p + 3) & 0xff) >> 4)) + 1
        total = ((b(p + 3) & 0xfL) << 32) | ((b(p + 4) & 0xffL) << 24) |
          ((b(p + 5) & 0xffL) << 16) | ((b(p + 6) & 0xffL) << 8) |
          (b(p + 7) & 0xffL)
        if (sr == 0) return Bad // "invalid for audio" per spec
      } else if (tpe == 0) return Bad // duplicate STREAMINFO
      if (tpe == 4) hasTags = true
      nBlocks += 1
      off += 4 + len
    }
    new GenericInternalRow(Array[Any](
      true, sr, ch, bps, total, total * 1000L / sr, nBlocks, hasTags))
  }
}
