package graft.parse

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.multimodal.Ogg

/** Ogg container metadata probe — `ogg_meta(binary)` returns
  * struct(ok, codec, channels, sample_rate, n_pages, duration_ms)
  * from a full CRC-VERIFIED page walk plus the first page's codec
  * identification header; no audio decode (Vorbis/Opus bitstreams are
  * codec-library territory — the established stub boundary; the
  * container layer is public-spec layout, the q144/q153/q161/q167
  * advisory posture). Speech/podcast corpora ship .ogg/.opus, and
  * routing needs exactly these fields: codec gates, channel/rate
  * buckets, duration binning.
  *
  * Strict walk (every page, wall to wall):
  *  - "OggS" capture + version 0 on every page; the stored CRC must
  *    match the recomputed Ogg CRC-32 (forward 0x04C11DB7, init 0 —
  *    [[Ogg.crc32]]) over the page with its CRC field zeroed;
  *  - one logical stream: every page the same serial, page sequence
  *    numbers exactly 0,1,2,…;
  *  - the first page must carry BOS, the last EOS, no interior page
  *    either flag (a second BOS would be a multiplexed stream — not
  *    probed, fail loudly rather than misattribute);
  *  - lacing table and body must fit the payload exactly — a torn
  *    final page is an error, not a clean end (the Gzip/Tar
  *    trailing-bytes discipline).
  *
  * Codec identification (first page payload): Vorbis type-1 ident
  * (30 bytes: 0x01"vorbis", version le32 = 0, channels u8, rate le32,
  * bitrates, blocksizes, framing bit set) or OpusHead (19+ bytes:
  * version 1, channels u8, pre-skip le16, input rate le32). A
  * well-formed PAGE stream under an unrecognized codec yields
  * ok=true, codec='unknown' with null audio fields (route-and-count
  * still works; misparse does not). duration_ms is all-integer from
  * the EOS granule position: Vorbis granules are PCM samples at the
  * ident rate (g·1000/rate); Opus granules are ALWAYS 48 kHz samples
  * less the pre-skip (max(0, g−preskip)·1000/48000), regardless of
  * the input rate field. */
case class OggMetaExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ogg_meta requires binary, got ${t.catalogString}")
  }

  override def dataType: DataType = OggMetaExpr.schema

  override protected def nullSafeEval(input: Any): Any =
    OggMetaExpr.meta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.parse.OggMetaExpr.meta($c)")

  override protected def withNewChildInternal(newChild: Expression): OggMetaExpr =
    copy(child = newChild)

  override def prettyName: String = "ogg_meta"
}

object OggMetaExpr {
  val schema: StructType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("codec", StringType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_pages", IntegerType),
    StructField("duration_ms", LongType)))

  private val Bad: InternalRow = new GenericInternalRow(
    Array[Any](false, null, null, null, null, null))

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def le64(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xffL); i -= 1 }
    v
  }

  def meta(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 28) return Bad
    var off = 0
    var nPages = 0
    var serial = 0L
    var lastGranule = 0L
    var sawEos = false
    var firstPayload: Array[Byte] = null
    while (off < b.length) {
      if (sawEos) return Bad // pages after EOS: trailing garbage
      if (off + 27 > b.length) return Bad
      if (b(off) != 'O' || b(off + 1) != 'g' || b(off + 2) != 'g' ||
          b(off + 3) != 'S') return Bad
      if (b(off + 4) != 0) return Bad // stream structure version
      val htype = b(off + 5) & 0xff
      val granule = le64(b, off + 6)
      val ser = le32(b, off + 14)
      val seq = le32(b, off + 18)
      val nsegs = b(off + 26) & 0xff
      if (off + 27 + nsegs > b.length) return Bad
      var body = 0
      var i = 0
      while (i < nsegs) { body += b(off + 27 + i) & 0xff; i += 1 }
      val pageLen = 27 + nsegs + body
      if (off + pageLen > b.length) return Bad // torn final page
      // CRC over the page with its CRC field zeroed (bounded copy:
      // pageLen <= 27 + 255 + 255*255 ~ 65 KB by the lacing format)
      val storedCrc = le32(b, off + 22)
      val scratch = java.util.Arrays.copyOfRange(b, off, off + pageLen)
      scratch(22) = 0; scratch(23) = 0; scratch(24) = 0; scratch(25) = 0
      val crc = Ogg.crc32(scratch, 0, pageLen)
      if ((crc & 0xffffffffL) != storedCrc) return Bad
      if (nPages == 0) {
        if ((htype & 0x02) == 0) return Bad // first page must be BOS
        serial = ser
        firstPayload = java.util.Arrays.copyOfRange(
          b, off + 27 + nsegs, off + pageLen)
      } else {
        if ((htype & 0x02) != 0) return Bad // second BOS: multiplexed
        if (ser != serial) return Bad
      }
      if (seq != nPages.toLong) return Bad // sequence must be 0,1,2,…
      if ((htype & 0x04) != 0) { sawEos = true; lastGranule = granule }
      nPages += 1
      off += pageLen
    }
    if (!sawEos || firstPayload == null) return Bad
    val p = firstPayload
    if (p.length >= 30 && p(0) == 1 && p(1) == 'v' && p(2) == 'o' &&
        p(3) == 'r' && p(4) == 'b' && p(5) == 'i' && p(6) == 's') {
      if (le32(p, 7) != 0L) return Bad // ident version must be 0
      val ch = p(11) & 0xff
      val rate = le32(p, 12)
      if (ch == 0 || rate <= 0 || rate > Int.MaxValue) return Bad
      if ((p(29) & 0x01) != 1) return Bad // framing bit
      val dur = if (lastGranule < 0) 0L else lastGranule * 1000L / rate
      row("vorbis", ch, rate.toInt, nPages, dur)
    } else if (p.length >= 19 && p(0) == 'O' && p(1) == 'p' &&
        p(2) == 'u' && p(3) == 's' && p(4) == 'H' && p(5) == 'e' &&
        p(6) == 'a' && p(7) == 'd') {
      if ((p(8) & 0xff) != 1) return Bad // OpusHead version
      val ch = p(9) & 0xff
      if (ch == 0) return Bad
      val preSkip = le16(p, 10)
      val inRate = le32(p, 12)
      if (inRate <= 0 || inRate > Int.MaxValue) return Bad
      val samples = math.max(0L, lastGranule - preSkip)
      row("opus", ch, inRate.toInt, nPages, samples * 1000L / 48000L)
    } else {
      // well-formed pages, unrecognized codec: count, don't misparse
      new GenericInternalRow(Array[Any](
        true, UTF8String.fromString("unknown"), null, null, nPages, null))
    }
  }

  private def row(codec: String, ch: Int, rate: Int, nPages: Int,
                  durMs: Long): InternalRow =
    new GenericInternalRow(Array[Any](
      true, UTF8String.fromString(codec), ch, rate, nPages, durMs))
}
