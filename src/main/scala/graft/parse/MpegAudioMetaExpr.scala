package graft.parse

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MPEG audio (MP3-family) metadata probe — `mpeg_audio_meta(binary)`
  * returns struct(ok, version, layer, sample_rate, channels, n_frames,
  * duration_ms, bitrate_kbps, vbr, has_id3v2, has_id3v1) from a full
  * frame-header walk; no audio decode (MDCT/huffman synthesis is
  * codec-library territory — the engine's established stub boundary;
  * the FRAME HEADERS are public ISO 11172-3 / 13818-3 layout, the same
  * advisory posture as [[WebpMetaExpr]]). Audio-corpus routing needs
  * exactly these fields: duration bucketing, bitrate/VBR filtering,
  * sample-rate gates — all from 4-byte headers, stride-walked by the
  * per-version bitrate/samplerate tables, inside WholeStageCodegen.
  *
  * Walk contract (strict — the q144 garbage-bytes posture):
  *  - optional leading ID3v2 tag ("ID3", version+flags, 4-byte
  *    syncsafe size, +10 footer when flag 0x10), skipped unparsed;
  *  - optional trailing 128-byte ID3v1 tag ("TAG"), excluded from the
  *    frame region;
  *  - everything between must be wall-to-wall MPEG frames: 11-bit
  *    sync, version (1 / 2 / 2.5 — reserved rejected), layer (I/II/III
  *    — reserved rejected), bitrate index 1–14 ("free" has no
  *    computable frame length and is rejected), samplerate index 0–2,
  *    padding bit; frame length from the public formulas
  *    (L1: (12·br/sr + pad)·4; L2 and MPEG-1 L3: 144·br/sr + pad;
  *    MPEG-2/2.5 L3: 72·br/sr + pad, all integer division).
  *  - version/layer/samplerate/channel-mode must be consistent across
  *    frames (true of real files); bitrate may vary (VBR — reported
  *    as vbr=true with NULL bitrate_kbps).
  *  - duration_ms = total_samples · 1000 / sample_rate, all-integer
  *    (samples/frame: L1 384, L2 1152, L3 1152 for MPEG-1 else 576).
  * Truncation, a sync miss mid-walk, trailing garbage, a lying ID3
  * size — anything that breaks the wall-to-wall walk — yields ok=false
  * with null fields, never an exception. */
case class MpegAudioMetaExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mpeg_audio_meta requires binary, got ${t.catalogString}")
  }

  override def dataType: DataType = MpegAudioMetaExpr.schema

  override protected def nullSafeEval(input: Any): Any =
    MpegAudioMetaExpr.meta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.parse.MpegAudioMetaExpr.meta($c)")

  override protected def withNewChildInternal(newChild: Expression): MpegAudioMetaExpr =
    copy(child = newChild)

  override def prettyName: String = "mpeg_audio_meta"
}

object MpegAudioMetaExpr {
  val schema: StructType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("version", StringType),
    StructField("layer", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_ms", LongType),
    StructField("bitrate_kbps", IntegerType),
    StructField("vbr", BooleanType),
    StructField("has_id3v2", BooleanType),
    StructField("has_id3v1", BooleanType)))

  /** kbps by [version-row][layer][bitrate index 1..14]; version-row 0 =
    * MPEG-1, row 1 = MPEG-2 and 2.5 (they share tables). Public ISO
    * 11172-3 table B.2 / 13818-3 values. Shared with the fixture
    * encoder (graft.multimodal.Mp3); the SPEC pins publicly-documented
    * frame-length/duration constants independently so a table typo
    * cannot hide behind the sharing. */
  private[graft] val Kbps: Array[Array[Array[Int]]] = Array(
    Array( // MPEG-1
      Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448), // L1
      Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),    // L2
      Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)),    // L3
    Array( // MPEG-2 / 2.5
      Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
      Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
      Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)))

  /** Hz by [version id 0=2.5, 2=2, 3=1][samplerate index 0..2]. */
  private[graft] val Hz: Array[Array[Int]] = Array(
    Array(11025, 12000, 8000), // 2.5
    null,                      // reserved
    Array(22050, 24000, 16000), // 2
    Array(44100, 48000, 32000)) // 1

  private val Bad: InternalRow = new GenericInternalRow(
    Array[Any](false, null, null, null, null, null, null, null, null,
      null, null))

  def meta(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return Bad
    var off = 0
    var hasId3v2 = false
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // syncsafe size: 4 bytes of 7 bits each; high bit set = malformed
      var sz = 0L
      var i = 6
      while (i < 10) {
        if ((b(i) & 0x80) != 0) return Bad
        sz = (sz << 7) | (b(i) & 0x7f)
        i += 1
      }
      off = 10 + sz.toInt + (if ((b(5) & 0x10) != 0) 10 else 0)
      if (off > b.length) return Bad // lying tag size
      hasId3v2 = true
    }
    var end = b.length
    var hasId3v1 = false
    if (end - off >= 128 && b(end - 128) == 'T' && b(end - 127) == 'A' &&
        b(end - 126) == 'G') {
      end -= 128
      hasId3v1 = true
    }
    // wall-to-wall frame walk
    var nFrames = 0
    var verId = -1 // 2-bit version field of frame 0
    var layer = -1 // 1/2/3
    var srIdx = -1
    var mono = false
    var firstBr = -1
    var vbr = false
    var totalSamples = 0L
    while (off < end) {
      if (off + 4 > end) return Bad // truncated header
      if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xe0) != 0xe0) return Bad
      val v = (b(off + 1) >> 3) & 0x3
      if (v == 1) return Bad // reserved version
      val lBits = (b(off + 1) >> 1) & 0x3
      if (lBits == 0) return Bad // reserved layer
      val l = 4 - lBits // 11->I(1), 10->II(2), 01->III(3)
      val brIdx = (b(off + 2) >> 4) & 0xf
      if (brIdx == 0 || brIdx == 15) return Bad // free / bad
      val sIdx = (b(off + 2) >> 2) & 0x3
      if (sIdx == 3) return Bad // reserved samplerate
      val pad = (b(off + 2) >> 1) & 0x1
      val chMode = (b(off + 3) >> 6) & 0x3
      if (nFrames == 0) {
        verId = v; layer = l; srIdx = sIdx; mono = chMode == 3
        firstBr = brIdx
      } else {
        if (v != verId || l != layer || sIdx != srIdx ||
          mono != (chMode == 3)) return Bad
        if (brIdx != firstBr) vbr = true
      }
      val vRow = if (v == 3) 0 else 1
      val br = Kbps(vRow)(l - 1)(brIdx - 1) * 1000
      val sr = Hz(v)(sIdx)
      val frameLen =
        if (l == 1) (12 * br / sr + pad) * 4
        else if (l == 2 || v == 3) 144 * br / sr + pad
        else 72 * br / sr + pad
      totalSamples +=
        (if (l == 1) 384 else if (l == 2) 1152
         else if (v == 3) 1152 else 576)
      nFrames += 1
      off += frameLen
      if (off > end) return Bad // truncated final frame
    }
    if (nFrames == 0) return Bad
    val sr = Hz(verId)(srIdx)
    val version = verId match {
      case 3 => "1"
      case 2 => "2"
      case _ => "2.5"
    }
    val vRow = if (verId == 3) 0 else 1
    new GenericInternalRow(Array[Any](
      true, UTF8String.fromString(version), layer, sr,
      if (mono) 1 else 2, nFrames, totalSamples * 1000L / sr,
      if (vbr) null else Kbps(vRow)(layer - 1)(firstBr - 1),
      vbr, hasId3v2, hasId3v1))
  }
}
