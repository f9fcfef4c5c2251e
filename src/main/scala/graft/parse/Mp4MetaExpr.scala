package graft.parse

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MP4/QuickTime container metadata probe — `mp4_meta(binary)` returns
  * struct(ok, brand, duration_ms, n_tracks, has_video, has_audio,
  * width, height) from the ISO BMFF box walk; no sample decode (H.264/
  * HEVC/AAC payloads are codec territory — the established stub
  * boundary; the BOX STRUCTURE is public ISO 14496-12 layout, the
  * q144/q153/q161 advisory posture). Video-corpus routing needs
  * exactly these fields: duration bucketing, track-type filters,
  * resolution gates.
  *
  * Box layout: [u32 size][4cc type][payload], size includes the 8-byte
  * header; size 1 = 64-bit largesize follows; size 0 = to end-of-file
  * (legal only at top level, last box). The walk requires `ftyp`
  * first (its major brand is reported), then wall-to-wall top-level
  * boxes; inside `moov` it reads `mvhd` (version 0 or 1 — timescale +
  * duration, duration_ms = duration·1000/timescale all-integer) and
  * each `trak`'s `tkhd` (16.16 fixed-point width/height; the first
  * VIDEO track's dims are reported) and `mdia`→`hdlr` handler type
  * ('vide'/'soun').
  *
  * Strict walk (the q144 garbage-bytes contract): bad magic, a lying
  * box size, a truncated header, boxes that do not tile their parent
  * exactly, missing moov/mvhd, or a zero timescale yield ok=false
  * with null fields — never an exception. */
case class Mp4MetaExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mp4_meta requires binary, got ${t.catalogString}")
  }

  override def dataType: DataType = Mp4MetaExpr.schema

  override protected def nullSafeEval(input: Any): Any =
    Mp4MetaExpr.meta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.parse.Mp4MetaExpr.meta($c)")

  override protected def withNewChildInternal(newChild: Expression): Mp4MetaExpr =
    copy(child = newChild)

  override def prettyName: String = "mp4_meta"
}

object Mp4MetaExpr {
  val schema: StructType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("brand", StringType),
    StructField("duration_ms", LongType),
    StructField("n_tracks", IntegerType),
    StructField("has_video", BooleanType),
    StructField("has_audio", BooleanType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  private val Bad: InternalRow = new GenericInternalRow(
    Array[Any](false, null, null, null, null, null, null, null))

  private def u32(b: Array[Byte], o: Long): Long =
    ((b(o.toInt) & 0xffL) << 24) | ((b(o.toInt + 1) & 0xffL) << 16) |
      ((b(o.toInt + 2) & 0xffL) << 8) | (b(o.toInt + 3) & 0xffL)

  private def u64(b: Array[Byte], o: Long): Long =
    (u32(b, o) << 32) | u32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Long): String =
    new String(b, o.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the boxes tiling [start, end); `f(type, payloadStart,
    * payloadEnd)`; returns false on any framing violation. */
  private def walk(b: Array[Byte], start: Long, end: Long,
                   topLevel: Boolean)(f: (String, Long, Long) => Boolean): Boolean = {
    var off = start
    while (off < end) {
      if (off + 8 > end) return false
      var size = u32(b, off)
      var hdr = 8L
      if (size == 1) {
        if (off + 16 > end) return false
        size = u64(b, off + 8); hdr = 16L
      } else if (size == 0) {
        if (!topLevel) return false // to-EOF only legal at top level
        size = end - off
      }
      if (size < hdr || off + size > end) return false // lying size
      if (!f(fourcc(b, off + 4), off + hdr, off + size)) return false
      off += size
    }
    off == end
  }

  def meta(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16) return Bad
    if (u32(b, 0) < 16 || fourcc(b, 4) != "ftyp") return Bad
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var nTracks = 0
    var hasVideo = false
    var hasAudio = false
    var vw = -1; var vh = -1
    var sawMoov = false

    val okWalk = walk(b, 0L, b.length.toLong, topLevel = true) {
      case ("ftyp", s, e) =>
        if (e - s < 8) false
        else { if (brand == null) brand = fourcc(b, s); true }
      case ("moov", ms, me) =>
        sawMoov = true
        walk(b, ms, me, topLevel = false) {
          case ("mvhd", s, e) =>
            val v = b(s.toInt) & 0xff
            if (v == 0 && e - s >= 24) {
              timescale = u32(b, s + 12); duration = u32(b, s + 16); true
            } else if (v == 1 && e - s >= 32) {
              timescale = u32(b, s + 20); duration = u64(b, s + 24); true
            } else false
          case ("trak", ts, te) =>
            nTracks += 1
            var isVideo = false
            var isAudio = false
            var tw = -1; var th = -1
            val ok = walk(b, ts, te, topLevel = false) {
              case ("tkhd", s, e) =>
                val v = b(s.toInt) & 0xff
                // width/height are the LAST 8 bytes (16.16 fixed)
                val need = if (v == 1) 92L else 80L
                if (e - s < need) false
                else {
                  tw = (u32(b, e - 8) >> 16).toInt
                  th = (u32(b, e - 4) >> 16).toInt
                  true
                }
              case ("mdia", s, e) =>
                walk(b, s, e, topLevel = false) {
                  case ("hdlr", hs, he) =>
                    if (he - hs < 12) false
                    else {
                      fourcc(b, hs + 8) match {
                        case "vide" => isVideo = true
                        case "soun" => isAudio = true
                        case _ => ()
                      }
                      true
                    }
                  case _ => true
                }
              case _ => true
            }
            if (ok) {
              if (isVideo) {
                hasVideo = true
                if (vw < 0) { vw = tw; vh = th }
              }
              if (isAudio) hasAudio = true
            }
            ok
          case _ => true
        }
      case _ => true // mdat/free/... skipped by size
    }
    if (!okWalk || !sawMoov || timescale <= 0 || duration < 0) return Bad
    new GenericInternalRow(Array[Any](
      true, UTF8String.fromString(brand),
      duration * 1000L / timescale, nTracks, hasVideo, hasAudio,
      if (vw >= 0) vw else null, if (vh >= 0) vh else null))
  }
}
