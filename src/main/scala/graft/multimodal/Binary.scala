package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract runs
  * per-partition so heavyweight codec state is initialized once per
  * partition, not once per row.
  *
  * SCOPE — what is real vs stubbed (do not over-claim this module):
  *  - REAL and oracle/spec-checked: byte metadata ([[withMetadata]]),
  *    magic-byte container sniffing ([[sniffModality]]), PNG/WAV HEADER
  *    parsing ([[mediaMeta]] — width/height/channels/sample_rate read
  *    from the container header layout, q58's oracle recomputes the
  *    expected dims arithmetically), and PNG PIXEL decode
  *    ([[decodeImage]] via [[Png.decode]] — zlib inflate + full scanline
  *    unfiltering, q70's oracle recomputes per-image pixel stats
  *    arithmetically from the synthesis parameters), and WAV PCM SAMPLE
  *    decode ([[decodeAudio]] via [[Wav.decode]] — chunk walk +
  *    little-endian 16-bit PCM, q72's oracle recomputes per-clip sample
  *    stats the same way).
  *  - REAL, added after the PNG/WAV codecs: VIDEO frame decode for
  *    uncompressed-DIB AVI ([[videoFrames]] via [[Avi.decode]] — RIFF
  *    chunk walk + bottom-up BGR raster normalization, q94's oracle
  *    recomputes per-frame luma stats from the synthesis formula) and
  *    COMPRESSED audio for G.711 mu-law (format 7) and IMA ADPCM
  *    (format 17) WAV payloads ([[decodeAudio]] — [[Wav.decode]] expands
  *    them to PCM; q95/q96 oracles replay the companding / adaptive
  *    quantization arithmetic).
  *  - REAL, the web-crawl staple: baseline JPEG PIXEL decode
  *    ([[Jpeg.decode]] — Huffman entropy decode, dequant, integer IDCT,
  *    chroma upsampling, YCbCr→RGB; q108's oracle replays the DC-only
  *    closed form). Every image operator routes through the
  *    container-dispatching [[decodeRaster]], so PNG and JPEG payloads
  *    mix freely in one column — joined by GIF ([[Gif.decode]]) and
  *    baseline TIFF ([[Tiff.decode]] — both byte orders, strips,
  *    bilevel/gray/RGB, none/PackBits; q143's oracle replays the
  *    closed-form pixels). MJPEG AVI video rides the same decoder
  *    ([[Avi.decode]] with `biCompression='MJPG'` — intra-only, one
  *    baseline JPEG per frame; q109's oracle replays per-frame stats).
  *  - REAL, the crawl-ingest spine: gzip decompression ([[gunzipText]]
  *    via [[Gzip.decode]] — JDK zlib, multi-member shards, zip-bomb cap;
  *    q119's oracle checks the round-tripped text's digest against the
  *    source column) and the WARC container walk ([[warcRecords]] via
  *    [[Warc.parse]] — Content-Length-driven record framing over
  *    member-per-record `.warc.gz`; q120's oracle restates each record's
  *    headers and payload digest closed-form).
  *  - STUBBED: inter-frame compressed video (H.264/VP9) and
  *    perceptual-codec audio (MP3/AAC/Opus). Those genuinely need codec
  *    libraries this container lacks, so [[decodeStub]] and
  *    [[frameSampleStub]] produce deterministic fakes behind the
  *    production execution shape (mapPartitions with a per-partition
  *    init site, typed schemas, explode-before-shuffle). "Multimodal
  *    decode" must not be claimed beyond images (PNG + baseline JPEG) +
  *    PCM/mu-law/ADPCM audio + DIB/MJPEG video + headers; swap the stub
  *    bodies for JNI/codec calls on a real cluster.
  */
object Binary {

  /** Typed media row: id + payload + declared modality/codec. */
  case class MediaRow(media_id: Long, payload: Array[Byte],
                      modality: String, codec: String)

  /** Decoded features: fixed-width embedding + basic dims. */
  case class MediaFeatures(media_id: Long, n_bytes: Long,
                           width: Int, height: Int, feature: Array[Float])

  /** Decompressed text payload (null text when ok=false). */
  case class TextPayload(media_id: Long, ok: Boolean, text: String)

  /** One parsed WARC record's metadata: the payload itself never leaves
    * the task — only its length and digest ride the shuffle. */
  case class WarcRow(media_id: Long, ok: Boolean, warc_type: String,
                     record_id: String, target_uri: String, date: String,
                     content_type: String, n_payload: Long, digest: String)

  /** Container-dispatching raster decode — the single entry every image
    * operator ([[decodeImage]], [[imageDhash]], [[imageResize]]) routes
    * through, so each operator is container-agnostic: PNG signature ->
    * [[Png.decode]], JPEG SOI -> [[Jpeg.decode]], GIF -> [[Gif.decode]],
    * TIFF byte-order mark -> [[Tiff.decode]] (all REAL pixel decoders),
    * anything else throws into the caller's poison contract. */
  private[multimodal] def decodeRaster(payload: Array[Byte]): Png.Image = {
    require(payload != null && payload.length >= 4, "empty image payload")
    if ((payload(0) & 0xff) == 0x89 && payload(1) == 'P') Png.decode(payload)
    else if ((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8)
      Jpeg.decode(payload)
    else if (payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F')
      Gif.decode(payload)
    else if (Tiff.isTiff(payload)) Tiff.decode(payload)
    else if (Bmp.isBmp(payload)) Bmp.decode(payload)
    else throw new IllegalArgumentException(
      "unrecognized image container (PNG, baseline JPEG, GIF, TIFF, BMP supported)")
  }

  /** Cheap columnar metadata — no decode needed, stays in codegen:
    * byte length, content digest, magic-byte sniff. */
  def withMetadata(df: DataFrame, payload: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(payload)).cast("long"))
      .withColumn("digest", md5(col(payload)))
      .withColumn("magic", hex(substring(col(payload), 1, 4)))

  /** Modality detection from magic bytes (container sniffing — the part of
    * media handling that needs no codec): PNG/JPEG/GIF/RIFF-WAV/MP4/PDF,
    * else `unknown`. Works on the hex of the leading bytes so it composes
    * with [[withMetadata]]'s `magic` column. */
  def sniffModality(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = hex(substring(payload, 1, 12))
    when(h.startsWith("89504E47"), "image/png")
      .when(h.startsWith("FFD8FF"), "image/jpeg")
      .when(h.startsWith("47494638"), "image/gif")
      .when(h.startsWith("49492A00") || h.startsWith("4D4D002A"), "image/tiff")
      .when(h.startsWith("424D"), "image/bmp")
      .when(h.startsWith("494433"), "audio/mpeg")
      .when(h.startsWith("664C6143"), "audio/flac")
      .when(h.startsWith("52494646") && substring(h, 17, 8) === "57415645", "audio/wav")
      .when(substring(h, 9, 8) === "66747970", "video/mp4")
      .when(h.startsWith("25504446"), "application/pdf")
      .when(h.startsWith("1F8B"), "application/gzip")
      .otherwise("unknown")
  }

  /** REAL WARC shard walk ([[Warc.parse]] over [[Gzip.decode]] when
    * `gzipped` — the `.warc.gz` member-per-record convention inflates in
    * one multi-member pass): each input payload is one crawl shard, each
    * output row one record's metadata + payload digest/length. Payload
    * bytes are reduced IN-PARTITION (MessageDigest allocated once per
    * partition at the init site) — at 100 TB the record bodies never
    * ride a shuffle, only fixed-width metadata rows do. A malformed
    * shard yields a single `ok=false` row. */
  def warcRecords(media: Dataset[MediaRow],
                  gzipped: Boolean = true): Dataset[WarcRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        try {
          val raw = if (gzipped) Gzip.decode(r.payload) else r.payload
          Warc.parse(raw).map { rec =>
            md.reset()
            val hex = md.digest(rec.payload).map(b => f"$b%02x").mkString
            WarcRow(r.media_id, ok = true, rec.warcType, rec.recordId,
              rec.targetUri, rec.date, rec.contentType,
              rec.payload.length.toLong, hex)
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            Seq(WarcRow(r.media_id, ok = false, null, null, null, null,
              null, -1L, null))
        }
      }
    }
  }

  case class ZipRow(media_id: Long, ok: Boolean, name: String,
                    method: Int, n_bytes: Long, digest: String)

  /** REAL ZIP archive walk ([[Zip.decode]]: central-directory parse +
    * raw-deflate inflate, CRC32/size verified per member) — each input
    * payload is one .zip bundle, each output row one member's metadata
    * + payload digest/length. Member bytes are reduced IN-PARTITION
    * (the [[warcRecords]] discipline) so archive contents never ride a
    * shuffle, only fixed-width rows do. A malformed archive — bad
    * directory, CRC mismatch, truncation, bomb — yields a single
    * `ok=false` row. */
  def zipEntries(media: Dataset[MediaRow]): Dataset[ZipRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        try {
          Zip.decode(r.payload).map { e =>
            md.reset()
            val hex = md.digest(e.data).map(b => f"$b%02x").mkString
            ZipRow(r.media_id, ok = true, e.name, e.method,
              e.data.length.toLong, hex)
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            Seq(ZipRow(r.media_id, ok = false, null, -1, -1L, null))
        }
      }
    }
  }

  /** Transparent ingest decompression: payloads with the gzip magic are
    * gunzipped ([[Gzip.decode]] — CRC-verified, multi-member, bomb
    * cap), everything else passes through untouched. This is the stage
    * that turns `.tar.gz` into the plain tar [[tarEntries]] walks — a
    * pure projection, zero shuffles. A payload that CLAIMS gzip but
    * fails to decode maps to a null payload (the downstream walker's
    * loud ok=false, never silent partial output). */
  def gunzipBinary(media: Dataset[MediaRow],
                   maxOut: Int = 1 << 26): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val p = r.payload
      if (p != null && p.length >= 2 &&
          (p(0) & 0xff) == 0x1f && (p(1) & 0xff) == 0x8b)
        try r.copy(payload = Gzip.decode(p, maxOut))
        catch { case scala.util.control.NonFatal(_) =>
          r.copy(payload = null) }
      else r
    }
  }

  case class TarRow(media_id: Long, ok: Boolean, name: String,
                    typeflag: String, n_bytes: Long, digest: String)

  /** REAL tar archive walk ([[Tar.decode]]: ustar header chain with
    * checksum verification, strict two-zero-block terminator, bomb
    * cap) — each payload one .tar (or, upstream of this, a gunzipped
    * .tar.gz), each output row one member. Same in-partition reduction
    * discipline as [[zipEntries]]: member bytes never ride a shuffle.
    * A malformed archive — bad magic/checksum/octal, size past end,
    * truncated terminator, unsupported typeflag — yields one
    * `ok=false` row. */
  def tarEntries(media: Dataset[MediaRow]): Dataset[TarRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        try {
          Tar.decode(r.payload).map { e =>
            md.reset()
            val hex = md.digest(e.data).map(b => f"$b%02x").mkString
            TarRow(r.media_id, ok = true, e.name, e.typeflag.toString,
              e.data.length.toLong, hex)
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            Seq(TarRow(r.media_id, ok = false, null, null, -1L, null))
        }
      }
    }
  }

  /** REAL gunzip of compressed-text payloads ([[Gzip.decode]]: JDK zlib,
    * multi-member streams, zip-bomb size cap) into a UTF-8 text column —
    * the first stage of any crawl ingest (WET/WARC/.jsonl.gz shards
    * arrive gzipped). Poison payloads (bad magic, truncation, bombs)
    * yield `ok=false` rows with null text, never task failures. The
    * decompressed text stays in the row for downstream text operators —
    * this is a projection, zero shuffles at any scale. */
  def gunzipText(media: Dataset[MediaRow]): Dataset[TextPayload] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        try {
          val raw = Gzip.decode(r.payload)
          TextPayload(r.media_id, ok = true,
            new String(raw, java.nio.charset.StandardCharsets.UTF_8))
        } catch {
          case scala.util.control.NonFatal(_) =>
            TextPayload(r.media_id, ok = false, null)
        }
      }
    }
  }

  /** REAL header decode for PNG and WAV containers (no codec needed — only
    * the header layout is read): struct(kind, width, height, channels,
    * sample_rate), kind='unknown' with null fields for anything else.
    * Native codegen'd kernel (graft.parse.MediaMetaExpr). */
  def mediaMeta(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    call_function("media_meta", payload)

  /** REAL image decode + per-image pixel stats: PNG and baseline-JPEG
    * payloads through [[decodeRaster]] (actual pixel decoders — see
    * Png/Jpeg Scaladoc for scope), reduced per-partition to fixed-width stats so
    * raster buffers never ride a shuffle. Undecodable payloads (wrong
    * magic, truncated, unsupported color mode) yield `ok=false` rows with
    * null stats — a poison image must never fail the task. mapPartitions
    * keeps the per-partition init contract (a JNI codec would allocate
    * here; the pure-JVM path allocates nothing heavier than its buffers).
    * mean_px uses floor(x*1e6+0.5)/1e6 so an external oracle reproduces it
    * bit-for-bit (see SparkEntry rounding convention). */
  def decodeImage(media: Dataset[MediaRow]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init site (a real JNI codec context would live here)
      rows.map { r =>
        try {
          val img = decodeRaster(r.payload)
          val px = img.pixels
          var i = 0; var sum = 0L; var mn = 255; var mx = 0
          while (i < px.length) {
            val v = px(i) & 0xff
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
          val n = px.length.toLong
          val mean =
            if (n == 0) 0.0
            else math.floor(sum.toDouble / n * 1e6 + 0.5) / 1e6
          ImageStats(r.media_id, ok = true, img.width, img.height,
            img.channels, n, mean, mn.toLong, mx.toLong)
        } catch {
          // NonFatal, not just IllegalArgumentException: a crafted header
          // can steer the codec into arithmetic/bounds exceptions the
          // explicit requires don't anticipate, and the poison contract is
          // "bad payload -> ok=false row", never a task failure. Fatal
          // errors (OOM, etc.) still propagate.
          case scala.util.control.NonFatal(_) =>
            ImageStats(r.media_id, ok = false, -1, -1, -1, -1L, 0.0, -1L, -1L)
        }
      }
    }
  }

  /** Per-image decoded-pixel stats — the fixed-width shuffle-safe shape
    * [[decodeImage]] reduces rasters to. */
  case class ImageStats(media_id: Long, ok: Boolean, width: Int, height: Int,
                        channels: Int, n_px: Long, mean_px: Double,
                        min_px: Long, max_px: Long)

  /** Perceptual fingerprint row for [[imageDhash]]. */
  case class ImageDhash(media_id: Long, ok: Boolean, width: Int,
                        height: Int, dhash: Long)

  /** REAL-decode perceptual difference-hash (dHash) — the image near-dup
    * fingerprint: the sign of the horizontal luma gradient at each
    * adjacent-pixel pair, packed LSB-first in raster order (capped at 64
    * bits; production dHash resizes to 9×8 grayscale first, which these
    * fixture-scale rasters already fit). Luma is integer
    * (299·r + 587·g + 114·b)/1000 for ≥3 channels, channel 0 otherwise —
    * every step integer-exact, so an external oracle recomputes the hash
    * bit-for-bit from known pixels. Near-dup images (brightness shifts,
    * small edits) land within a small Hamming radius: band the 64-bit
    * hash exactly like [[graft.llm.Dedup.simhashBandedPairs]] bands its
    * fingerprint for corpus-wide pairing. Same poison contract as
    * [[decodeImage]]: undecodable payloads yield ok=false rows, never a
    * task failure. */
  def imageDhash(media: Dataset[MediaRow]): Dataset[ImageDhash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        try {
          val img = decodeRaster(r.payload)
          val w = img.width; val h = img.height; val c = img.channels
          def gray(j: Int): Int =
            if (c >= 3) {
              val b = j * c
              ((img.pixels(b) & 0xff) * 299 +
                (img.pixels(b + 1) & 0xff) * 587 +
                (img.pixels(b + 2) & 0xff) * 114) / 1000
            } else img.pixels(j * c) & 0xff
          var hash = 0L; var k = 0; var y = 0
          while (y < h && k < 64) {
            var x = 0
            while (x < w - 1 && k < 64) {
              if (gray(y * w + x + 1) > gray(y * w + x)) hash |= 1L << k
              k += 1; x += 1
            }
            y += 1
          }
          ImageDhash(r.media_id, ok = true, w, h, hash)
        } catch {
          case scala.util.control.NonFatal(_) =>
            ImageDhash(r.media_id, ok = false, -1, -1, 0L)
        }
      }
    }
  }

  /** REAL audio decode + per-clip sample stats: RIFF/WAVE PCM payloads
    * through [[Wav.decode]] (chunk walk + little-endian 16-bit PCM — see
    * Wav Scaladoc for scope), reduced per-partition to fixed-width stats
    * so sample buffers never ride a shuffle. Same poison-row and
    * per-partition-init contract as [[decodeImage]]; mean/RMS use
    * floor(x*1e6+0.5)/1e6 for external-oracle bit parity (sample sums and
    * sums of squares are exact in Long, so the only float ops are one
    * divide, one sqrt, and the rounding — identical in any engine). */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init site (a real codec context would live here)
      rows.map { r =>
        try {
          val clip = Wav.decode(r.payload)
          val xs = clip.samples
          var i = 0; var sum = 0L; var sumSq = 0L; var peak = 0L
          while (i < xs.length) {
            val v = xs(i).toLong
            sum += v
            sumSq += v * v
            val a = math.abs(v)
            if (a > peak) peak = a
            i += 1
          }
          val n = xs.length.toLong
          def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
          AudioStats(r.media_id, ok = true, clip.sampleRate, clip.channels,
            n,
            if (n == 0) 0.0 else r6(sum.toDouble / n),
            if (n == 0) 0.0 else r6(math.sqrt(sumSq.toDouble / n)),
            peak)
        } catch {
          // same poison contract as decodeImage: any non-fatal decode
          // failure maps to an ok=false row, never a task failure
          case scala.util.control.NonFatal(_) =>
            AudioStats(r.media_id, ok = false, -1, -1, -1L, 0.0, 0.0, -1L)
        }
      }
    }
  }

  /** Per-clip decoded-sample stats — the fixed-width shuffle-safe shape
    * [[decodeAudio]] reduces PCM buffers to. */
  case class AudioStats(media_id: Long, ok: Boolean, sample_rate: Int,
                        channels: Int, n_samples: Long, mean_amp: Double,
                        rms: Double, peak: Long)

  /** One windowed-feature row of [[audioFrames]]. */
  case class AudioFrame(media_id: Long, ok: Boolean, frame: Int,
                        sum_abs: Long, zero_crossings: Int)

  /** REAL-decode windowed audio feature extraction — the audio analogue
    * of [[imageDhash]]: the PCM stream framed into fixed windows of
    * `frameSize` samples (full frames only; channel-agnostic over the
    * interleaved stream), each reduced to the two classic integer-exact
    * fingerprint features — total absolute amplitude (energy proxy) and
    * the zero-crossing count ((prev < 0) != (cur < 0), within-frame
    * only) — the front half of an acoustic-fingerprint pipeline, with
    * every step integer so an external oracle replays it exactly. One
    * row per (clip, frame): fixed-width, shuffle-safe, never a sample
    * buffer on the wire. Poison payloads yield a single ok=false row;
    * clips shorter than one frame yield nothing. */
  def audioFrames(media: Dataset[MediaRow],
                  frameSize: Int): Dataset[AudioFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      try {
        val s = Wav.decode(r.payload).samples
        (0 until s.length / frameSize).map { f =>
          val start = f * frameSize
          var sa = 0L; var zc = 0; var j = start
          val end = start + frameSize
          while (j < end) {
            sa += math.abs(s(j).toLong)
            if (j > start && ((s(j - 1) < 0) != (s(j) < 0))) zc += 1
            j += 1
          }
          AudioFrame(r.media_id, ok = true, f, sa, zc)
        }
      } catch {
        case scala.util.control.NonFatal(_) =>
          Seq(AudioFrame(r.media_id, ok = false, -1, 0L, 0))
      }
    }
  }

  /** One output cell of [[imageResize]]. */
  case class ImageCell(media_id: Long, ok: Boolean, oy: Int, ox: Int,
                       px_sum: Long, px_n: Long, px_avg: Long)

  /** REAL-decode box-filter downscale — the resize step of an image
    * preprocessing pipeline, over REAL decoded pixels: each payload is
    * decoded ([[decodeRaster]] — PNG or baseline JPEG), reduced to
    * integer luma (the [[imageDhash]] formula:
    * (299·r + 587·g + 114·b)/1000 for ≥3 channels, channel 0 otherwise),
    * and average-pooled onto an `outW`×`outH` grid. Box edges use the
    * standard integer mapping x0 = ox·w/outW, x1 = (ox+1)·w/outW (floor
    * division — uneven boxes absorb the remainder), so every source
    * pixel lands in exactly one box. Per cell the emitted features are
    * all integer-exact — the box luma sum, the box pixel count, and the
    * floor-average — so an external oracle replays the resize
    * bit-for-bit from known pixels. One fixed-width row per (image,
    * cell): rasters never ride a shuffle, which is the 100 TB posture
    * for any decode path. Upscale is out of scope (a box would be
    * empty): w < outW or h < outH is a decode failure under the same
    * poison contract as [[decodeImage]] — a single ok=false row, never
    * a task failure. */
  def imageResize(media: Dataset[MediaRow], outW: Int,
                  outH: Int): Dataset[ImageCell] = {
    import media.sparkSession.implicits._
    require(outW > 0 && outH > 0, s"output grid must be positive ($outW x $outH)")
    media.flatMap { r =>
      try {
        val img = decodeRaster(r.payload)
        val w = img.width; val h = img.height; val c = img.channels
        require(w >= outW && h >= outH,
          s"upscale unsupported (${w}x$h -> ${outW}x$outH)")
        def gray(j: Int): Int =
          if (c >= 3) {
            val b = j * c
            ((img.pixels(b) & 0xff) * 299 +
              (img.pixels(b + 1) & 0xff) * 587 +
              (img.pixels(b + 2) & 0xff) * 114) / 1000
          } else img.pixels(j * c) & 0xff
        for (oy <- 0 until outH; ox <- 0 until outW) yield {
          val y0 = oy * h / outH; val y1 = (oy + 1) * h / outH
          val x0 = ox * w / outW; val x1 = (ox + 1) * w / outW
          var s = 0L; var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { s += gray(y * w + x); x += 1 }
            y += 1
          }
          val n = (y1 - y0).toLong * (x1 - x0)
          ImageCell(r.media_id, ok = true, oy, ox, s, n, s / n)
        }
      } catch {
        case scala.util.control.NonFatal(_) =>
          Seq(ImageCell(r.media_id, ok = false, -1, -1, 0L, 0L, 0L))
      }
    }
  }

  /** One sampled decoded frame's stats — the fixed-width shuffle-safe
    * shape [[videoFrames]] reduces rasters to. */
  case class VideoFrameStats(media_id: Long, ok: Boolean, frame_idx: Int,
                             width: Int, height: Int, luma_sum: Long,
                             luma_min: Long, luma_max: Long)

  /** REAL video frame sampling + decode — the video analogue of
    * [[decodeImage]]: each AVI payload is demuxed through [[Avi.decode]]
    * (RIFF chunk walk, uncompressed-DIB frames, bottom-up BGR rows
    * normalized to top-down RGB — see Avi Scaladoc for scope), every
    * `stride`-th frame is kept (frame sampling — the standard first step
    * of video feature extraction, since adjacent frames are
    * near-duplicates), and each sampled frame reduces to integer luma
    * stats (the [[imageDhash]] formula: (299·r + 587·g + 114·b)/1000).
    * One fixed-width row per (video, sampled frame): rasters never ride
    * a shuffle. The explode shape runs BEFORE any shuffle, which is the
    * 100 TB posture when output rows >> input rows. Same poison contract
    * as [[decodeImage]]: undecodable payloads yield one ok=false row,
    * never a task failure. */
  def videoFrames(media: Dataset[MediaRow],
                  stride: Int): Dataset[VideoFrameStats] = {
    import media.sparkSession.implicits._
    require(stride > 0, s"stride must be positive ($stride)")
    media.flatMap { r =>
      try {
        val v = Avi.decode(r.payload)
        val w = v.width; val h = v.height
        (0 until v.frames.length by stride).map { fi =>
          val px = v.frames(fi)
          var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
          var j = 0
          while (j < w * h) {
            val b = j * 3
            val lum = ((px(b) & 0xff) * 299 + (px(b + 1) & 0xff) * 587 +
              (px(b + 2) & 0xff) * 114) / 1000
            sum += lum
            if (lum < mn) mn = lum
            if (lum > mx) mx = lum
            j += 1
          }
          VideoFrameStats(r.media_id, ok = true, fi, w, h, sum, mn, mx)
        }
      } catch {
        case scala.util.control.NonFatal(_) =>
          Seq(VideoFrameStats(r.media_id, ok = false, -1, -1, -1, 0L, 0L, 0L))
      }
    }
  }

  /** REAL animated-GIF frame sampling — [[videoFrames]]'s shape for the
    * other animation container a crawl actually serves: every
    * `stride`-th full-canvas frame through [[Gif.decodeFrames]] (LZW +
    * palette per frame), reduced to the same integer luma stats. One
    * fixed-width row per (gif, sampled frame); rasters never ride a
    * shuffle; poison payloads yield one ok=false row. */
  def gifFrames(media: Dataset[MediaRow],
                stride: Int): Dataset[VideoFrameStats] = {
    import media.sparkSession.implicits._
    require(stride > 0, s"stride must be positive ($stride)")
    media.flatMap { r =>
      try {
        val fs = Gif.decodeFrames(r.payload)
        val w = fs(0).width; val h = fs(0).height
        (0 until fs.length by stride).map { fi =>
          val px = fs(fi).pixels
          var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
          var j = 0
          while (j < w * h) {
            val b = j * 3
            val lum = ((px(b) & 0xff) * 299 + (px(b + 1) & 0xff) * 587 +
              (px(b + 2) & 0xff) * 114) / 1000
            sum += lum
            if (lum < mn) mn = lum
            if (lum > mx) mx = lum
            j += 1
          }
          VideoFrameStats(r.media_id, ok = true, fi, w, h, sum, mn, mx)
        }
      } catch {
        case scala.util.control.NonFatal(_) =>
          Seq(VideoFrameStats(r.media_id, ok = false, -1, -1, -1, 0L, 0L, 0L))
      }
    }
  }

  /** STUB decode — NOT a media decoder (images have the REAL
    * [[decodeImage]] path; this remains only as the execution-shape
    * placeholder for audio/video feature extraction). Deterministic fake:
    * "dimensions"
    * and a `dim`-float feature vector derived from byte content, so tests
    * are reproducible. Only the execution contract is real: one codec
    * init per partition (the reason this is mapPartitions, not a per-row
    * UDF), typed MediaFeatures schema, no payload ever rides a shuffle. */
  def decodeStub(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init site (real codecs allocate here)
      rows.map { r =>
        val n = r.payload.length
        val h = java.util.Arrays.hashCode(r.payload)
        val feature = Array.tabulate(dim) { i =>
          // spread bits deterministically; bounded [-1, 1)
          (((h * (i + 1)) >>> 8) % 1000) / 1000.0f * (if (((h >> i) & 1) == 0) 1 else -1)
        }
        MediaFeatures(r.media_id, n.toLong, width = (h & 0x3ff).abs,
          height = ((h >> 10) & 0x3ff).abs, feature = feature)
      }
    }
  }

  /** One sampled frame: parent id, frame index, frame payload. */
  case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB frame sampler for COMPRESSED video (uncompressed-DIB AVI has
    * the REAL [[videoFrames]] path) — every `stride`-th "frame" of a
    * payload, modeled as fixed-size byte windows (a real implementation
    * seeks container keyframes here; one demuxer init per partition). The
    * explode shape matters at scale: output rows >> input rows, so this
    * runs BEFORE any shuffle and the frame payloads never ride one. */
  def frameSampleStub(media: Dataset[MediaRow], frameBytes: Int = 16,
                      stride: Int = 4): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val nFrames = math.max(1, r.payload.length / frameBytes)
      (0 until nFrames by stride).map { i =>
        val from = i * frameBytes
        val until = math.min(from + frameBytes, r.payload.length)
        MediaFrame(r.media_id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }

  /** Fixture: wrap the documents table's text as fake binary payloads so
    * the plumbing is exercised without real media files. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      to_binary(col("text"), lit("utf-8")).as("payload"),
      lit("text").as("modality"), lit("utf-8").as("codec"))
      .as[MediaRow]
  }
}
