package graft.multimodal

/** WebP container ENCODERS for fixtures — the byte-level counterpart of
  * the `webp_meta` probe (graft.parse.WebpMetaExpr). Only the container
  * and the VP8/VP8L/VP8X header fields are real; the "compressed"
  * payload tails are zero filler, which is exactly the honest scope: the
  * probe under test never reads past the public-spec headers, and full
  * VP8 bitstream decode is codec-library territory (the engine's
  * established stub boundary, see Binary's SCOPE note). */
object Webp {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le24(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** fourcc + le32 size + payload (+ pad byte when the size is odd). */
  def chunk(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    require(fourcc.length == 4)
    val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    fourcc.getBytes("US-ASCII") ++ le32(payload.length.toLong) ++ payload ++ pad
  }

  /** "RIFF" + le32 payload size + "WEBP" + chunks. */
  def container(chunks: Array[Byte]*): Array[Byte] = {
    val body = "WEBP".getBytes("US-ASCII") ++ chunks.flatten
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  /** Simple lossy file: VP8 keyframe header (tag, 9D 01 2A start code,
    * le14 dims) over `filler` zero bytes of fake coefficient data. */
  def encodeLossy(w: Int, h: Int, filler: Int = 16): Array[Byte] = {
    require(w >= 1 && w < 16384 && h >= 1 && h < 16384)
    val hdr = Array(0x30.toByte, 0x00.toByte, 0x00.toByte, // keyframe tag
      0x9d.toByte, 0x01.toByte, 0x2a.toByte) ++
      le16(w) ++ le16(h) ++ Array.fill(filler)(0.toByte)
    container(chunk("VP8 ", hdr))
  }

  /** Simple lossless file: 2F signature + the packed le32
    * (width-1, height-1, alpha, version=0) word. */
  def encodeLossless(w: Int, h: Int, alpha: Boolean,
                     filler: Int = 9): Array[Byte] = {
    require(w >= 1 && w <= 16384 && h >= 1 && h <= 16384)
    val word = (w - 1).toLong | ((h - 1).toLong << 14) |
      (if (alpha) 1L << 28 else 0L)
    container(chunk("VP8L",
      Array(0x2f.toByte) ++ le32(word) ++ Array.fill(filler)(0.toByte)))
  }

  /** Extended file: VP8X (flags + le24 canvas dims) followed by either
    * the animation chunks (ANIM parameters + one ANMF per frame
    * duration in `frames`, ms) or an inner VP8 frame chunk. */
  def encodeExtended(w: Int, h: Int, alpha: Boolean, anim: Boolean,
                     frames: Seq[Int] = Nil): Array[Byte] = {
    require(w >= 1 && w <= (1 << 24) && h >= 1 && h <= (1 << 24))
    require(frames.isEmpty || anim, "frame durations need anim=true")
    val flags = (if (alpha) 0x10 else 0) | (if (anim) 0x02 else 0)
    val vp8x = chunk("VP8X", Array[Byte](flags.toByte, 0, 0, 0) ++
      le24(w - 1) ++ le24(h - 1))
    val inner: Seq[Array[Byte]] =
      if (anim)
        chunk("ANIM", le32(0xffffffffL) ++ le16(0)) +: // bg + loop count
          frames.map { d =>
            // 16-byte ANMF header (x, y, w-1, h-1, duration, flags) +
            // filler standing in for the nested frame bitstream
            chunk("ANMF", le24(0) ++ le24(0) ++ le24(w - 1) ++ le24(h - 1) ++
              le24(d) ++ Array[Byte](0) ++ Array.fill(8)(0.toByte))
          }
      else Seq(chunk("VP8 ", Array[Byte](0x30.toByte, 0, 0, 0x9d.toByte,
        0x01.toByte, 0x2a.toByte) ++ le16(w min 16383) ++ le16(h min 16383) ++
        Array.fill(14)(0.toByte)))
    container(vp8x +: inner: _*)
  }
}
