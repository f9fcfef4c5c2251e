package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** ZIP archive codec (PKWARE APPNOTE layout) — the multi-file sibling
  * of [[Gzip]]: crawl and data-drop corpora arrive as .zip bundles as
  * often as .gz streams, and the engine's ingest needs to explode them
  * into member rows without shelling out. Rides the JDK's built-in
  * zlib (raw `Inflater(true)` for method-8 members) exactly like
  * [[Png]]/[[Gzip]], so the decode is REAL; the container walk is this
  * module's own central-directory parser, not `ZipInputStream` — the
  * stream API trusts local headers and silently tolerates the
  * truncated/appended archives the central directory exists to detect.
  *
  * Walk contract (strict — the [[Gzip]] trailing-garbage discipline):
  * locate the end-of-central-directory record by back-scan (comment
  * tolerated up to its 16-bit length), require single-disk, walk
  * exactly `nEntries` central headers, and for each member require the
  * local-header signature, resolve the data span from the CENTRAL
  * sizes (local sizes may be zeroed under flag bit 3), inflate or copy,
  * and verify BOTH the CRC32 and the uncompressed size against the
  * central record. Per-member and total decompressed output are capped
  * (zip-bomb containment). Stored (0) and deflate (8) methods only —
  * everything else in the wild is marginal; unsupported methods throw
  * into the caller's ok=false contract. ZIP64 archives throw (the
  * 4 GiB+ single-payload case does not belong in a task row anyway —
  * shard upstream). */
object Zip {

  /** One decoded member. */
  final case class Entry(name: String, method: Int, data: Array[Byte])

  private def u16(b: Array[Byte], o: Int): Int = {
    require(o >= 0 && o + 2 <= b.length, s"zip: read past end at $o")
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  }
  private def u32(b: Array[Byte], o: Int): Long = {
    require(o >= 0 && o + 4 <= b.length, s"zip: read past end at $o")
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  }

  /** Decode all members. `maxOut` caps TOTAL decompressed bytes. */
  def decode(zip: Array[Byte], maxOut: Long = 1L << 26): Seq[Entry] = {
    require(zip != null && zip.length >= 22, "zip: too short for EOCD")
    // EOCD back-scan: signature PK\5\6 within the last 22+65535 bytes
    var eocd = -1
    var i = zip.length - 22
    val stop = math.max(0, zip.length - 22 - 65535)
    while (eocd < 0 && i >= stop) {
      if (zip(i) == 'P' && zip(i + 1) == 'K' && zip(i + 2) == 5 &&
        zip(i + 3) == 6 &&
        // the comment must run exactly to end-of-file
        i + 22 + u16(zip, i + 20) == zip.length) eocd = i
      i -= 1
    }
    require(eocd >= 0, "zip: no end-of-central-directory record")
    require(u16(zip, eocd + 4) == 0 && u16(zip, eocd + 6) == 0,
      "zip: multi-disk archives unsupported")
    val n = u16(zip, eocd + 10)
    require(u16(zip, eocd + 8) == n, "zip: disk/total entry counts differ")
    require(n != 0xffff, "zip: ZIP64 unsupported")
    val cdSize = u32(zip, eocd + 12)
    val cdOff = u32(zip, eocd + 16)
    require(cdOff + cdSize == eocd,
      "zip: central directory does not abut EOCD")

    val entries = Vector.newBuilder[Entry]
    var off = cdOff.toInt
    var total = 0L
    var k = 0
    while (k < n) {
      require(u32(zip, off) == 0x02014b50L, "zip: bad central header")
      val method = u16(zip, off + 10)
      val crc = u32(zip, off + 16)
      val csize = u32(zip, off + 20)
      val usize = u32(zip, off + 24)
      val nameLen = u16(zip, off + 28)
      val extraLen = u16(zip, off + 30)
      val commentLen = u16(zip, off + 32)
      val localOff = u32(zip, off + 42)
      require(csize != 0xffffffffL && usize != 0xffffffffL &&
        localOff != 0xffffffffL, "zip: ZIP64 unsupported")
      require(off + 46 + nameLen <= eocd, "zip: central name past directory")
      val name = new String(zip, off + 46, nameLen,
        java.nio.charset.StandardCharsets.UTF_8)
      require(method == 0 || method == 8,
        s"zip: compression method $method unsupported (stored/deflate)")
      total += usize
      require(usize <= maxOut && total <= maxOut,
        s"zip: decompressed size exceeds $maxOut-byte cap")

      // local header: trust only its signature and its OWN name/extra
      // lengths (they may differ from the central copy); sizes come
      // from the central record
      val lo = localOff.toInt
      require(u32(zip, lo) == 0x04034b50L, s"zip: bad local header for $name")
      val dataOff = lo + 30 + u16(zip, lo + 26) + u16(zip, lo + 28)
      require(dataOff + csize <= zip.length, s"zip: $name data truncated")

      val data =
        if (method == 0) {
          require(csize == usize, s"zip: stored sizes differ for $name")
          java.util.Arrays.copyOfRange(zip, dataOff, dataOff + csize.toInt)
        } else {
          val inf = new Inflater(true) // raw deflate, no zlib wrapper
          try {
            inf.setInput(zip, dataOff, csize.toInt)
            val out = new Array[Byte](usize.toInt)
            val scratch = new Array[Byte](1)
            var got = 0
            while (!inf.finished()) {
              val intoOut = got < out.length
              // once `out` is full, any FURTHER output means the stream
              // is longer than the central record claims; the scratch
              // probe also drains the final-block terminator of
              // zero-length members
              val m =
                if (intoOut) inf.inflate(out, got, out.length - got)
                else inf.inflate(scratch, 0, 1)
              if (intoOut) got += m
              else require(m == 0,
                s"zip: $name inflated size exceeds central record")
              // 0 with !finished means needsInput (truncated) or
              // needsDictionary (not legal in zip) — both malformed
              require(m > 0 || inf.finished(),
                s"zip: $name deflate stream truncated")
            }
            require(got == out.length,
              s"zip: $name inflated size differs from central record")
            require(inf.getBytesRead == csize,
              s"zip: $name compressed size differs from central record")
            out
          } catch {
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(
                s"zip: $name malformed deflate: ${e.getMessage}")
          } finally inf.end()
        }
      val c = new CRC32()
      c.update(data)
      require(c.getValue == crc, s"zip: $name CRC32 mismatch")
      entries += Entry(name, method, data)
      off += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    require(off == cdOff + cdSize, "zip: central directory size mismatch")
    entries.result()
  }

  /** Encode an archive; `deflate` per member (stored otherwise). */
  def encode(members: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    case class Rec(name: Array[Byte], method: Int, crc: Long, csize: Int,
                   usize: Int, off: Int)
    val recs = members.map { case (name, data, deflate) =>
      val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val crc = new CRC32(); crc.update(data)
      val (method, payload) =
        if (!deflate) (0, data)
        else {
          val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(data); d.finish()
          // worst case deflate EXPANDS: ~5 bytes per 16K stored block
          val buf = new Array[Byte](data.length + (data.length >> 10) + 64)
          var m = 0
          while (!d.finished()) m += d.deflate(buf, m, buf.length - m)
          d.end()
          (8, java.util.Arrays.copyOf(buf, m))
        }
      val off = bos.size()
      w32(0x04034b50L); w16(20); w16(0); w16(method); w16(0); w16(0)
      w32(crc.getValue); w32(payload.length.toLong); w32(data.length.toLong)
      w16(nb.length); w16(0)
      bos.write(nb); bos.write(payload)
      Rec(nb, method, crc.getValue, payload.length, data.length, off)
    }
    val cdOff = bos.size()
    recs.foreach { r =>
      w32(0x02014b50L); w16(20); w16(20); w16(0); w16(r.method)
      w16(0); w16(0); w32(r.crc); w32(r.csize.toLong); w32(r.usize.toLong)
      w16(r.name.length); w16(0); w16(0); w16(0); w16(0); w32(0)
      w32(r.off.toLong)
      bos.write(r.name)
    }
    val cdSize = bos.size() - cdOff
    w32(0x06054b50L); w16(0); w16(0); w16(recs.size); w16(recs.size)
    w32(cdSize.toLong); w32(cdOff.toLong); w16(0)
    bos.toByteArray
  }
}
