package graft.multimodal

import java.io.ByteArrayOutputStream

/** POSIX ustar (tar) archive codec — the OTHER crawl bundle format:
  * where ZIP carries a central directory + per-member deflate
  * ([[Zip]]), tar is a flat sequence of 512-byte header blocks + raw
  * member bytes, compressed (if at all) by an OUTER wrapper — which is
  * exactly why `.tar.gz` composes with [[Gzip]]: gunzip first, then
  * walk the plain tar. Dataset drops (ImageNet shards, WebDataset,
  * research corpora) ship overwhelmingly as tar/tar.gz, so a training
  * pipeline's ingest meets this layout right after gzip itself.
  *
  * Layout (public ustar spec, POSIX.1-1988): each member is one
  * 512-byte header — name[100], mode[8], uid[8], gid[8], size[12]
  * octal, mtime[12] octal, chksum[8], typeflag[1], linkname[100],
  * magic[6]="ustar\0", version[2]="00", uname[32], gname[32],
  * devmajor[8], devminor[8], prefix[155] — followed by the member
  * bytes padded to a 512 multiple; the archive ends with TWO all-zero
  * blocks. The header checksum is the unsigned byte sum of the header
  * with the chksum field taken as eight spaces.
  *
  * Strict walk (the [[Gzip]]/[[Zip]] posture — fail loudly, an
  * ok=false row, never silent partial output):
  *  - magic/version must be ustar; the stored checksum must match the
  *    recomputed unsigned sum (pre-POSIX signed-sum archives are
  *    rejected — the encoder here writes unsigned, as does every
  *    modern tar);
  *  - octal fields must parse (digits terminated by NUL/space);
  *  - a member size past the payload end fails (tar has no per-member
  *    CRC — truncation inside member DATA is otherwise undetectable;
  *    payload integrity at rest is the outer gzip's CRC32, which is
  *    why the .tar.gz composition is the integral form);
  *  - the terminator must be two FULL zero blocks and any bytes after
  *    them all zero (a truncated tail is an error, not a clean EOF —
  *    the Gzip trailing-garbage discipline);
  *  - only regular files ('0'/NUL) and directories ('5') are walked;
  *    links, FIFOs, and GNU/PAX extension records ('L'/'x'/'g') fail
  *    loudly rather than silently skipping content;
  *  - Σ member sizes is capped (`maxOut`) — bomb containment shared
  *    with [[Zip.decode]].
  */
object Tar {

  final case class Entry(name: String, typeflag: Char, data: Array[Byte])

  private val Block = 512

  private def checksum(hdr: Array[Byte], off: Int): Long = {
    var s = 0L
    var i = 0
    while (i < Block) {
      s += (if (i >= 148 && i < 156) 0x20 else hdr(off + i) & 0xff)
      i += 1
    }
    s
  }

  /** Parse a NUL/space-terminated octal field; throws on junk. */
  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var i = off
    val end = off + len
    while (i < end && (b(i) == ' ')) i += 1
    var v = 0L
    var any = false
    while (i < end && b(i) != 0 && b(i) != ' ') {
      val c = b(i) - '0'
      require(c >= 0 && c <= 7, s"bad octal digit ${b(i)} in tar header")
      v = (v << 3) + c
      any = true
      i += 1
    }
    require(any, "empty octal field in tar header")
    v
  }

  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val lim = off + len
    while (end < lim && b(end) != 0) end += 1
    new String(b, off, end - off, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Walk a ustar archive; returns members in file order. Throws
    * IllegalArgumentException on any malformation. */
  def decode(tar: Array[Byte], maxOut: Long = 1L << 26): Seq[Entry] = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)
    if (tar.length % Block != 0) fail("tar length not a block multiple")
    val out = Seq.newBuilder[Entry]
    var off = 0
    var total = 0L
    var done = false
    while (!done) {
      if (off + Block > tar.length) fail("tar: missing terminator")
      var allZero = true
      var i = 0
      while (allZero && i < Block) {
        if (tar(off + i) != 0) allZero = false; i += 1
      }
      if (allZero) {
        // end-of-archive: a SECOND full zero block, then only zero padding
        if (off + 2 * Block > tar.length) fail("tar: single zero block")
        var j = off + Block
        while (j < tar.length) {
          if (tar(j) != 0) fail("tar: garbage after terminator")
          j += 1
        }
        done = true
      } else {
        if (str(tar, off + 257, 6) != "ustar") fail("tar: bad magic")
        val stored = octal(tar, off + 148, 8)
        val actual = checksum(tar, off)
        if (stored != actual) fail(s"tar: checksum $stored != $actual")
        val size = octal(tar, off + 124, 12)
        val tf = { val c = tar(off + 156); if (c == 0) '0' else c.toChar }
        if (tf != '0' && tf != '5') fail(s"tar: unsupported typeflag '$tf'")
        if (tf == '5' && size != 0) fail("tar: directory with nonzero size")
        val prefix = str(tar, off + 345, 155)
        val name0 = str(tar, off, 100)
        val name = if (prefix.isEmpty) name0 else s"$prefix/$name0"
        if (name.isEmpty) fail("tar: empty member name")
        total += size
        if (total > maxOut) fail(s"tar: member sizes exceed cap $maxOut")
        val dataBlocks = ((size + Block - 1) / Block).toInt
        if (off + Block + dataBlocks * Block > tar.length)
          fail("tar: member size past payload end")
        val data = java.util.Arrays.copyOfRange(
          tar, off + Block, off + Block + size.toInt)
        out += Entry(name, tf, data)
        off += Block + dataBlocks * Block
      }
    }
    out.result()
  }

  /** Build a ustar archive from (name, typeflag, bytes) members —
    * fixture synthesis and the write half of a tar sink. Names must fit
    * the 100-byte field (prefix splitting not emitted); mtime fixed at
    * 0 for determinism. */
  def encode(members: Seq[(String, Char, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    members.foreach { case (name, tf, data) =>
      val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      require(nb.length <= 100, s"tar encode: name too long: $name")
      require(tf != '5' || data.isEmpty, "tar encode: directory with data")
      val hdr = new Array[Byte](Block)
      System.arraycopy(nb, 0, hdr, 0, nb.length)
      def put(s: String, off: Int): Unit = {
        val b = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        System.arraycopy(b, 0, hdr, off, b.length)
      }
      put("0000644", 100); put("0000000", 108); put("0000000", 116)
      put(f"${data.length}%011o", 124)
      put("00000000000", 136)
      hdr(156) = tf.toByte
      put("ustar", 257); hdr(262) = 0; put("00", 263)
      put("root", 265); put("root", 297)
      put("0000000", 329); put("0000000", 337)
      val sum = checksum(hdr, 0)
      put(f"$sum%06o", 148); hdr(154) = 0; hdr(155) = ' '
      bos.write(hdr)
      bos.write(data)
      val pad = (Block - data.length % Block) % Block
      bos.write(new Array[Byte](pad))
    }
    bos.write(new Array[Byte](2 * Block))
    bos.toByteArray
  }
}
