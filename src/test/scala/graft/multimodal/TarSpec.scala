package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** ustar codec: spec-pinned header layout, round-trip, strict poison
  * posture, the documented no-data-CRC property, and the .tar.gz
  * composition that restores integrity. */
class TarSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private val members: Seq[(String, Char, Array[Byte])] = Seq(
    ("dir/", '5', Array.empty[Byte]),
    ("dir/a.txt", '0', bytes("hello tar " * 40)),
    ("dir/empty.bin", '0', Array.empty[Byte]),
    ("big.dat", '0', Array.tabulate(1500)(i => (i * 37 % 256).toByte)))

  test("encode -> decode round-trips names, types and bytes") {
    val out = Tar.decode(Tar.encode(members))
    assert(out.size === members.size)
    out.zip(members).foreach { case (e, (name, tf, data)) =>
      assert(e.name === name)
      assert(e.typeflag === tf)
      assert(java.util.Arrays.equals(e.data, data), name)
    }
  }

  test("header layout is spec-pinned (offsets, octal fields, terminator)") {
    val tar = Tar.encode(Seq(("a.txt", '0', bytes("hi"))))
    // one header block + one data block + two zero blocks
    assert(tar.length === 512 * 4)
    assert(new String(tar, 0, 5, "US-ASCII") === "a.txt")
    assert(tar(5) === 0) // name NUL-terminated
    assert(new String(tar, 100, 7, "US-ASCII") === "0000644") // mode
    assert(new String(tar, 124, 11, "US-ASCII") === "00000000002") // size
    assert(new String(tar, 257, 5, "US-ASCII") === "ustar") // magic
    assert(tar(262) === 0)
    assert(new String(tar, 263, 2, "US-ASCII") === "00") // version
    assert(tar(156) === '0'.toByte) // typeflag
    assert(new String(tar, 512, 2, "US-ASCII") === "hi")
    // recompute the unsigned checksum and compare with the stored field
    var sum = 0L
    (0 until 512).foreach { i =>
      sum += (if (i >= 148 && i < 156) 0x20 else tar(i) & 0xff)
    }
    assert(new String(tar, 148, 6, "US-ASCII") === "%06o".format(sum))
    assert(tar(154) === 0 && tar(155) === ' '.toByte)
    // terminator: two full zero blocks
    assert((512 * 2 until 512 * 4).forall(tar(_) == 0))
  }

  test("prefix field extends the name on decode") {
    val tar = Tar.encode(Seq(("x.txt", '0', bytes("y"))))
    val withPrefix = tar.clone()
    val p = bytes("deep/tree")
    System.arraycopy(p, 0, withPrefix, 345, p.length)
    // re-seal checksum after editing the header
    var sum = 0L
    (0 until 512).foreach { i =>
      sum += (if (i >= 148 && i < 156) 0x20 else withPrefix(i) & 0xff)
    }
    val cs = "%06o".format(sum).getBytes("US-ASCII")
    System.arraycopy(cs, 0, withPrefix, 148, 6)
    withPrefix(154) = 0; withPrefix(155) = ' '.toByte
    assert(Tar.decode(withPrefix).head.name === "deep/tree/x.txt")
  }

  test("poison matrix: every malformation throws, never partial output") {
    val base = Tar.encode(members)
    def mut(f: Array[Byte] => Array[Byte]): Array[Byte] = f(base.clone())
    val poisons: Seq[(String, Array[Byte])] = Seq(
      "bad magic" -> mut { b => b(257) = 'X'.toByte; b },
      "checksum flip" -> mut { b => b(148) = (b(148) ^ 1).toByte; b },
      "non-octal size" -> mut { b => b(124) = 'Z'.toByte; b },
      "not block multiple" -> base.take(base.length - 1),
      "torn terminator" -> base.take(base.length - 600),
      "single zero block" -> base.take(base.length - 512),
      "garbage after terminator" -> mut { b => b(b.length - 1) = 7; b },
      "missing terminator" -> base.take(512 * 2),
      "empty input" -> Array.empty[Byte])
    poisons.foreach { case (label, p) =>
      assertThrows[IllegalArgumentException](Tar.decode(p))
    }
    // unsupported typeflag (symlink) fails loudly
    val link = Tar.encode(Seq(("a", '0', Array.empty[Byte]))).clone()
    link(156) = '2'.toByte
    var sum = 0L
    (0 until 512).foreach { i =>
      sum += (if (i >= 148 && i < 156) 0x20 else link(i) & 0xff)
    }
    val cs = "%06o".format(sum).getBytes("US-ASCII")
    System.arraycopy(cs, 0, link, 148, 6)
    link(154) = 0; link(155) = ' '.toByte
    assertThrows[IllegalArgumentException](Tar.decode(link))
  }

  test("bomb cap trips on total member size") {
    val tar = Tar.encode(Seq(("big", '0', new Array[Byte](4096))))
    assertThrows[IllegalArgumentException](Tar.decode(tar, maxOut = 1024))
  }

  test("plain tar does NOT detect data flips; the gzip wrap does") {
    // the documented limitation: tar has a HEADER checksum only, so a
    // flipped DATA byte silently changes the member — and the reason
    // .tar.gz is the integral form: gzip's CRC32 catches the same flip
    val tar = Tar.encode(Seq(("a.txt", '0', bytes("hello tar world"))))
    val flipped = tar.clone()
    flipped(512 + 3) = (flipped(512 + 3) ^ 0x40).toByte
    val e = Tar.decode(flipped).head
    assert(new String(e.data, "UTF-8") !== "hello tar world")

    val gz = Gzip.encode(tar)
    val gzFlipped = gz.clone()
    // flip a byte in the deflate body (past the 10-byte header)
    gzFlipped(12) = (gzFlipped(12) ^ 0x40).toByte
    assertThrows[IllegalArgumentException](Gzip.decode(gzFlipped))
  }

  test("byte-flip fuzz: decode either parses or throws IAE, never else") {
    val base = Tar.encode(members)
    val rnd = new scala.util.Random(42)
    (0 until 300).foreach { _ =>
      val b = base.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      try Tar.decode(b)
      catch { case _: IllegalArgumentException => () }
    }
    // truncation fuzz
    (0 until 100).foreach { _ =>
      val n = rnd.nextInt(base.length)
      try Tar.decode(base.take(n))
      catch { case _: IllegalArgumentException => () }
    }
  }
}
