package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** ZIP codec: central-directory walk round-trips; the JDK's own
  * ZipInputStream reads our encodings; strict poison posture. */
class ZipSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private val members = Seq(
    ("a/plain.txt", bytes("hello zip " * 40), false),
    ("b/packed.txt", bytes("the quick brown fox " * 100), true),
    ("empty.txt", Array.empty[Byte], true),
    ("binary.dat", Array.tabulate(4096)(i => (i * 31 % 256).toByte), true))

  test("encode -> decode round-trips names, methods and bytes") {
    val out = Zip.decode(Zip.encode(members))
    assert(out.size === members.size)
    out.zip(members).foreach { case (e, (name, data, deflate)) =>
      assert(e.name === name)
      assert(e.method === (if (deflate) 8 else 0))
      assert(java.util.Arrays.equals(e.data, data), name)
    }
    // deflate really compressed the repetitive member
    assert(Zip.encode(members).length <
      members.map(_._2.length).sum)
  }

  test("the JDK ZipInputStream reads our encodings identically") {
    // independent-implementation cross-check (the TiffSpec discipline)
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(Zip.encode(members)))
    var got = List.empty[(String, Array[Byte])]
    var e = zin.getNextEntry
    while (e != null) {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1024)
      var n = zin.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = zin.read(buf) }
      got ::= (e.getName, bos.toByteArray)
      e = zin.getNextEntry
    }
    val byName = got.toMap
    assert(byName.keySet === members.map(_._1).toSet)
    members.foreach { case (name, data, _) =>
      assert(java.util.Arrays.equals(byName(name), data), name)
    }
  }

  test("a zip written by the JDK decodes through our walk") {
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(bos)
    // JDK default is deflate with data descriptors; our walk reads
    // sizes from the central directory, so flag bit 3 must not matter
    members.foreach { case (name, data, _) =>
      zout.putNextEntry(new java.util.zip.ZipEntry(name))
      zout.write(data)
      zout.closeEntry()
    }
    zout.close()
    val out = Zip.decode(bos.toByteArray)
    assert(out.map(_.name) === members.map(_._1))
    out.zip(members).foreach { case (e, (name, data, _)) =>
      assert(java.util.Arrays.equals(e.data, data), name)
    }
  }

  test("poison archives throw fast, never mis-decode") {
    val good = Zip.encode(members)
    def bad(mut: Array[Byte] => Unit): Unit = {
      val b = good.clone(); mut(b)
      intercept[IllegalArgumentException](Zip.decode(b))
    }
    intercept[IllegalArgumentException](Zip.decode(null))
    intercept[IllegalArgumentException](Zip.decode(Array[Byte](1, 2)))
    intercept[IllegalArgumentException](Zip.decode(good.take(good.length - 4)))
    bad(b => b(b.length - 21) = 'X')           // EOCD signature
    bad(b => b(b.length - 1) = 9)              // lying comment length
    bad(b => b(b.length - 12) = (b(b.length - 12) + 1).toByte) // entry count
    bad(b => b(30 + "a/plain.txt".length) =    // stored payload flip -> CRC
      (b(30 + "a/plain.txt".length) ^ 0x55).toByte)
    bad(b => b(0) = 9)                         // local signature
    // decompressed-size bomb cap
    val big = Zip.encode(Seq(("big", new Array[Byte](1 << 16), true)))
    intercept[IllegalArgumentException](Zip.decode(big, maxOut = 1024))
  }

  test("EOCD back-scan tolerates an archive comment") {
    val withComment = {
      val base = Zip.encode(members)
      val comment = bytes("trailing archive comment")
      val b = java.util.Arrays.copyOf(base, base.length + comment.length)
      System.arraycopy(comment, 0, b, base.length, comment.length)
      // patch the comment length field
      b(base.length - 2) = (comment.length & 0xff).toByte
      b(base.length - 1) = ((comment.length >> 8) & 0xff).toByte
      b
    }
    val out = Zip.decode(withComment)
    assert(out.map(_.name) === members.map(_._1))
  }

  test("byte-flip fuzz: decode() always terminates with decode-or-throw") {
    val seed = Zip.encode(members)
    val rnd = new scala.util.Random(154L)
    for (_ <- 0 until 400) {
      val b = seed.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      try {
        Zip.decode(b).foreach(e => assert(e.data != null))
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
