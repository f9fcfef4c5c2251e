package graft.parse

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the NFC kernel: the kernel (with its ASCII and
  * already-normalized fast paths) must be EXACTLY the JDK Normalizer on
  * every input — the fast paths are an optimization, never a semantic. */
class NfcExprSpec extends AnyFunSuite {

  private def reference(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  private def kernel(s: String): String =
    NfcExpr.nfc(UTF8String.fromString(s)).toString

  test("kernel equals JDK Normalizer on random BMP strings") {
    val rnd = new scala.util.Random(42)
    // weight toward the interesting planes: ASCII, Latin-1 diacritics,
    // combining marks, Hangul jamo + syllables, CJK
    val pools = Seq(
      (0x20, 0x7e), (0xa0, 0xff), (0x300, 0x36f),
      (0x1100, 0x11ff), (0xac00, 0xac30), (0x4e00, 0x4e20))
    for (_ <- 1 to 500) {
      val len = rnd.nextInt(24)
      val s = (0 until len).map { _ =>
        val (lo, hi) = pools(rnd.nextInt(pools.length))
        (lo + rnd.nextInt(hi - lo + 1)).toChar
      }.mkString
      assert(kernel(s) === reference(s), s"input codepoints: ${
        s.map(_.toInt).mkString(",")}")
    }
  }

  test("kernel equals JDK Normalizer on supplementary-plane strings") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 100) {
      val sb = new StringBuilder
      for (_ <- 0 until rnd.nextInt(8)) {
        rnd.nextInt(3) match {
          case 0 => sb.appendAll(Character.toChars(0x1f600 + rnd.nextInt(64)))
          case 1 => sb.append((0x300 + rnd.nextInt(0x40)).toChar)
          case 2 => sb.append(('a' + rnd.nextInt(26)).toChar)
        }
      }
      val s = sb.toString
      assert(kernel(s) === reference(s))
    }
  }

  test("ASCII fast path returns the SAME UTF8String instance") {
    val in = UTF8String.fromString("pure ascii only")
    assert(NfcExpr.nfc(in) eq in)
  }
}
