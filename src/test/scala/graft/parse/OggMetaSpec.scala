package graft.parse

import org.apache.spark.sql.catalyst.InternalRow
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Ogg

/** Ogg probe: CRC-verified page walk, codec ident parsing, lacing
  * boundaries, strict poison posture. Kernel exercised through
  * [[OggMetaExpr.meta]] directly (the codegen path calls the same
  * static method). */
class OggMetaSpec extends AnyFunSuite {

  private def ok(r: InternalRow): Boolean = r.getBoolean(0)
  private def codec(r: InternalRow): String = r.getUTF8String(1).toString

  test("vorbis stream round-trips every field") {
    val f = Ogg.encode(Ogg.vorbisIdent(2, 44100), nBody = 3,
      lastGranule = 441000L, serial = 77, seed = 5)
    val r = OggMetaExpr.meta(f)
    assert(ok(r) && codec(r) === "vorbis")
    assert(r.getInt(2) === 2)        // channels
    assert(r.getInt(3) === 44100)    // rate
    assert(r.getInt(4) === 5)        // BOS + 3 body + EOS
    assert(r.getLong(5) === 10000L)  // 441000*1000/44100
  }

  test("opus duration runs on the 48 kHz clock less pre-skip") {
    val f = Ogg.encode(Ogg.opusHead(1, 312, 44100), nBody = 0,
      lastGranule = 48312L, serial = 9, seed = 1)
    val r = OggMetaExpr.meta(f)
    assert(ok(r) && codec(r) === "opus")
    assert(r.getInt(3) === 44100) // informational input rate surfaces
    assert(r.getLong(5) === 1000L) // (48312-312)*1000/48000
    // granule below pre-skip clamps to zero, never negative
    val g0 = Ogg.encode(Ogg.opusHead(1, 3120, 44100), nBody = 0,
      lastGranule = 100L, serial = 9, seed = 1)
    assert(OggMetaExpr.meta(g0).getLong(5) === 0L)
  }

  test("single-page BOS|EOS stream and unknown codec both parse") {
    val one = Ogg.encode(Ogg.vorbisIdent(1, 8000), nBody = -1,
      lastGranule = 8000L, serial = 3, seed = 2)
    val r1 = OggMetaExpr.meta(one)
    assert(ok(r1) && r1.getInt(4) === 1 && r1.getLong(5) === 1000L)
    val unk = Ogg.encode("NotACodecIdent".getBytes("US-ASCII"), nBody = 1,
      lastGranule = 999L, serial = 3, seed = 2)
    val r2 = OggMetaExpr.meta(unk)
    assert(ok(r2) && codec(r2) === "unknown")
    assert(r2.isNullAt(2) && r2.isNullAt(3) && r2.isNullAt(5))
    assert(r2.getInt(4) === 3)
  }

  test("a payload crossing the 255 lacing run still walks") {
    // encoder emits [255, …] lacing for >=255-byte payloads; a body
    // page in this fixture is 031+…%400 long, so force one explicitly
    val f = Ogg.encode(Ogg.vorbisIdent(1, 16000), nBody = 4,
      lastGranule = 16000L, serial = 1, seed = 224) // 31+224=255 exactly
    val r = OggMetaExpr.meta(f)
    assert(ok(r) && r.getInt(4) === 6)
  }

  test("poison matrix: every malformation yields ok=false, no throw") {
    val base = Ogg.encode(Ogg.vorbisIdent(2, 48000), nBody = 2,
      lastGranule = 96000L, serial = 11, seed = 7)
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val b = base.clone(); f(b); b
    }
    val poisons = Seq[Array[Byte]](
      mut(b => b(0) = 'X'.toByte),                    // magic
      mut(b => b(4) = 1),                             // version
      mut(b => b(b.length - 1) = (base.last ^ 1).toByte), // CRC lie
      mut(b => b(5) = 0),                             // first page not BOS
      base.take(base.length - 5),                     // torn final page
      base.take(40),                                  // torn header
      base ++ Array[Byte](1, 2, 3),                   // garbage after EOS
      Array.empty[Byte],
      mut(b => b(14) = (b(14) ^ 1).toByte))           // serial flip (CRC too)
    poisons.foreach { p =>
      assert(!ok(OggMetaExpr.meta(p)))
    }
    // a stream whose last page lacks EOS is incomplete
    val noEos = {
      val cut = Ogg.encode(Ogg.vorbisIdent(2, 48000), nBody = 2,
        lastGranule = 96000L, serial = 11, seed = 7)
      // drop the final (EOS) page: find its start by re-walking sizes
      val lastPageLen = 27 + 1 + 17
      cut.take(cut.length - lastPageLen)
    }
    assert(!ok(OggMetaExpr.meta(noEos)))
  }

  test("byte-flip fuzz: meta never throws") {
    val base = Ogg.encode(Ogg.opusHead(2, 100, 48000), nBody = 3,
      lastGranule = 480000L, serial = 42, seed = 13)
    val rnd = new scala.util.Random(7)
    (0 until 400).foreach { _ =>
      val b = base.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      OggMetaExpr.meta(b) // must not throw
    }
    (0 until 100).foreach { _ =>
      OggMetaExpr.meta(base.take(rnd.nextInt(base.length)))
    }
  }
}
