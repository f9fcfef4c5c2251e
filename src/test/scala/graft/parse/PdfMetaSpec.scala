package graft.parse

import java.nio.charset.StandardCharsets.US_ASCII

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.multimodal.Pdf

/** pdf_meta: honest-structure fields, every structural lie the probe
  * claims to catch, poison/fuzz never-throws, and the SQL surface. */
class PdfMetaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def meta(b: Array[Byte]) = PdfMetaExpr.meta(b)

  test("honest documents: version, objects, pages, info") {
    for (pages <- Seq(1, 3, 5); minor <- Seq(2, 7); info <- Seq(false, true)) {
      val m = meta(Pdf.encode(pages, minor, info))
      assert(m.getBoolean(0), s"pages=$pages minor=$minor info=$info")
      assert(m.getUTF8String(1).toString === s"1.$minor")
      assert(m.getInt(2) === 2 + pages + (if (info) 1 else 0))
      assert(m.getInt(3) === pages)
      assert(m.getBoolean(4) === info)
    }
  }

  test("truncation and bad header fail closed") {
    val base = Pdf.encode(2, 4, withInfo = true)
    assert(!meta(base.take(40)).getBoolean(0))
    assert(!meta(base.take(base.length - 3)).getBoolean(0))
    val hdr = base.clone(); hdr(2) = 'X'.toByte
    assert(!meta(hdr).getBoolean(0))
    assert(!meta(Array.emptyByteArray).getBoolean(0))
    assert(!meta(null).getBoolean(0))
  }

  test("lying startxref pointer is caught") {
    val s = new String(Pdf.encode(2, 4, withInfo = false), US_ASCII)
    val i = { var j = s.lastIndexOf("startxref") + 9
      while (!Character.isDigit(s.charAt(j))) j += 1; j }
    val lied = s.updated(i, ('0' + ((s.charAt(i) - '0' + 1) % 10)).toChar)
    assert(!meta(lied.getBytes(US_ASCII)).getBoolean(0))
  }

  test("lying page-tree /Count is caught") {
    assert(!meta(Pdf.encode(3, 4, withInfo = false, countLie = 1))
      .getBoolean(0))
    assert(!meta(Pdf.encode(3, 4, withInfo = false, countLie = -1))
      .getBoolean(0))
  }

  test("lying trailer /Size and missing /Root are caught") {
    val s = new String(Pdf.encode(2, 4, withInfo = false), US_ASCII)
    val size = s.replace("/Size 5", "/Size 7")
    assert(!meta(size.getBytes(US_ASCII)).getBoolean(0))
    val root = s.replace("/Root", "/Rool")
    assert(!meta(root.getBytes(US_ASCII)).getBoolean(0))
  }

  test("xref entry pointing at the wrong object is caught") {
    val s = new String(Pdf.encode(2, 4, withInfo = false), US_ASCII)
    // object 3's entry (line 4 of the table) redirected to object 1's
    // offset: the '<num> 0 obj' cross-check must fire
    val xref = s.indexOf("xref")
    val lines = s.substring(xref).split("\n", -1)
    val obj1 = lines(2) // first in-use entry
    lines(4) = obj1
    val lied = s.substring(0, xref) + lines.mkString("\n")
    assert(!meta(lied.getBytes(US_ASCII)).getBoolean(0))
  }

  test("byte-flip fuzz never throws") {
    val base = Pdf.encode(4, 5, withInfo = true)
    var seed = 0x12345L
    (0 until 300).foreach { _ =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val i = math.floorMod(seed.toInt, base.length)
      val b = base.clone(); b(i) = (b(i) ^ (seed >> 17).toByte).toByte
      meta(b) // must not throw; verdict unconstrained
    }
    (0 until base.length by 7).foreach(n => meta(base.take(n)))
  }

  test("unterminated-body flood fails fast (no per-object scan to EOF)") {
    // 4000 objects whose bodies never say endobj (one lone terminator
    // near EOF): a per-object indexOf-to-EOF walk would do ~4000 scans
    // of the file; the precomputed endobj index + disjoint-region check
    // must reject this in one linear pass, well inside the deadline
    val n = 4000
    val sb = new StringBuilder("%PDF-1.4\n")
    val offs = (1 to n).map { i =>
      val off = sb.length
      sb.append(s"$i 0 obj <</Filler ${"x" * 48}>>\n")
      off
    }
    sb.append("endobj\n")
    val xrefOff = sb.length
    sb.append(s"xref\n1 $n\n")
    offs.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<</Size $n /Root 1 0 R>>\n")
    sb.append(s"startxref\n$xrefOff\n%%EOF\n")
    val bytes = sb.toString.getBytes(US_ASCII)
    val m = TestSpark.timed(5000)(meta(bytes))
    assert(!m.getBoolean(0), "overlapping unterminated bodies must fail")
  }

  test("SQL surface: pdf_meta over a binary column") {
    import spark.implicits._
    val df = Seq((1L, Pdf.encode(2, 3, withInfo = true)),
        (2L, Array[Byte](1, 2, 3)))
      .toDF("id", "payload")
    df.createOrReplaceTempView("pdf_docs")
    val rows = spark.sql(
      """SELECT id, m.ok, m.n_pages, m.has_info
        |FROM (SELECT id, pdf_meta(payload) AS m FROM pdf_docs)
        |ORDER BY id""".stripMargin).collect()
    assert(rows(0).getBoolean(1) && rows(0).getInt(2) === 2 &&
      rows(0).getBoolean(3))
    assert(!rows(1).getBoolean(1))
  }
}
