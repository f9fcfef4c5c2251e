package graft.multimodal

/** Synthetic classic-PDF encoder — the fixture half of the `pdf_meta`
  * probe (graft.parse.PdfMetaExpr). The document STRUCTURE is real
  * (ISO 32000 §7.5 file layout: header, numbered objects, a
  * byte-offset-correct cross-reference table, trailer with /Size and
  * /Root, startxref pointer, %%EOF); page CONTENT streams are not
  * emitted — rendering is library territory, the established stub
  * boundary (the probe never reads past object dictionaries).
  *
  * Classic xref-table form only (pre-1.5 style, still ubiquitous and
  * what every writer can emit); cross-reference STREAMS (§7.5.8) are
  * compressed-object territory and out of probe scope by design. */
object Pdf {

  /** Encode a catalog + page tree + `nPages` pages (+ optional /Info),
    * with a correct 20-byte-entry xref table and trailer.
    *
    * `countLie` shifts the page tree's /Count away from the real kid
    * count — a structural lie the probe must catch (never emit it in
    * honest fixtures). */
  def encode(nPages: Int, minor: Int, withInfo: Boolean,
             pageW: Int = 612, pageH: Int = 792,
             countLie: Int = 0): Array[Byte] = {
    require(nPages >= 1 && nPages <= 1000, s"nPages out of range: $nPages")
    require(minor >= 0 && minor <= 9, s"minor out of range: $minor")
    val sb = new StringBuilder
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    sb.append(s"%PDF-1.$minor\n")
    def obj(body: String): Unit = {
      offsets += sb.length
      sb.append(s"${offsets.length} 0 obj\n$body\nendobj\n")
    }
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    val kids = (0 until nPages).map(i => s"${3 + i} 0 R").mkString(" ")
    obj(s"<< /Type /Pages /Kids [$kids] /Count ${nPages + countLie} >>")
    (0 until nPages).foreach { _ =>
      obj(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $pageW $pageH] >>")
    }
    if (withInfo) obj("<< /Producer (graft) /Title (fixture) >>")
    val xrefOff = sb.length
    sb.append(s"xref\n0 ${offsets.length + 1}\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R")
    if (withInfo) sb.append(s" /Info ${offsets.length} 0 R")
    sb.append(s" >>\nstartxref\n$xrefOff\n%%EOF\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }
}
