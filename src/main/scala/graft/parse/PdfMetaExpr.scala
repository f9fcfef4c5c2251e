package graft.parse

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PDF document metadata probe — `pdf_meta(binary)` returns
  * struct(ok, version, n_objects, n_pages, has_info) from the classic
  * ISO 32000 §7.5 file structure; no content-stream decode (rendering
  * and filters are library territory — the q144/q153/q161/q167
  * advisory posture; the STRUCTURE layer is public-spec byte layout).
  * Document corpora are full of PDFs, and ingest routing needs exactly
  * these fields: page-count bucketing, version gates, metadata
  * presence, and above all a cheap "is this a well-formed document or
  * crawl junk" verdict.
  *
  * The walk earns its ok flag structurally rather than trusting any
  * single field: header `%PDF-1.x`; `startxref` located from the END
  * (last occurrence governs, per spec); the xref table at that exact
  * offset (a lying pointer fails here); every 20-byte in-use entry's
  * offset must land on `<num> 0 obj` for ITS object number; the
  * trailer must carry /Size equal to the entry count and a /Root; the
  * page tree's /Count must equal the number of /Type /Page objects
  * actually present (a lying /Count fails). Truncations, bad magic,
  * malformed entries, and offsets past EOF all yield ok=false with
  * null fields — never an exception.
  *
  * Scope (documented, not silent): classic single-subsection-style
  * xref TABLES with generation-0 objects — the form every writer can
  * emit; §7.5.8 cross-reference streams and incremental-update chains
  * report ok=false (compressed-object territory, out of probe scope).
  */
case class PdfMetaExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pdf_meta requires binary, got ${t.catalogString}")
  }

  override def dataType: DataType = PdfMetaExpr.schema

  override protected def nullSafeEval(input: Any): Any =
    PdfMetaExpr.meta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.parse.PdfMetaExpr.meta($c)")

  override protected def withNewChildInternal(newChild: Expression): PdfMetaExpr =
    copy(child = newChild)

  override def prettyName: String = "pdf_meta"
}

object PdfMetaExpr {
  val schema: StructType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("version", StringType),
    StructField("n_objects", IntegerType),
    StructField("n_pages", IntegerType),
    StructField("has_info", BooleanType)))

  private val Bad: InternalRow = new GenericInternalRow(
    Array[Any](false, null, null, null, null))

  private def startsWith(b: Array[Byte], off: Int, s: String): Boolean =
    off >= 0 && off + s.length <= b.length &&
      (0 until s.length).forall(i => b(off + i) == s.charAt(i))

  /** Last occurrence of an ASCII needle, or -1. */
  private def lastIndexOf(b: Array[Byte], s: String): Int = {
    var i = b.length - s.length
    while (i >= 0) { if (startsWith(b, i, s)) return i; i -= 1 }
    -1
  }

  private def indexOf(b: Array[Byte], s: String, from: Int, until: Int): Int = {
    var i = math.max(from, 0)
    val end = math.min(until, b.length) - s.length
    while (i <= end) { if (startsWith(b, i, s)) return i; i += 1 }
    -1
  }

  private def isDigit(c: Byte): Boolean = c >= '0' && c <= '9'
  private def isWs(c: Byte): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t'

  /** Parse a non-negative decimal at `off`, skipping leading
    * whitespace; returns (value, posAfter) or null on overflow/none. */
  private def parseInt(b: Array[Byte], off0: Int): (Long, Int) = {
    var off = off0
    while (off < b.length && isWs(b(off))) off += 1
    if (off >= b.length || !isDigit(b(off))) return null
    var v = 0L
    while (off < b.length && isDigit(b(off))) {
      v = v * 10 + (b(off) - '0')
      if (v > Int.MaxValue) return null
      off += 1
    }
    (v, off)
  }

  def meta(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 32) return Bad
    // header: %PDF-1.x
    if (!startsWith(b, 0, "%PDF-")) return Bad
    if (!isDigit(b(5)) || b(6) != '.' || !isDigit(b(7))) return Bad
    val version = new String(b, 5, 3, java.nio.charset.StandardCharsets.US_ASCII)
    // last startxref governs (incremental updates append new ones)
    val sx = lastIndexOf(b, "startxref")
    if (sx < 0) return Bad
    val px = parseInt(b, sx + 9)
    if (px == null) return Bad
    val xrefOff = px._1.toInt
    if (!startsWith(b, xrefOff, "xref")) return Bad // lying pointer
    if (indexOf(b, "%%EOF", sx, b.length) < 0) return Bad
    // xref subsections until "trailer"
    var pos = xrefOff + 4
    while (pos < b.length && isWs(b(pos))) pos += 1
    var nInUse = 0
    var entries = List.empty[(Int, Int)] // (objNum, offset)
    var totalEntries = 0
    var guard = 0
    while (!startsWith(b, pos, "trailer")) {
      guard += 1
      if (guard > 1000) return Bad
      val ps = parseInt(b, pos); if (ps == null) return Bad
      val pc = parseInt(b, ps._2); if (pc == null) return Bad
      val start = ps._1.toInt; val count = pc._1.toInt
      pos = pc._2
      while (pos < b.length && isWs(b(pos))) pos += 1
      var i = 0
      while (i < count) {
        if (pos + 20 > b.length) return Bad
        // 10-digit offset, sp, 5-digit gen, sp, n/f, 2-byte EOL
        var j = 0
        while (j < 10) { if (!isDigit(b(pos + j))) return Bad; j += 1 }
        if (b(pos + 10) != ' ') return Bad
        j = 11
        while (j < 16) { if (!isDigit(b(pos + j))) return Bad; j += 1 }
        if (b(pos + 16) != ' ') return Bad
        val kind = b(pos + 17)
        if (kind != 'n' && kind != 'f') return Bad
        if (kind == 'n') {
          var off = 0L
          j = 0
          while (j < 10) { off = off * 10 + (b(pos + j) - '0'); j += 1 }
          if (off > Int.MaxValue || off >= b.length) return Bad
          entries = (start + i, off.toInt) :: entries
          nInUse += 1
        }
        totalEntries += 1
        pos += 20
        i += 1
      }
      while (pos < b.length && isWs(b(pos))) pos += 1
      if (pos >= b.length) return Bad
    }
    // every in-use offset must land on "<num> 0 obj". endobj positions
    // are collected in ONE linear pass and looked up by binary search:
    // a per-object indexOf(..., b.length) scans to EOF on crafted input
    // whose bodies never terminate — O(n_objects x file_size), a DoS
    // hot spot for a probe meant to run over untrusted crawl corpora.
    // This keeps the walk O(file + objects·log objects) no matter what
    // the bytes claim.
    val endobjPos = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
      var p = indexOf(b, "endobj", 0, b.length)
      while (p >= 0) { buf += p; p = indexOf(b, "endobj", p + 6, b.length) }
      buf.toArray
    }
    def endobjAfter(from: Int): Int = {
      var lo = 0
      var hi = endobjPos.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (endobjPos(m) < from) lo = m + 1 else hi = m
      }
      if (lo < endobjPos.length) endobjPos(lo) else -1
    }
    // objects must occupy DISJOINT regions (each body ends before the
    // next object starts) — true of any honest file, and the invariant
    // that keeps the in-body /Type//Count searches linear overall: with
    // overlapping bodies a crafted file could still make each object
    // re-scan the same megabytes
    val sortedOffs = entries.map(_._2).toArray
    java.util.Arrays.sort(sortedOffs)
    def nextOffsetAfter(off: Int): Int = {
      var lo = 0
      var hi = sortedOffs.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (sortedOffs(m) <= off) lo = m + 1 else hi = m
      }
      if (lo < sortedOffs.length) sortedOffs(lo) else Int.MaxValue
    }
    var nPages = 0
    var pagesCount = -1
    var it = entries
    while (it.nonEmpty) {
      val (num, off) = it.head
      it = it.tail
      val pn = parseInt(b, off)
      if (pn == null || pn._1 != num) return Bad
      if (!startsWith(b, pn._2, " 0 obj")) return Bad
      val bodyEnd = endobjAfter(pn._2)
      if (bodyEnd < 0) return Bad
      if (bodyEnd > nextOffsetAfter(off)) return Bad // overlapping bodies
      val tp = indexOf(b, "/Type /Page", pn._2, bodyEnd)
      if (tp >= 0) {
        if (startsWith(b, tp + 11, "s")) { // /Type /Pages — the tree node
          val pc = indexOf(b, "/Count", pn._2, bodyEnd)
          if (pc < 0) return Bad
          val cv = parseInt(b, pc + 6)
          if (cv == null) return Bad
          pagesCount = cv._1.toInt
        } else nPages += 1
      }
    }
    // trailer dict: /Size must equal the entry count; /Root required
    val tEnd = indexOf(b, "startxref", pos, b.length)
    if (tEnd < 0) return Bad
    val sz = indexOf(b, "/Size", pos, tEnd)
    if (sz < 0) return Bad
    val sv = parseInt(b, sz + 5)
    if (sv == null || sv._1 != totalEntries) return Bad
    if (indexOf(b, "/Root", pos, tEnd) < 0) return Bad
    val hasInfo = indexOf(b, "/Info", pos, tEnd) >= 0
    // the page tree's declared /Count must match reality
    if (pagesCount < 0 || pagesCount != nPages) return Bad
    new GenericInternalRow(Array[Any](
      true, UTF8String.fromString(version), nInUse, nPages, hasInfo))
  }
}
