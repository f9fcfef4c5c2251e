package graft.parse

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass native parse of the AliCCP KV blob
  * (`field\x02feat\x03weight` triples joined by `\x01`) to
  * `map<string,string>`, as a custom Catalyst expression with codegen.
  *
  * Identical semantics to [[AliccpCodec.parseKv]] (the
  * split/transform/map_from_entries composition, property-tested equal in
  * ParseKvExprSpec): weight discarded, empty segments skipped, duplicate
  * field ids last-wins, malformed segments degrade exactly like the
  * substring_index composition. The composition allocates an array of
  * segment strings, an array of structs and a map builder per row; this
  * expression walks the string once and allocates only the final key/value
  * arrays — the difference is material when the blob column is the widest
  * thing in a 100 TB scan (SURVEY.md §4.2 pathology #1).
  *
  * Registered as SQL function `parse_kv` via
  * [[graft.ext.GraftExtensions]] (SparkSessionExtensions.injectFunction).
  */
case class ParseKvExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_kv requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ParseKvExpr.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.parse.ParseKvExpr.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): ParseKvExpr =
    copy(child = newChild)

  override def prettyName: String = "parse_kv"
}

/** Single-pass extraction of a FIXED field list from the KV blob, straight
  * to a struct — the projection-time shortcut for the Silver schema: no
  * intermediate map is materialized and no per-column linear map lookup
  * runs (the map path costs one `map_concat` copy plus 25 O(|map|) probes
  * per row). Missing field -> null; duplicate ids within the blob
  * last-wins; weight discarded — exactly [[ParseKvExpr]]'s semantics
  * restricted to the requested keys (property-tested in AliccpSpec).
  *
  * Merge precedence across two blobs (skeleton then common, common wins)
  * becomes per-field `coalesce(common.f, skeleton.f)` in the caller: a key
  * is "present" iff the blob carries it, which is exactly when the struct
  * slot is non-null.
  */
case class ParseKvFieldsExpr(child: Expression, fields: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && fields.nonEmpty)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_kv_fields requires (string, non-empty field list), got " +
        s"${child.dataType.catalogString}, $fields")

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(
      fields.map(f => org.apache.spark.sql.types.StructField(f, StringType)))

  @transient private lazy val slot: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    fields.zipWithIndex.foreach { case (f, i) => m.put(f, i) }
    m
  }

  def extract(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    import ParseKvExpr.{Kv, Rec, Weight}
    val str = s.toString
    val n = str.length
    val out = new Array[Any](fields.length)
    var i = 0
    while (i < n) {
      var end = str.indexOf(Rec, i)
      if (end < 0) end = n
      if (end > i) {
        val kSep = str.indexOf(Kv, i)
        val kEnd = if (kSep < 0 || kSep >= end) end else kSep
        val idx = slot.get(str.substring(i, kEnd))
        if (idx != null) {
          val wSep = str.indexOf(Weight, i)
          val vEnd = if (wSep < 0 || wSep >= end) end else wSep
          val lastKv = if (vEnd > i) str.lastIndexOf(Kv, vEnd - 1) else -1
          val vStart = if (lastKv >= i) lastKv + 1 else i
          out(idx) = UTF8String.fromString(str.substring(vStart, vEnd))
        }
      }
      i = end + 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("parseKvFieldsExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.extract($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ParseKvFieldsExpr =
    copy(child = newChild)

  override def prettyName: String = "parse_kv_fields"
}

object ParseKvExpr {
  private[parse] final val Rec = '\u0001'
  private[parse] final val Kv = '\u0002'
  private[parse] final val Weight = '\u0003'

  /** Static helper shared by interpreted eval and generated code. */
  def parse(s: UTF8String): MapData = {
    val str = s.toString
    val n = str.length
    // LinkedHashMap: first-insertion position, last value — exactly the
    // LAST_WIN policy of ArrayBasedMapBuilder (and Python dict.update)
    val m = new java.util.LinkedHashMap[String, String]()
    var i = 0
    while (i < n) {
      var end = str.indexOf(Rec, i)
      if (end < 0) end = n
      if (end > i) { // skip empty segments, like filter(length > 0)
        val kSep = str.indexOf(Kv, i)
        val kEnd = if (kSep < 0 || kSep >= end) end else kSep
        val key = str.substring(i, kEnd)
        val wSep = str.indexOf(Weight, i)
        val vEnd = if (wSep < 0 || wSep >= end) end else wSep
        val lastKv = if (vEnd > i) str.lastIndexOf(Kv, vEnd - 1) else -1
        val vStart = if (lastKv >= i) lastKv + 1 else i
        m.put(key, str.substring(vStart, vEnd))
      }
      i = end + 1
    }
    val keys = new Array[Any](m.size)
    val values = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = UTF8String.fromString(e.getKey)
      values(j) = UTF8String.fromString(e.getValue)
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
  }
}
