package graft.parse

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd vector/hash kernels. Spark's higher-order functions
  * (`aggregate`, `zip_with`, `transform`) evaluate their lambda per element
  * through the interpreted expression evaluator — for a 64-dim dot product
  * inside an n×q similarity join that interpretation dominates the profile.
  * These expressions drop to a tight JVM loop while producing EXACTLY the
  * same doubles as the HOF compositions they replace (same left-to-right
  * fold, same float→double widening), so oracle results are unchanged.
  *
  * Registered by [[graft.ext.GraftExtensions]] as `vec_dot` / `simhash64`.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float|double> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  // NULL on null input, unequal lengths, or a null element — see dot().
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""java.lang.Double $tmp = graft.parse.DotProductExpr.dot(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object DotProductExpr {
  /** Left-to-right fold in double — bit-identical to
    * `aggregate(zip_with(a, b, (x,y) => x.cast(double)*y.cast(double)), 0.0, _+_)`
    * INCLUDING its null semantics: zip_with pads unequal lengths with null
    * and null propagates through the fold, so unequal lengths or any null
    * element yield NULL (not a truncated/partial sum). This is what makes
    * the KernelRewriteRule substitution safe on any input. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** Squared L2 distance over float/double arrays — the kernel behind
  * [[graft.llm.Pq]]'s per-subspace codebook distances: encode evaluates
  * m×ksub of these per corpus row, and the
  * `aggregate(zip_with(a, b, (x,c) -> (x-c)*(x-c)), 0.0, _+_)` HOF form
  * runs its lambda interpreted per element (KernelRewriteRule only
  * matches the plain product lambda). Same left-to-right fold, same
  * per-element arithmetic — (x−c)*(x−c) then acc+term in index order —
  * so the doubles are bit-identical to the HOF composition's. Null
  * semantics identical to [[DotProductExpr]]: NULL on null input,
  * unequal lengths, or any null element — never a partial sum. */
case class L2SqExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_l2sq requires array<float|double> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    L2SqExpr.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("l2sq")
      s"""java.lang.Double $tmp = graft.parse.L2SqExpr.l2sq(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_l2sq"
}

object L2SqExpr {
  /** Left-to-right fold in double — bit-identical to
    * `aggregate(zip_with(a, b, (x,c) => (x-c)*(x-c)), 0.0, _+_)`
    * including its null semantics (see [[DotProductExpr.dot]]). */
  def l2sq(a: ArrayData, b: ArrayData, aFloat: Boolean,
           bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val c = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - c
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** PQ subspace code assignment: argmin over a codebook of squared-L2
  * distances — the whole per-subspace encode step
  * ([[graft.llm.Pq.encode]]) in ONE native call. The expression-tree
  * form (array(ksub × l2 folds) + array_min + array_position) evaluates
  * ksub distance expressions per row through either the interpreted HOF
  * evaluator or a generated method large enough that HotSpot refuses to
  * JIT it; this is one tight loop over a pre-extracted double[][] table.
  *
  * Bit-identical to the composition it replaces:
  *   - each distance is the same left-to-right (x−c)² fold;
  *   - the winner is the FIRST minimum under Spark's double ordering
  *     (java.lang.Double.compare — NaN greatest, NaN equal to itself),
  *     exactly array_position(ds, array_min(ds)) − 1 on an all-non-null
  *     distance array;
  *   - null input element or length mismatch ⇒ every distance is NULL in
  *     the HOF form ⇒ code NULL (same here).
  * PqSpec/VectorExprsSpec pin composition equality. */
case class PqCodeExpr(child: Expression, codebook: Seq[Seq[Double]])
    extends UnaryExpression {

  require(codebook.nonEmpty && codebook.forall(_.size == codebook.head.size),
    "pq_code: codebook must be a non-empty rectangular table")

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_code requires array<float|double> input, got " +
        child.dataType.catalogString)

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  private lazy val table: Array[Array[Double]] =
    codebook.map(_.toArray).toArray

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Shared eval: one pass per centroid, same fold order as the l2
    * expression; first-min by Double.compare (array_min/array_position
    * ordering). */
  def code(sub: ArrayData): java.lang.Integer = {
    val n = sub.numElements()
    var best = 0.0
    var bestIdx = -1
    var c = 0
    while (c < table.length) {
      val cent = table(c)
      if (n != cent.length) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        if (sub.isNullAt(i)) return null
        val x = if (isFloat) sub.getFloat(i).toDouble else sub.getDouble(i)
        val d = x - cent(i)
        s += d * d
        i += 1
      }
      if (bestIdx < 0 || java.lang.Double.compare(s, best) < 0) {
        best = s; bestIdx = c
      }
      c += 1
    }
    java.lang.Integer.valueOf(bestIdx)
  }

  override protected def nullSafeEval(input: Any): Any =
    code(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodeExpr", this)
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("pqc")
      s"""java.lang.Integer $tmp = $ref.code($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.intValue(); }""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodeExpr =
    copy(child = newChild)

  override def prettyName: String = "pq_code"
}

/** Exact integer dot product over integral arrays (tinyint..bigint) —
  * the kernel behind quantized similarity ([[graft.llm.Quant]]): a
  * 64-dim int8 dot inside an n×q scoring join evaluates its lambda
  * per element when written as `aggregate(zip_with(...))`; this is one
  * tight loop with the same long arithmetic. Null semantics identical
  * to that composition (and to [[DotProductExpr]]): NULL on null input,
  * unequal lengths, or any null element — never a partial sum. */
case class IntDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(ByteType | ShortType | IntegerType | LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot_i requires integral-array args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntDotExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemType(left), elemType(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intDotExpr", this)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("idot")
      s"""java.lang.Long $tmp = $ref.eval2($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }""".stripMargin
    })
  }

  /** Codegen entry point (instance method so element types ride along). */
  def eval2(a: ArrayData, b: ArrayData): java.lang.Long =
    IntDotExpr.dot(a, b, elemType(left), elemType(right))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot_i"
}

object IntDotExpr {
  private def get(a: ArrayData, i: Int, t: DataType): Long = t match {
    case ByteType => a.getByte(i).toLong
    case ShortType => a.getShort(i).toLong
    case IntegerType => a.getInt(i).toLong
    case LongType => a.getLong(i)
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  def dot(a: ArrayData, b: ArrayData, ta: DataType,
          tb: DataType): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += get(a, i, ta) * get(b, i, tb)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}

/** Whitespace tokenizer: split on single spaces, drop empty tokens — the
  * kernel behind TextStats.tokens. The `filter(split(text," "), len>0)`
  * composition runs the filter lambda interpreted per token, on EVERY
  * textual operator; this walks the string once. */
case class TokensExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"tokens_ws requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TokensExpr.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.parse.TokensExpr.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): TokensExpr =
    copy(child = newChild)

  override def prettyName: String = "tokens_ws"
}

/** Unicode NFC normalization — the canonicalization a dedup/fingerprint
  * pipeline runs BEFORE hashing: composed ("é" U+00E9) and decomposed
  * ("e"+U+0301) spellings of the same text are byte-different, so every
  * content-identity operator (exact dedup, MinHash, rolling fingerprints,
  * the snapshot diff) silently treats them as distinct documents until
  * normalized. Canonical composition only (NFC), NOT NFKC — compatibility
  * folding ("ﬁ"→"fi") is lossy and a corpus-policy decision, not a
  * canonicalization. Delegates to `java.text.Normalizer` (the JDK's
  * implementation of the public Unicode standard; DuckDB's
  * `nfc_normalize` implements the same algorithm — cross-engine-exact,
  * which the q107 oracle exercises on synthesized decomposed text). The
  * ASCII-only fast path skips the Normalizer entirely — real corpora are
  * dominated by ASCII runs and NFC is the identity on them. */
case class NfcExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NfcExpr.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.parse.NfcExpr.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcExpr =
    copy(child = newChild)

  override def prettyName: String = "nfc"
}

object NfcExpr {
  def nfc(s: UTF8String): UTF8String = {
    // ASCII fast path: NFC is the identity below U+0080; UTF8String
    // knows byte-level ASCII-ness without decoding
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if (bytes(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object TokensExpr {
  def tokens(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < n) {
      while (i < n && str.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && str.charAt(i) != ' ') i += 1
      if (i > start) out.add(UTF8String.fromString(str.substring(start, i)))
    }
    new GenericArrayData(out.toArray)
  }
}

/** Count of array elements contained in a FOLDABLE set — the kernel behind
  * stopword ratios and language-ID marker voting, replacing one interpreted
  * `filter(toks, isin(...))` pass per marker set. The set is built once per
  * expression instance, not per row. */
case class CountInExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "count_in requires (array<string>, foldable array<string>)")
    }

  override def dataType: DataType = IntegerType

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    val arr = right.eval(null).asInstanceOf[ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i))
      i += 1
    }
    s
  }

  def countIn(arr: ArrayData): Int = {
    var c = 0
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    countIn(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("countInExpr", this)
    nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $ref.countIn($a);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountInExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "count_in"
}

/** Jaccard similarity of two string arrays — native kernel for the
  * `size(array_intersect)/union` composition (ArrayIntersect builds a hash
  * map per evaluation in interpreted eval). Semantics identical to
  * `Dedup.jaccard`: inter = |distinct elems of a present in b|,
  * union = numElements(a) + numElements(b) - inter (raw sizes, as the
  * composition used), empty∪empty -> 1.0. */
case class JaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard requires array<string> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardExpr.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.parse.JaccardExpr.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard"
}

object JaccardExpr {
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val bSet = new java.util.HashSet[UTF8String](b.numElements() * 2)
    var i = 0
    while (i < b.numElements()) {
      if (!b.isNullAt(i)) bSet.add(b.getUTF8String(i))
      i += 1
    }
    val seen = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var inter = 0
    i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) {
        val e = a.getUTF8String(i)
        if (bSet.contains(e) && seen.add(e)) inter += 1
      }
      i += 1
    }
    val union = (a.numElements() + b.numElements()).toDouble - inter
    if (union > 0) inter / union else 1.0
  }
}

/** |distinct(a) ∩ b| for two long arrays — the candidate filter for
  * rolling-fingerprint near-dup joins (interpreted array_intersect builds
  * per-row hash maps; this is one primitive-friendly pass). */
case class IntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"intersect_count requires array<bigint> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectCountExpr.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.parse.IntersectCountExpr.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "intersect_count"
}

object IntersectCountExpr {
  def count(a: ArrayData, b: ArrayData): Long = {
    val bSet = new java.util.HashSet[java.lang.Long](b.numElements() * 2)
    var i = 0
    while (i < b.numElements()) { bSet.add(b.getLong(i)); i += 1 }
    val seen = new java.util.HashSet[java.lang.Long](a.numElements() * 2)
    var c = 0L
    i = 0
    while (i < a.numElements()) {
      val e = a.getLong(i)
      if (bSet.contains(e) && seen.add(e)) c += 1
      i += 1
    }
    c
  }
}

/** Distinct token k-shingles in one pass — the kernel behind
  * Dedup.shingles. The `transform(sequence, slice + array_join)` +
  * `array_distinct` composition evaluates interpreted per shingle AND
  * re-walks the token array per slice; this tokenizes and builds each
  * shingle in a single sweep. Output order is first-occurrence, identical
  * to array_distinct over the positional transform (property-tested in
  * DedupSpec). k > token count falls back to the whole-doc shingle, and an
  * empty string yields [""] — both exactly as the HOF composition. */
case class ShinglesExpr(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"shingles_k requires (string, k >= 1), got ${child.dataType.catalogString}, $k")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  def shingle(s: UTF8String): ArrayData = {
    val str = s.toString
    // tokenize exactly like TokensExpr (split on ' ', drop empties)
    val toks = new java.util.ArrayList[String]()
    val n = str.length
    var i = 0
    while (i < n) {
      while (i < n && str.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && str.charAt(i) != ' ') i += 1
      if (i > start) toks.add(str.substring(start, i))
    }
    val out = new java.util.LinkedHashSet[String]()
    val m = toks.size()
    if (m >= k) {
      val sb = new java.lang.StringBuilder()
      var w = 0
      while (w + k <= m) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks.get(w + j))
          j += 1
        }
        out.add(sb.toString)
        w += 1
      }
    } else {
      // whole-doc fallback (k > token count), like array_join(toks, " ")
      out.add(String.join(" ", toks))
    }
    val arr = new Array[Any](out.size())
    val it = out.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(arr)
  }

  override protected def nullSafeEval(input: Any): Any =
    shingle(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shinglesExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.shingle($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)

  override def prettyName: String = "shingles_k"
}

/** Cross-engine 64-bit MD5 token hash: the bit pattern of DuckDB's
  * `md5_number_lower(s)` (bytes 8..15 of the MD5 digest, little-endian),
  * reinterpreted as a signed JVM long. MD5 is the one 64-bit-capable hash
  * both engines compute identically from public primitives, which is what
  * lets hash-seeded operators (SimHash, MinHash) be ORACLE-CHECKED against
  * DuckDB instead of rows-only: the oracle recomputes the same per-token
  * hashes in SQL. Production pipelines keep the default engine hashes
  * (XXH64/Murmur3 — several× cheaper); the md5 mode exists for
  * cross-engine verification and costs one digest per token. */
object Md5Hash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  def lower64(s: UTF8String): Long = {
    val d = md.get()
    val bytes = buf.get()
    d.reset()
    d.update(s.getBytes)
    d.digest(bytes, 0, 16)
    var out = 0L
    var i = 15
    while (i >= 8) { out = (out << 8) | (bytes(i) & 0xffL); i -= 1 }
    out
  }

  /** Non-negative 31-bit base hash for MinHash permutations (fits the
    * overflow-free `(a*h+b) % p` arithmetic in BOTH engines' 64-bit
    * integers): the top 31 bits of [[lower64]] — `md5_number_lower(s) >> 33`
    * in DuckDB. */
  def base31(s: UTF8String): Long = Md5Hash.lower64(s) >>> 33
}

/** Scalar form of [[Md5Hash.lower64]], registered as SQL `md5_lower64`:
  * the cross-engine 64-bit hash (DuckDB `md5_number_lower` reinterpreted
  * signed) for operators whose results must be oracle-recomputable from
  * their input hashes (e.g. the KMV sketch's bottom-k). */
case class Md5Lower64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_lower64 requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash.lower64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.parse.Md5Hash.lower64($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Lower64Expr =
    copy(child = newChild)

  override def prettyName: String = "md5_lower64"
}

/** MinHash signature kernel: one pass over the shingle array computing all
  * `numHashes` permutation minima at once. Bit-identical to the
  * `transform(shingles, hash).array_min per permutation` HOF composition in
  * Dedup.minhashSignatureHof (same Murmur3 seed-42 base hash, same
  * `pmod(h*a+b, 2^31-1)` permutations from the same seeded param stream),
  * but without numHashes interpreted lambda passes per row — the q17
  * signature stage dominated its profile. Empty input -> empty signature
  * (callers guarantee >= 1 shingle).
  *
  * `hashMode` selects the base hash: "murmur3" (Spark `hash()`, the
  * production default) or "md5" ([[Md5Hash.base31]], DuckDB-recomputable —
  * see [[Md5Hash]]). */
case class MinhashExpr(child: Expression, numHashes: Int, seed: Long,
                       hashMode: String = "murmur3")
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _)
        if numHashes > 0 && Set("murmur3", "md5")(hashMode) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash32 requires array<string>, numHashes > 0 and hashMode in " +
        s"(murmur3|md5), got ${child.dataType.catalogString}, $numHashes, " +
        hashMode)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // identical param stream to Dedup.minhashSignatureHof
  @transient private lazy val params: (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      a(i) = (1 + rnd.nextInt(Int.MaxValue - 1)).toLong
      b(i) = rnd.nextInt(Int.MaxValue).toLong
      i += 1
    }
    (a, b)
  }

  @transient private lazy val useMd5: Boolean = hashMode == "md5"

  def minhash(arr: ArrayData): ArrayData = {
    val (pa, pb) = params
    val p = 2147483647L
    val n = arr.numElements()
    val out = new Array[Long](numHashes)
    // empty-set minimum mirrors array_min's "no elements" only when the
    // caller never passes empty arrays; we return the identity (p) instead
    // of null to keep the element type non-null
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      // Spark's hash() base: Murmur3 x86_32, seed 42, sign-extended —
      // including hash(NULL) == the seed, which the HOF reference lets
      // participate in every permutation minimum, so null elements must
      // hash to 42 here too (not be skipped) to stay bit-identical
      val h =
        if (arr.isNullAt(i)) 42L
        else if (useMd5) Md5Hash.base31(arr.getUTF8String(i))
        else {
          val s = arr.getUTF8String(i)
          org.apache.spark.unsafe.hash.Murmur3_x86_32
            .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
            .toLong
        }
      var j = 0
      while (j < numHashes) {
        val v = ((h * pa(j) + pb(j)) % p + p) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    var j = 0
    while (j < numHashes) { if (out(j) == Long.MaxValue) out(j) = p; j += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    minhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.minhash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashExpr =
    copy(child = newChild)

  override def prettyName: String = "minhash32"
}

/** 64-bit SimHash over an array of tokens: per-token 64-bit hash,
  * sign-vote per bit position. Same output as the 64-`aggregate` HOF
  * composition it replaces.
  *
  * `hashMode` selects the token hash: "xxh64" (seed 42, identical to
  * Spark's `xxhash64` — the production default) or "md5"
  * ([[Md5Hash.lower64]], DuckDB-recomputable as `md5_number_lower` — lets
  * SimHash pipelines be oracle-checked end to end, see [[Md5Hash]]). */
case class SimhashExpr(child: Expression, hashMode: String = "xxh64")
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if Set("xxh64", "md5")(hashMode) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string> and hashMode in (xxh64|md5), " +
        s"got ${t.catalogString}, $hashMode")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimhashExpr.simhash(input.asInstanceOf[ArrayData], hashMode == "md5")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.parse.SimhashExpr.simhash($c, ${hashMode == "md5"})")

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimhashExpr {
  def simhash(arr: ArrayData, useMd5: Boolean): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s: UTF8String = arr.getUTF8String(i)
        val h =
          if (useMd5) Md5Hash.lower64(s)
          else org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
