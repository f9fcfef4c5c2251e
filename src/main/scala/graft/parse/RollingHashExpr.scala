package graft.parse

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed rolling-hash document fingerprint (the MOSS scheme): Rabin-Karp
  * hashes over every `k`-char window, then keep the minimum hash of each
  * `w`-window of those (recording each minimum once). Two documents sharing
  * a substring of length >= k + w - 1 are GUARANTEED to share a fingerprint
  * value — the classic copy-detection property — while the signature stays
  * ~|doc|/w values regardless of length.
  *
  * One pass over the string, O(1) per char (rolling update + a ring buffer
  * for the windowed minimum). Registered as SQL `rolling_fingerprint` by
  * GraftExtensions; k=8, w=4 fixed (signature stability across calls).
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    RollingHashExpr.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.parse.RollingHashExpr.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)

  override def prettyName: String = "rolling_fingerprint"
}

object RollingHashExpr {
  final val K = 8   // gram length
  final val W = 4   // winnow window
  private final val B = 1000003L       // rolling base
  // 2^31-1: with h < M and B ~2^20, h*B < 2^51 — plain long arithmetic,
  // no 128-bit modmul needed
  private final val M = 2147483647L

  def fingerprint(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n < K) {
      // short doc: single hash of the whole string (still deterministic)
      var h = 0L
      var i = 0
      while (i < n) { h = mulmod(h, B) + str.charAt(i); h %= M; i += 1 }
      return new GenericArrayData(Array[Any](h))
    }
    val nGrams = n - K + 1
    val grams = new Array[Long](nGrams)
    // B^(K-1) mod M for the rolling subtraction
    var bk = 1L
    var e = 0
    while (e < K - 1) { bk = mulmod(bk, B); e += 1 }
    var h = 0L
    var i = 0
    while (i < K) { h = (mulmod(h, B) + str.charAt(i)) % M; i += 1 }
    grams(0) = h
    i = K
    while (i < n) {
      h = (h - mulmod(str.charAt(i - K).toLong, bk) % M + M) % M
      h = (mulmod(h, B) + str.charAt(i)) % M
      grams(i - K + 1) = h
      i += 1
    }
    // winnow: min of each W-window of gram hashes, recorded once per
    // distinct selection position (rightmost minimum on ties, per MOSS)
    val out = new java.util.ArrayList[Any]()
    var lastPos = -1
    var w0 = 0
    while (w0 + W <= nGrams) {
      var minPos = w0
      var j = w0 + 1
      while (j < w0 + W) {
        if (grams(j) <= grams(minPos)) minPos = j
        j += 1
      }
      if (minPos != lastPos) { out.add(grams(minPos)); lastPos = minPos }
      w0 += 1
    }
    if (out.isEmpty) out.add(grams(0))
    new GenericArrayData(out.toArray)
  }

  private def mulmod(a: Long, b: Long): Long = (a * b) % M
}
