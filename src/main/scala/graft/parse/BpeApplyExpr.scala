package graft.parse

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Classic BPE apply as ONE kernel pass — the fast path behind
  * [[graft.llm.Bpe.applyBpe]].
  *
  * The replace-fold formulation (kept as `Bpe.applyBpeFold`, and replayed
  * verbatim by the q76 oracle's recursive CTE) is the cross-engine
  * SPECIFICATION: one full-string `replace` scan per merge rule over a
  * 3×-inflated bracketed encoding — ~`rules` passes over every document.
  * This kernel computes the identical function the textbook way: per
  * word, a symbol array merged in learned-rule order, left-to-right,
  * non-overlapping — O(rules × word symbols) on the raw text with zero
  * bracket inflation and no per-rule string reallocation (the merge is
  * in-place with read/write pointers). `BpeSpec` property-tests the two
  * formulations equal on random text (brackets, unicode, whitespace
  * runs) under random fitted merge tables.
  *
  * Contract: the INPUT is already sanitized (lowercased, bracket chars
  * stripped — `Bpe.sanitize`); words are single-space-separated tokens
  * (empties dropped, the TokensExpr rule); word symbols are Unicode
  * CODE POINTS — exactly the fold's `split(w, "")` semantics
  * (UTF8String.split with an empty pattern iterates whole UTF-8 code
  * points, keeping e.g. an emoji as ONE symbol) and the q76 oracle's
  * per-code-point slicing. The symbol loop therefore walks
  * `codePointAt`/`Character.charCount`, never bare `charAt` (which
  * would shear supplementary-plane characters into lone surrogates
  * that UTF8String.fromString re-encodes as '?'). Merges never cross
  * words — merge k's pair only contains symbols produced by merges
  * < k, so one ordered pass per rule is exact BPE. NULL propagates
  * (UnaryExpression default), and the fold spec matches. */
case class BpeApplyExpr(child: Expression, rules: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = StringType

  private val ruleA: Array[String] = rules.map(_._1).toArray
  private val ruleB: Array[String] = rules.map(_._2).toArray

  def applyBpe(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    val out = new java.lang.StringBuilder(n)
    var first = true
    var i = 0
    var syms: Array[String] = new Array[String](16)
    while (i < n) {
      while (i < n && str.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && str.charAt(i) != ' ') i += 1
      if (i > start) {
        val wl = i - start
        if (wl > syms.length) syms = new Array[String](wl)
        // one symbol per CODE POINT (wl code units is an upper bound)
        var j = start
        var len = 0
        while (j < i) {
          val cc = Character.charCount(str.codePointAt(j))
          syms(len) = str.substring(j, j + cc)
          len += 1
          j += cc
        }
        var r = 0
        while (r < ruleA.length && len > 1) {
          val a = ruleA(r); val b = ruleB(r)
          var rd = 0; var wr = 0
          while (rd < len) {
            if (rd < len - 1 && syms(rd).equals(a) && syms(rd + 1).equals(b)) {
              syms(wr) = a + b; rd += 2
            } else {
              syms(wr) = syms(rd); rd += 1
            }
            wr += 1
          }
          len = wr
          r += 1
        }
        var t = 0
        while (t < len) {
          if (!first) out.append(' ')
          out.append(syms(t)); first = false; t += 1
        }
      }
    }
    UTF8String.fromString(out.toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    applyBpe(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApplyExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.applyBpe($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyExpr =
    copy(child = newChild)

  override def prettyName: String = "bpe_apply"
}
