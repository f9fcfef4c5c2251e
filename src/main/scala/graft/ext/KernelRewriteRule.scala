package graft.ext

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType}

import graft.parse.{DotProductExpr, IntDotExpr}

/** Optimizer rule: recognizes the idiomatic higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * (with optional float→double casts inside the lambda) and rewrites it to
  * the codegen'd [[DotProductExpr]] kernel. Users writing the natural
  * `functions._` composition get kernel speed without knowing `vec_dot`
  * exists; semantics are bit-identical (same left fold, same widening —
  * see VectorExprsSpec). Injected by [[GraftExtensions]] via
  * `injectOptimizerRule`.
  */
object KernelRewriteRule extends Rule[LogicalPlan] {

  private def asDouble(e: Expression): Option[Expression] = e match {
    case c @ Cast(inner, DoubleType, _, _) if inner.dataType == FloatType =>
      Some(inner)
    case other if other.dataType == DoubleType => Some(other)
    case _ => None
  }

  /** Matches `(x, y) -> x * y` over the two zip_with lambda variables,
    * modulo double casts, in either operand order. */
  private def isProductLambda(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (asDouble(l), asDouble(r)) match {
        case (Some(a: NamedLambdaVariable), Some(b: NamedLambdaVariable)) =>
          (a.exprId == x.exprId && b.exprId == y.exprId) ||
            (a.exprId == y.exprId && b.exprId == x.exprId)
        case _ => false
      }
    case _ => false
  }

  private def integralElem(t: org.apache.spark.sql.types.DataType): Boolean =
    t match {
      case ArrayType(ByteType | ShortType | IntegerType | LongType, _) => true
      case _ => false
    }

  private def asLong(e: Expression): Option[Expression] = e match {
    case Cast(inner, LongType, _, _) => Some(inner)
    case other if other.dataType == LongType => Some(other)
    case _ => None
  }

  /** Integer analogue of [[isProductLambda]]: `(x, y) -> x * y` modulo
    * widening casts to long. */
  private def isIntProductLambda(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (asLong(l), asLong(r)) match {
        case (Some(a: NamedLambdaVariable), Some(b: NamedLambdaVariable)) =>
          (a.exprId == x.exprId && b.exprId == y.exprId) ||
            (a.exprId == y.exprId && b.exprId == x.exprId)
        case _ => false
      }
    case _ => false
  }

  /** Matches `(acc, v) -> acc + v` in either order. */
  private def isSumLambda(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      (l.exprId == acc.exprId && r.exprId == v.exprId) ||
        (l.exprId == v.exprId && r.exprId == acc.exprId)
    case _ => false
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b, prodF: LambdaFunction),
          Literal(0.0, DoubleType),
          mergeF: LambdaFunction,
          finishF)
          if isProductLambda(prodF) && isSumLambda(mergeF) &&
            isIdentityFinish(finishF) =>
        // Safe unconditionally: DotProductExpr reproduces the HOF's null
        // semantics exactly (NULL on unequal lengths / null elements —
        // zip_with pads with null and null poisons the fold).
        DotProductExpr(a, b)
      case ArrayAggregate(
          ZipWith(a, b, prodF: LambdaFunction),
          Literal(0L, LongType),
          mergeF: LambdaFunction,
          finishF)
          if isIntProductLambda(prodF) && isSumLambda(mergeF) &&
            isIdentityFinish(finishF) &&
            integralElem(a.dataType) && integralElem(b.dataType) =>
        // integer analogue — same null-semantics argument (IntDotExpr)
        IntDotExpr(a, b)
    }
}
