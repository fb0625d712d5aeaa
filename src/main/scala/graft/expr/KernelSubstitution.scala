package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite the documented composable cosine form
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *     / (sqrt(<same fold>(a, a)) * sqrt(<same fold>(b, b)))
  *
  * into the compiled [[CosineSim]] kernel. The fold re-enters the
  * interpreted lambda evaluator per element (~25µs per 64-dim pair); the
  * kernel is a single codegen-friendly pass (sub-µs) and ExprSpec proves
  * them bit-identical — including the null/ragged-input poisoning — so the
  * substitution is semantics-preserving, not approximate.
  *
  * This is the (c) extension-path demonstration from the build contract
  * one level up from functions: a `Rule[LogicalPlan]` injected through
  * `SparkSessionExtensions` (`GraftExtensions` calls
  * `injectOptimizerRule`), so users who write the naive composable form
  * get the kernel automatically. The match is deliberately conservative:
  * only the exact documented shape rewrites; anything else is left alone.
  */
object KernelSubstitution extends Rule[LogicalPlan] {

  /** The elementwise product lambda (x, y) -> x * y, tolerating the
    * to-double casts the FLOAT-vector form carries. */
  private def stripDoubleCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => stripDoubleCast(c.child)
    case other => other
  }

  private def isMulLambda(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      stripDoubleCast(body) match {
        case Multiply(l, r, _) =>
          val (sl, sr) = (stripDoubleCast(l), stripDoubleCast(r))
          (sl.fastEquals(x) && sr.fastEquals(y)) || (sl.fastEquals(y) && sr.fastEquals(x))
        case _ => false
      }
    case _ => false
  }

  private def isSumLambda(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      body match {
        case Add(l, r, _) =>
          (l.fastEquals(acc) && r.fastEquals(v)) || (l.fastEquals(v) && r.fastEquals(acc))
        case _ => false
      }
    case _ => false
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(acc: NamedLambdaVariable), _) => body.fastEquals(acc)
    case _ => false
  }

  private def isZeroLiteral(e: Expression): Boolean =
    e.foldable && e.dataType == DoubleType && e.eval() == 0.0d

  /** Matches the dot-product fold, returning its two vector arguments. */
  private def asDotFold(e: Expression): Option[(Expression, Expression)] = e match {
    case ArrayAggregate(ZipWith(a, b, mul), zero, merge, finish)
        if isMulLambda(mul) && isZeroLiteral(zero) &&
          isSumLambda(merge) && isIdentityFinish(finish) =>
      Some((a, b))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(num, Multiply(Sqrt(na), Sqrt(nb), _), _)
          if (for {
            (a, b) <- asDotFold(num)
            (a1, a2) <- asDotFold(na)
            (b1, b2) <- asDotFold(nb)
          } yield a1.semanticEquals(a) && a2.semanticEquals(a) &&
            b1.semanticEquals(b) && b2.semanticEquals(b)).getOrElse(false) =>
        val Some((a, b)) = asDotFold(num)
        CosineSim(a, b)
    }
}
