package graft.plans

import graft.functions.HofDotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: collapse the interpreted higher-order dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)
  *
  * into the whole-stage-codegen'd [[HofDotProduct]] native expression.
  *
  * Why a Rule and not just an API function: the declarative HOF spelling
  * is what users naturally write (and what [[graft.operators.Similarity]]
  * exposes as `dot`/`cosine`), but Catalyst evaluates higher-order
  * functions interpreted, one lambda invocation per element — measured
  * ~5× slower than the generated loop over a 4M-pair join. The rule keeps
  * the declarative surface AND the native hot path: plans get the fast
  * expression no matter which API spelled the dot product, the same way
  * Catalyst rewrites its own idioms. [[HofDotProduct]] replicates the HOF
  * semantics bit-for-bit (left-to-right IEEE fold; null on null input,
  * null element, or length mismatch — `zip_with` pads the shorter side),
  * so the substitution is observationally identical on every input.
  *
  * Registered through `SparkSessionExtensions` (injectOptimizerRule) in
  * [[graft.GraftSession]] — the engine's session always carries it.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  /** Matches `x * y` / `y * x` over exactly the two lambda variables. */
  private def isMul(f: Expression, xv: NamedLambdaVariable,
                    yv: NamedLambdaVariable): Boolean = f match {
    case Multiply(a: NamedLambdaVariable, b: NamedLambdaVariable, _) =>
      (a.exprId == xv.exprId && b.exprId == yv.exprId) ||
        (a.exprId == yv.exprId && b.exprId == xv.exprId)
    case _ => false
  }

  /** Matches `acc + v` / `v + acc` over exactly the two lambda variables. */
  private def isAdd(f: Expression, accv: NamedLambdaVariable,
                    elv: NamedLambdaVariable): Boolean = f match {
    case Add(a: NamedLambdaVariable, b: NamedLambdaVariable, _) =>
      (a.exprId == accv.exprId && b.exprId == elv.exprId) ||
        (a.exprId == elv.exprId && b.exprId == accv.exprId)
    case _ => false
  }

  private object DotIdiom {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(mul,
                Seq(xv: NamedLambdaVariable, yv: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(add,
              Seq(accv: NamedLambdaVariable, elv: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(finv: NamedLambdaVariable), _))
          if isMul(mul, xv, yv) && isAdd(add, accv, elv) &&
            fin.exprId == finv.exprId =>
        Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION)) {
      case DotIdiom(a, b) => HofDotProduct(a, b)
    }
}

/** Engine extensions, installed by [[graft.GraftSession]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    // whole-operator extension: per-key top-k (partial heaps before the
    // shuffle + rank-emitting final) — see graft.plans.TopKPerKeyNode
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}
