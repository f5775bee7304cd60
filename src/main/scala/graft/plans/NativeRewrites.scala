package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, LambdaFunction, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{Md5Hash32, Md5Hash32Array}

/** Optimizer rule: collapse the declarative per-element hash map
  * `transform(arr, t -> md5_hash32(t))` into the fused native
  * [[Md5Hash32Array]].
  *
  * Why a Rule and not just a Column helper: the helper
  * (`HashExpressions.md5_hash32_array`) only covers call sites that know
  * about it. SQL users (and composed Column code) naturally write the
  * `transform` form — which routes through `ArrayTransform`, a
  * CodegenFallback that interprets the lambda per element and drops the
  * enclosing projection out of whole-stage codegen. This rule rewrites the
  * pattern after analysis, so EVERY spelling gets the one-pass primitive
  * loop. Registered through [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`).
  *
  * The rewrite is semantics-preserving by construction: both forms map
  * null elements to null, a null array to null, and evaluate md5 over the
  * UTF-8 bytes of each element (equality proved in PlanAuditSpec /
  * VectorExpressionsSpec). It fires only when the lambda body is EXACTLY
  * the hash of the lambda's own variable — any other body is left alone.
  */
object NativeHashRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayTransform(input,
        LambdaFunction(Md5Hash32(v: NamedLambdaVariable), Seq(arg: NamedLambdaVariable), _))
        if v.exprId == arg.exprId =>
      Md5Hash32Array(input)
  }
}
