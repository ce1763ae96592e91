package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression,
  LambdaFunction, Literal, Multiply, NamedLambdaVariable, XxHash64}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

/** Optimizer rule: recognize the DECLARATIVE rolling-hash idiom
  *
  * {{{ aggregate(toks, 0L, (acc, t) => acc * 1000003L + xxhash64(t)) }}}
  *
  * and substitute the fused native kernel [[RollingHash64]] — proven
  * bit-identical in TextAnalysisSpec (including the null-token = seed
  * convention). `ArrayAggregate` is CodegenFallback: the declarative form
  * pays interpreted per-element lambda dispatch inside an otherwise
  * codegen'd stage, while the kernel is one generated loop. With the rule
  * injected, pipelines can stay fully declarative (the idiom reads as
  * documentation and runs on any stock Spark) and still execute the fused
  * kernel whenever this engine's extensions are installed — the manual
  * `rollingHashFromTokens(spark, toks)` dispatch made automatic, and the
  * engine's one demonstration of `injectOptimizerRule` carrying real
  * semantics (SURVEY §4's "no operator outgrew the DataFrame vocabulary"
  * still holds — this rewrites an EXPRESSION, not an operator).
  *
  * Deliberately conservative: the zero, base, hash seed, lambda-variable
  * wiring, identity finish, and `array<string>` input must all match
  * exactly — any other fold (the portable md5 family, a different base)
  * is left untouched. Excludable by name for A/B measurement via
  * `spark.sql.optimizer.excludedRules`.
  */
object NativeKernelSubstitution extends Rule[LogicalPlan] {

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(arg, Literal(0L, LongType),
        LambdaFunction(
          Add(Multiply(acc: NamedLambdaVariable, Literal(1000003L, LongType), _),
            XxHash64(Seq(tok: NamedLambdaVariable), 42L), _),
          Seq(accArg: NamedLambdaVariable, tokArg: NamedLambdaVariable), _),
        finish)
      if acc.exprId == accArg.exprId && tok.exprId == tokArg.exprId &&
        isIdentityFinish(finish) &&
        (arg.dataType match {
          case ArrayType(StringType, _) => true
          case _ => false
        }) =>
      RollingHash64(arg)
  }
}
