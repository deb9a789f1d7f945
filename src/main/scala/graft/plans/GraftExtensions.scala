package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{DotProductExpr, MahalanobisExpr, MinhashSignatureExpr, SqDistExpr, WordShinglesExpr}

/** Catalyst integration for the engine's native kernels:
  *
  *  1. [[NativeKernelRewrite]] — an optimizer `Rule[LogicalPlan]` that
  *     recognizes the declarative higher-order-function shapes
  *     `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, +)` (dot product)
  *     and `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0, +)`
  *     (squared Euclidean) and rewrites them to the zero-allocation
  *     codegen kernels. Users keep writing the idiomatic declarative
  *     form; the optimizer picks the fast physical expression.
  *  2. SQL surface — `dot_native` / `sqdist_native` /
  *     `mahalanobis_native` registered for `spark.sql(...)` users.
  *
  * Wire at build time via `.withExtensions(new GraftExtensions)` or onto
  * a live session with `GraftExtensions.install(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => NativeKernelRewrite)
    GraftExtensions.functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
  }
}

object GraftExtensions {
  private[plans] val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_native" -> (es => DotProductExpr(es(0), es(1))),
    "sqdist_native" -> (es => SqDistExpr(es(0), es(1))),
    "mahalanobis_native" -> (es => MahalanobisExpr(es(0), es(1), es(2))),
    "word_shingles_native" -> (es => WordShinglesExpr(es(0))),
    "minhash_signature_native" -> (es => MinhashSignatureExpr(es(0))))

  /** Install onto an already-running session (extensions are otherwise
    * builder-time only).
    */
  def install(spark: SparkSession): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ NativeKernelRewrite
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}

/** Rewrites HOF dot/sqdist folds into the codegen kernels. Conservative:
  * only fires on the exact shape (fold from literal 0.0 by addition,
  * identity finish, two-argument multiply/squared-difference zip).
  */
object NativeKernelRewrite extends Rule[LogicalPlan] {

  private object IdentityLambda {
    def unapply(f: LambdaFunction): Boolean = f.function match {
      case v: NamedLambdaVariable => f.arguments.lastOption.contains(v)
      case _ => false
    }
  }

  private object AddFold {
    def unapply(f: LambdaFunction): Boolean = (f.function, f.arguments) match {
      case (Add(a: NamedLambdaVariable, b: NamedLambdaVariable, _),
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable)) =>
        (a.exprId == x.exprId && b.exprId == y.exprId) ||
          (a.exprId == y.exprId && b.exprId == x.exprId)
      case _ => false
    }
  }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0, org.apache.spark.sql.types.DoubleType) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              zl @ LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), _, _)),
            zero, mf @ AddFold(), IdentityLambda())
          if isZero(zero) && lambdaArgsAre(zl, x, y) =>
        DotProductExpr(a, b)
      case ArrayAggregate(
            ZipWith(a, b,
              zl @ LambdaFunction(
                Multiply(
                  Subtract(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
                  Subtract(x2: NamedLambdaVariable, y2: NamedLambdaVariable, _), _), _, _)),
            zero, mf @ AddFold(), IdentityLambda())
          if isZero(zero) && x1.exprId == x2.exprId && y1.exprId == y2.exprId &&
            lambdaArgsAre(zl, x1, y1) =>
        SqDistExpr(a, b)
    }

  private def lambdaArgsAre(l: LambdaFunction,
                            u: NamedLambdaVariable, v: NamedLambdaVariable): Boolean =
    l.arguments.map {
      case n: NamedLambdaVariable => n.exprId
      case other => return false
    }.toSet == Set(u.exprId, v.exprId)
}
