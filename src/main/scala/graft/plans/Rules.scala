package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.{CosineDistanceExpr, EuclideanDistanceExpr}

/** Custom Catalyst optimizer rules (SURVEY.md §2.F tier c — the
  * Rule[LogicalPlan] slot). Registered at runtime through
  * `spark.experimental.extraOptimizations`, so the driver-owned session
  * builders need no extension wiring.
  *
  * SelfDistanceElimination: d(x, x) = 0 for both kernels — a genuine
  * algebraic rewrite the built-in optimizer cannot know about. In a
  * leave-one-out KNN formulated WITHOUT the `qid =!= cid` filter, this
  * folds the diagonal of the pair matrix to a constant and lets
  * ConstantFolding cascade from there.
  */
object SelfDistanceElimination extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineDistanceExpr(a, b) if a.semanticEquals(b) && a.deterministic =>
        Literal(0.0, DoubleType)
      case EuclideanDistanceExpr(a, b) if a.semanticEquals(b) && a.deterministic =>
        Literal(0.0, DoubleType)
    }
}

object Rules {
  /** Idempotently install the graft optimizer rules and planner
    * strategies on a session (the runtime twin of GraftExtensions, for
    * sessions the caller does not construct — Verify/Bench). */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.contains(SelfDistanceElimination)) {
      spark.experimental.extraOptimizations = existing :+ SelfDistanceElimination
    }
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies = strategies :+ AsOfJoinStrategy
    }
  }
}
