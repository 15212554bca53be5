package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library entry point for session wiring: registers the graft SQL
  * functions and optimizer rules at session build time.
  *
  * Usage (either form):
  *   SparkSession.builder().withExtensions(new GraftExtensions).…
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * The per-call registration paths (VectorExpressions.register,
  * TopKAgg.register, plans.Rules.install) remain for sessions the caller
  * does not construct — e.g. the driver-owned Verify/Bench harness.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_distance"),
      info("cosine_distance", "cosine_distance(a, b) - 1 - cos(a, b) over two float arrays"),
      (exprs: Seq[Expression]) =>
        functions.CosineDistanceExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("euclidean_distance"),
      info("euclidean_distance", "euclidean_distance(a, b) - L2 distance over two float arrays"),
      (exprs: Seq[Expression]) =>
        functions.EuclideanDistanceExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("top_k_by"),
      info("top_k_by", "top_k_by(dist, id, label, k) - bounded-heap smallest-k aggregate"),
      (exprs: Seq[Expression]) => {
        // explicit boxed-integer matches: NULL / non-integer literals get
        // the helpful error, not an NPE (mirrors TopKAgg.register)
        val k = exprs(3) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: java.lang.Integer, _) =>
            v.intValue
          case org.apache.spark.sql.catalyst.expressions.Literal(v: java.lang.Long, _) =>
            java.lang.Math.toIntExact(v.longValue)
          case other => throw new IllegalArgumentException(
            s"top_k_by k must be an integer literal, got $other")
        }
        functions.TopKByAggregate(exprs(0), exprs(1), exprs(2), k)
          .toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("fnv1a64"),
      info("fnv1a64", "fnv1a64(s) - unseeded FNV-1a of the UTF-8 bytes of s, as signed int64"),
      (exprs: Seq[Expression]) => functions.Fnv1a64Expr(exprs(0))))
    ext.injectOptimizerRule(_ => plans.SelfDistanceElimination)
    ext.injectPlannerStrategy(_ => plans.AsOfJoinStrategy)
  }
}
