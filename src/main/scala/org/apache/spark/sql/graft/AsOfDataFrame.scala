package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.TypeCoercion
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.classic

import graft.plans.AsOfJoinPlan

/** DataFrame entry point for the native as-of join
  * ([[graft.plans.AsOfJoinPlan]]).
  *
  * Lives under `org.apache.spark.sql` because turning a hand-built
  * LogicalPlan back into a DataFrame goes through the `private[sql]`
  * factory `classic.Dataset.ofRows` — the standard bridge used by Spark
  * extension libraries for operators that have no public constructor.
  * Only this thin adapter needs the access; all operator logic stays in
  * `graft.plans`.
  */
object AsOfDataFrame {

  /** Left as-of join: every row of `left` paired with the latest row of
    * `right` having the same key and time <= the left time (nulls if
    * none). Column-name based: both children are already-analyzed plans,
    * so the node is built resolved and skips re-analysis. The two inputs
    * must be distinct plans (as-of self-joins would need exprId dedup —
    * not required by any declared query). */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    graft.plans.Rules.install(left.sparkSession)
    // Resolve like Spark would (case-insensitive under the default
    // resolver) and refuse ambiguity instead of silently taking the
    // first of several same-named attributes.
    val resolver = left.sparkSession.sessionState.analyzer.resolver
    def attr(df: DataFrame, name: String) =
      df.queryExecution.analyzed.output.filter(a => resolver(a.name, name)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"asofJoin: no column '$name' in [${df.columns.mkString(", ")}]")
        case many => throw new IllegalArgumentException(
          s"asofJoin: ambiguous column '$name' matches " +
            s"[${many.map(_.name).mkString(", ")}]")
      }
    // Mirror what the analyzer does for built-in joins: sides whose
    // types differ but are coercible (date vs timestamp, int vs long)
    // are widened with explicit Casts; truly incompatible pairs fail
    // here with a named error instead of the plan's require.
    def widen(l: Expression, r: Expression, what: String): (Expression, Expression) =
      if (l.dataType.sameType(r.dataType)) (l, r)
      else TypeCoercion.findWiderTypeForTwo(l.dataType, r.dataType) match {
        case Some(t) =>
          (if (l.dataType.sameType(t)) l else Cast(l, t),
            if (r.dataType.sameType(t)) r else Cast(r, t))
        case None => throw new IllegalArgumentException(
          s"asofJoin: incompatible $what types " +
            s"(${l.dataType.catalogString} vs ${r.dataType.catalogString})")
      }
    val (lk, rk) = widen(attr(left, leftKey), attr(right, rightKey), "key")
    val (lt, rt) = widen(attr(left, leftTime), attr(right, rightTime), "time")
    val plan = AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      lk, rk, lt, rt)
    classic.Dataset.ofRows(
      left.sparkSession.asInstanceOf[classic.SparkSession], plan)
  }
}
