package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
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
    val plan = AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      attr(left, leftKey), attr(right, rightKey),
      attr(left, leftTime), attr(right, rightTime))
    classic.Dataset.ofRows(
      left.sparkSession.asInstanceOf[classic.SparkSession], plan)
  }
}
