package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator extension slot (SURVEY.md §2.F
  * tier c: custom LogicalPlan + SparkStrategy + SparkPlan, registered via
  * [[graft.GraftExtensions]] or `experimental.extraStrategies`).
  *
  * Semantics: left as-of join. Every left row (k, t) is paired with the
  * LATEST right row of the same key whose time is <= t, or nulls if none
  * exists — the standard temporal/merge_asof join. Among right rows tied
  * on (key, time) the one last in sort order wins (project only the time
  * column when ties are possible and the result is deterministic).
  * NULL keys and NULL times never match (join-standard null semantics).
  *
  * Why a physical operator: the composed forms (d06's range join + max
  * aggregate, d06b's union + last-over-window) re-shape the data to fit
  * existing operators. The native plan is the one a temporal-join engine
  * actually runs: hash-partition both sides by key, sort each partition
  * by (key, time), then ONE streaming merge pass — O(n+m) per partition,
  * zero candidate expansion, constant memory (a single buffered right
  * row). At 100 TB this is the only shape whose cost does not depend on
  * how many right rows precede each left row.
  *
  * The heavy lifting is deliberately delegated to Catalyst/exchange
  * machinery: `requiredChildDistribution` (ClusteredDistribution per
  * side, exactly like SortMergeJoin) makes EnsureRequirements insert the
  * co-partitioning shuffles, and `requiredChildOrdering` makes it insert
  * the per-partition sorts — the operator itself is just the merge loop.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  // The merge loop compares raw internal values (days-int vs micros-long
  // would silently "work"), so mismatched sides must fail at plan
  // construction, not return garbage. AsOfDataFrame widens coercible
  // sides with explicit Casts before building this node; sameType (not
  // ==) so nested types differing only in nullability/field-name case —
  // which one physical ordering can legally compare — are accepted.
  require(org.apache.spark.sql.types.DataType.equalsStructurally(
      leftKey.dataType, rightKey.dataType, ignoreNullability = true),
    s"asof join: key types differ (${leftKey.dataType} vs ${rightKey.dataType})")
  require(org.apache.spark.sql.types.DataType.equalsStructurally(
      leftTime.dataType, rightTime.dataType, ignoreNullability = true),
    s"asof join: time types differ (${leftTime.dataType} vs ${rightTime.dataType})")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; everything else falls
  * through to the built-in strategies. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(j.leftKey, j.rightKey, j.leftTime, j.rightTime,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Same contract as SortMergeJoin: each side clustered by its key, so
    * EnsureRequirements co-partitions them (equal key values land in the
    * same partition index on both sides). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  /** (key asc, time asc) within every partition — the merge invariant. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending) :: SortOrder(leftTime, Ascending) :: Nil,
      SortOrder(rightKey, Ascending) :: SortOrder(rightTime, Ascending) :: Nil)

  /** Left rows stream out in input order (key, time) untouched. */
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(leftKey), left.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rKeyProj = UnsafeProjection.create(Seq(rightKey), right.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      // natural ascending = nulls first, matching the Ascending sort above
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullRight = new GenericInternalRow(right.output.length)
      val resultProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow

      // one buffered right row + the latest match — constant state
      var rRow: InternalRow = null
      var rKey: InternalRow = null
      var rTime: InternalRow = null
      def advance(): Unit =
        if (rIter.hasNext) {
          rRow = rIter.next()
          // projections reuse their buffer; keep copies for comparisons
          rKey = rKeyProj(rRow).copy()
          rTime = rTimeProj(rRow).copy()
        } else rRow = null
      advance()
      var lastMatch: InternalRow = null
      var lastMatchKey: InternalRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow).copy()
        val lTime = lTimeProj(lRow).copy()
        if (lKey.isNullAt(0) || lTime.isNullAt(0)) {
          resultProj(joined(lRow, nullRight))
        } else {
          var done = false
          while (!done && rRow != null) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) advance() // behind every remaining left key: drop
            else if (c > 0) done = true // future key: keep buffered
            else if (rTime.isNullAt(0)) advance() // null time never matches
            else if (timeOrd.compare(rTime, lTime) <= 0) {
              lastMatch = rRow.copy(); lastMatchKey = rKey
              advance()
            } else done = true // future time: keep for later left rows
          }
          val m =
            if (lastMatch != null && keyOrd.compare(lastMatchKey, lKey) == 0)
              lastMatch
            else nullRight
          resultProj(joined(lRow, m))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
