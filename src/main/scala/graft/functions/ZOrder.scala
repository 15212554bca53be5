package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two non-negative dimension keys — the
  * multi-dimensional DATA-LAYOUT primitive (SURVEY §2.B, b41). Sorting or
  * range-partitioning a 100 TB table by one column gives tight min/max
  * file statistics on that column only; sorting by the Morton code of two
  * columns gives every file a small bounding BOX in both dimensions, so a
  * scan filtered on EITHER column (or both) can skip most files from
  * footer stats alone — the layout trick behind Delta/Iceberg Z-ORDER
  * clustering, expressed here as a plain deterministic expression the
  * writer can `repartitionByRange(zorder2(x, y))` on.
  *
  * Each input is masked to its low 31 bits (keys are non-negative ids;
  * 31+31 interleaved bits fill 62 bits, so the result is always a
  * non-negative BIGINT — no sign traps in either engine). Bit-spreading
  * uses the classic 5-step mask-shift ladder (no loop, no branch), kept
  * inside whole-stage codegen as a native Catalyst expression.
  *
  * The DuckDB twin ([[graft.ops.Relational.zorderSql]]) reproduces the
  * interleave as a generated 62-term shift/or sum in BIGINT — bit-exact,
  * so b41 is hash-oracled like every other declared query.
  */
case class ZOrder2Expr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zorder2"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 requires two bigint arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrder2Expr.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.ZOrder2Expr.interleave($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder2Expr {
  /** Spread the low 31 bits of v to the even bit positions of a long:
    * bit i → bit 2i. The standard mask-shift ladder (each step doubles
    * the gap between occupied bit groups). */
  def spread(v0: Long): Long = {
    var v = v0 & 0x7fffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** z = x's bits on even positions, y's bits on odd positions. */
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  def zorder2(spark: org.apache.spark.sql.SparkSession,
      x: Column, y: Column): Column = {
    Registry.ensure(spark, "zorder2")(exprs => ZOrder2Expr(exprs(0), exprs(1)))
    org.apache.spark.sql.functions.call_function("zorder2", x, y)
  }
}

/** Three-dimensional Morton interleave (SURVEY §2.B, b43) — the same
  * data-layout primitive as [[ZOrder2Expr]] one dimension up: sorting by
  * this code gives every file a bounding BOX in THREE columns at once,
  * so scans filtered on any of the three prune from footer stats. Each
  * input is masked to its low 21 bits (21·3 = 63 interleaved bits — the
  * result stays a non-negative BIGINT); bit i of x/y/z lands on bit
  * 3i / 3i+1 / 3i+2. The spread uses the classic 5-step Morton-3 mask
  * ladder (no loop, no branch), inside whole-stage codegen. The DuckDB
  * twin is a generated 63-term shift/or chain
  * ([[graft.ops.Relational.zorder3InterleaveSql]]) — bit-exact. */
case class ZOrder3Expr(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zorder3"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder3 requires three bigint arguments, got " +
        children.map(_.dataType.catalogString).mkString(", "))

  override def nullSafeEval(x: Any, y: Any, z: Any): Any =
    ZOrder3Expr.interleave3(x.asInstanceOf[Long], y.asInstanceOf[Long],
      z.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, z) =>
      s"graft.functions.ZOrder3Expr.interleave3($x, $y, $z)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ZOrder3Expr {
  /** Spread the low 21 bits of v so bit i lands on bit 3i — the Morton-3
    * mask-shift ladder. */
  def spread3(v0: Long): Long = {
    var v = v0 & 0x1fffffL
    v = (v | (v << 32)) & 0x001f00000000ffffL
    v = (v | (v << 16)) & 0x001f0000ff0000ffL
    v = (v | (v << 8)) & 0x100f00f00f00f00fL
    v = (v | (v << 4)) & 0x10c30c30c30c30c3L
    v = (v | (v << 2)) & 0x1249249249249249L
    v
  }

  /** code = x on bits 3i, y on bits 3i+1, z on bits 3i+2. */
  def interleave3(x: Long, y: Long, z: Long): Long =
    spread3(x) | (spread3(y) << 1) | (spread3(z) << 2)

  def zorder3(spark: org.apache.spark.sql.SparkSession,
      x: Column, y: Column, z: Column): Column = {
    Registry.ensure(spark, "zorder3")(exprs =>
      ZOrder3Expr(exprs(0), exprs(1), exprs(2)))
    org.apache.spark.sql.functions.call_function("zorder3", x, y, z)
  }
}
