package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bag-of-characters signature kernels for the fuzzy near-dup prefilter
  * (SURVEY.md §2.F tier 3, same ladder rung as VectorExpressions).
  *
  * `char_bag(str)` packs the counts of 'a'-'z' and ' ' into a 27-byte
  * binary (each count saturating at 255); `bag_l1(sig, sig)` is the L1
  * distance between two signatures in one tight generated loop. The
  * point of the packed form is the JOIN: the similarity-join inner loop
  * enumerates millions of candidate pairs, and a 27-byte binary keeps
  * the streamed row narrow where 27 int columns (or an interpreted
  * zip_with over arrays) made row copying the dominant cost. Every edit
  * operation changes at most two bag counts by one, so
  * bag_l1 ≤ 2 · levenshtein — a sound prefilter bound (saturation only
  * weakens it: both sides clamp, and prefixes here are ≤ 80 chars).
  */
case class CharBagExpr(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_bag"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_bag requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val out = new Array[Byte](27)
    var i = 0
    val n = s.numBytes()
    while (i < n) {
      val b = s.getByte(i)
      val idx = if (b >= 'a' && b <= 'z') b - 'a' else if (b == ' ') 26 else -1
      if (idx >= 0 && (out(idx) & 0xFF) < 255) out(idx) = (out(idx) + 1).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val idx = ctx.freshName("idx")
      val out = ctx.freshName("out")
      s"""
         |final byte[] $out = new byte[27];
         |final int $n = $c.numBytes();
         |for (int $i = 0; $i < $n; $i++) {
         |  final byte $b = $c.getByte($i);
         |  final int $idx = ($b >= 'a' && $b <= 'z') ? $b - 'a'
         |    : ($b == ' ' ? 26 : -1);
         |  if ($idx >= 0 && ($out[$idx] & 0xFF) < 255) $out[$idx]++;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Σ |a_i − b_i| over two char_bag signatures (unsigned bytes). */
case class BagL1Expr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bag_l1"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bag_l1 requires two binary arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) throw new IllegalArgumentException(
      s"bag_l1: signature length mismatch (${x.length} vs ${y.length})")
    var s = 0
    var i = 0
    while (i < x.length) {
      s += math.abs((x(i) & 0xFF) - (y(i) & 0xFF))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.length != $b.length) throw new IllegalArgumentException(
         |  "bag_l1: signature length mismatch (" + $a.length + " vs " + $b.length + ")");
         |int $s = 0;
         |for (int $i = 0; $i < $a.length; $i++) {
         |  $s += Math.abs(($a[$i] & 0xFF) - ($b[$i] & 0xFF));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

object CharBagExpressions {
  def register(spark: SparkSession): Unit = {
    Registry.ensure(spark, "char_bag")(exprs => CharBagExpr(exprs(0)))
    Registry.ensure(spark, "bag_l1")(exprs => BagL1Expr(exprs(0), exprs(1)))
  }

  def char_bag(spark: SparkSession, s: Column): Column = {
    register(spark)
    call_function("char_bag", s)
  }

  def bag_l1(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("bag_l1", a, b)
  }
}
