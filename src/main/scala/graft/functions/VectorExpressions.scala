package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector-distance kernels — the
  * "CUDA kernel slot" (SURVEY.md §2.F tier 3). Unlike the Scala UDFs in
  * [[Distances]], these participate in whole-stage codegen: the generated
  * Java reads floats straight out of Tungsten `ArrayData` with no
  * boxing, no Seq conversion, and no serialization barrier, and the loop
  * sits inside the same generated function as the join that produces the
  * pair. Same arithmetic (sequential double accumulation) as the UDFs,
  * so oracle parity is unchanged.
  */
abstract class FloatVectorBinaryExpression extends BinaryExpression
    with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got (${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
}

/** 1 - dot(a,b) / (|a|·|b|), accumulated in doubles in array order. */
case class CosineDistanceExpr(left: Expression, right: Expression)
    extends FloatVectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) throw new IllegalArgumentException(
      s"cosine_distance: dimension mismatch ($n vs ${y.numElements()})")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) throw new IllegalArgumentException(
         |  "cosine_distance: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xv = (double) $a.getFloat($i);
         |  final double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = 1.0 - $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** sqrt(Σ (a_i - b_i)²), accumulated in doubles in array order. */
case class EuclideanDistanceExpr(left: Expression, right: Expression)
    extends FloatVectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) throw new IllegalArgumentException(
      s"euclidean_distance: dimension mismatch ($n vs ${y.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val dv = ctx.freshName("dv")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) throw new IllegalArgumentException(
         |  "euclidean_distance: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $dv = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $s += $dv * $dv;
         |}
         |${ev.value} = Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** Σ (a_i − b_i)² over two array<bigint> code vectors, accumulated in
  * BIGINT — the symmetric-distance kernel of the SQ8 scalar-quantization
  * tier (ops.Ann). Codes are bounded (0..255 per dimension), so the sum
  * is exact integer arithmetic with no overflow anywhere near 2⁶³, and
  * bit-reproducible on any engine by construction — no float ops at all
  * in the scan hot path. */
case class SquaredDiffLongExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  import org.apache.spark.sql.types.LongType
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq_dist_long"
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got (${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) throw new IllegalArgumentException(
      s"sq_dist_long: dimension mismatch ($n vs ${y.numElements()})")
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val dv = ctx.freshName("dv")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) throw new IllegalArgumentException(
         |  "sq_dist_long: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $dv = $a.getLong($i) - $b.getLong($i);
         |  $s += $dv * $dv;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

object VectorExpressions {
  /** Register SQL names so the expressions are callable from any session
    * (idempotent; safe to call per-query). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Registry.ensure(spark, "cosine_distance")(
      exprs => CosineDistanceExpr(exprs(0), exprs(1)))
    Registry.ensure(spark, "euclidean_distance")(
      exprs => EuclideanDistanceExpr(exprs(0), exprs(1)))
    Registry.ensure(spark, "sq_dist_long")(
      exprs => SquaredDiffLongExpr(exprs(0), exprs(1)))
  }

  def cosine_distance(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("cosine_distance", a, b)
  }

  def euclidean_distance(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("euclidean_distance", a, b)
  }

  def sq_dist_long(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("sq_dist_long", a, b)
  }
}
