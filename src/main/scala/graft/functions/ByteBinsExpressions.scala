package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Whole-histogram kernels for the multimodal byte-distribution features
  * (m03 nibble histogram, m07 bigram-bin signature) — the r12 VERDICT's
  * reclaim item 4: the udf→builtin rebuilds kept the no-JVM-udf doctrine
  * but paid for it with a per-byte `explode(sequence(...))` whose row
  * volume is the corpus BYTE count. These expressions compute the full
  * fixed-width histogram in ONE codegen pass over the payload bytes and
  * return it as `array<bigint>`, so the only exploded rows downstream are
  * the ≤64 (or ≤16) bins per asset — corpus-bytes × rows shuffled becomes
  * bins × assets. Same ladder rung as [[CharBagExpr]].
  *
  * Both kernels skip the fixture's 8-byte asset header (the m03/m07
  * contract) and bin EXACTLY the integers the previous builtin chains
  * computed — `conv(hex(substring(...)), 16, 10)` is the unsigned byte
  * (pair) value, so counts (and therefore every declared hash) are
  * unchanged.
  */

/** 64-bin body-bigram histogram: for each consecutive byte pair
  * (b₁, b₂) of the body (0-based offsets 8..len−2), bin =
  * ((b₁·256 + b₂) · 2654435761) ÷ 1024 mod 64 — Knuth's multiplicative
  * mix in exact long arithmetic (max product 65535·2654435761 ≪ 2⁶³),
  * identical to the SQL both the old plan and the DuckDB oracle use. */
case class BigramBinsExpr(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bigram_bins"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bigram_bins requires a binary argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val out = new Array[Long](64)
    var i = 8
    while (i + 1 < bytes.length) {
      val v = ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF)
      out(((v * 2654435761L / 1024L) % 64L).toInt) += 1L
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |final long[] $out = new long[64];
         |for (int $i = 8; $i + 1 < $c.length; $i++) {
         |  final long $v = (($c[$i] & 0xFF) << 8) | ($c[$i + 1] & 0xFF);
         |  $out[(int) (($v * 2654435761L / 1024L) % 64L)]++;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** 16-bin high-nibble histogram of the body bytes (0-based offsets
  * 8..len−1): bin = byte ÷ 16 — the m03 feature. */
case class NibbleBinsExpr(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nibble_bins"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nibble_bins requires a binary argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val out = new Array[Long](16)
    var i = 8
    while (i < bytes.length) {
      out((bytes(i) & 0xFF) >> 4) += 1L
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |final long[] $out = new long[16];
         |for (int $i = 8; $i < $c.length; $i++) {
         |  $out[($c[$i] & 0xFF) >> 4]++;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ByteBinsExpressions {
  def register(spark: SparkSession): Unit = {
    Registry.ensure(spark, "bigram_bins")(exprs => BigramBinsExpr(exprs(0)))
    Registry.ensure(spark, "nibble_bins")(exprs => NibbleBinsExpr(exprs(0)))
  }

  def bigram_bins(spark: SparkSession, b: Column): Column = {
    register(spark)
    call_function("bigram_bins", b)
  }

  def nibble_bins(spark: SparkSession, b: Column): Column = {
    register(spark)
    call_function("nibble_bins", b)
  }
}
