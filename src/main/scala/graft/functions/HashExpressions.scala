package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unseeded FNV-1a over a string's UTF-8 bytes → signed 64-bit hash.
  *
  * This is the deterministic row-assignment primitive behind the sampling
  * / split operators (ops.Sampling): split and sample membership must be
  * (a) reproducible across runs, engines, and cluster layouts — no
  * `rand()`, no partition-dependent state — and (b) cheap enough to run
  * as a map-side projection over every row of a 100 TB corpus. A native
  * Catalyst expression (vs the UDF tier in [[TextHash]]) keeps the byte
  * loop inside whole-stage codegen: no boxing, no String materialization
  * beyond the UTF8String already in the row.
  *
  * Same constants as [[TextHash]] (seed 0), and reproduced in DuckDB
  * HUGEINT mod-2^64 arithmetic (`TextOps.fnvFold`) so every consumer
  * query carries an exact oracle.
  */
case class Fnv1a64Expr(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fnv1a64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fnv1a64 requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |final byte[] $b = $c.getBytes();
         |long $h = 0xcbf29ce484222325L;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $h ^= ($b[$i] & 0xffL);
         |  $h *= 0x100000001b3L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MurmurHash3's 64-bit finalizer (xor-shift / multiply avalanche) over a
  * signed BIGINT. FNV-1a alone is measurably non-uniform on short keys
  * (128-minimum-values over the hashes of "1".."2000" lands 2× off the
  * uniform expectation), which biases any order-statistic sketch; this
  * finalizer restores full avalanche so the KMV estimator (b09b) meets
  * its 1/√k error bound. Reproduced in DuckDB HUGEINT mod-2^64 arithmetic
  * (`Relational.mixFold`) with split-constant multiplication, so the
  * consumer queries stay exactly oracle-checkable.
  */
case class Mix64Expr(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mix64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mix64 requires a bigint argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    var h = input.asInstanceOf[Long]
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
    h ^= (h >>> 33); h *= 0xc4ceb9fe1a85ec53L
    h ^= (h >>> 33)
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val h = ctx.freshName("h")
      s"""
         |long $h = $c;
         |$h ^= ($h >>> 33); $h *= 0xff51afd7ed558ccdL;
         |$h ^= ($h >>> 33); $h *= 0xc4ceb9fe1a85ec53L;
         |$h ^= ($h >>> 33);
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExpressions {
  /** Register the SQL names (idempotent; safe to call per-query). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Registry.ensure(spark, "fnv1a64")(exprs => Fnv1a64Expr(exprs(0)))
    Registry.ensure(spark, "mix64")(exprs => Mix64Expr(exprs(0)))
  }

  def fnv1a64(spark: org.apache.spark.sql.SparkSession, s: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("fnv1a64", s)
  }

  def mix64(spark: org.apache.spark.sql.SparkSession, h: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("mix64", h)
  }
}
