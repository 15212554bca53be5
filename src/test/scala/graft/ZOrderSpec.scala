package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder2Expr

/** The Morton interleave kernel (b41) and its layout query. */
class ZOrderSpec extends SparkSpec {

  /** Bit-by-bit reference: z bit 2i = x bit i, z bit 2i+1 = y bit i. */
  private def slowInterleave(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("interleave matches the bit-by-bit reference on edge + random keys") {
    val edges = Seq(0L, 1L, 2L, 3L, 0x7fffffffL, 0x55555555L, 0x2aaaaaaaL)
    val rnd = new scala.util.Random(42)
    val keys = edges ++ Seq.fill(200)(rnd.nextLong().abs & 0x7fffffffL)
    for (x <- keys; y <- keys.take(7))
      assert(ZOrder2Expr.interleave(x, y) === slowInterleave(x, y),
        s"x=$x y=$y")
  }

  test("interleave of 31-bit inputs is always non-negative and monotone-safe") {
    // the layout contract: codes fit 62 bits, so bucket arithmetic never
    // sees a sign; and each dimension alone is order-embedded (x1<x2 with
    // y fixed => z1<z2 — the property range-bucketing relies on)
    val vals = Seq(0L, 1L, 5L, 100L, 65535L, 0x7fffffffL)
    for (x <- vals; y <- vals) {
      val z = ZOrder2Expr.interleave(x, y)
      assert(z >= 0L)
      for (x2 <- vals if x2 > x)
        assert(ZOrder2Expr.interleave(x2, y) > z)
    }
  }

  test("codegen expression agrees with the interpreted path") {
    import spark.implicits._
    val df = Seq((3L, 5L), (0L, 0L), (123456L, 654321L),
      (0x7fffffffL, 0x7fffffffL)).toDF("x", "y")
      .withColumn("z", ZOrder2Expr.zorder2(spark, col("x"), col("y")))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getLong(2) === ZOrder2Expr.interleave(r.getLong(0), r.getLong(1)))
    }
  }

  test("interleave3 matches the bit-by-bit reference on edge + random keys") {
    import graft.functions.ZOrder3Expr
    def slow3(x: Long, y: Long, z: Long): Long = {
      var c = 0L
      for (i <- 0 until 21) {
        c |= ((x >> i) & 1L) << (3 * i)
        c |= ((y >> i) & 1L) << (3 * i + 1)
        c |= ((z >> i) & 1L) << (3 * i + 2)
      }
      c
    }
    val edges = Seq(0L, 1L, 2L, 3L, 0x1fffffL, 0x155555L, 0x0aaaaaL)
    val rnd = new scala.util.Random(7)
    val keys = edges ++ Seq.fill(40)(rnd.nextLong().abs & 0x1fffffL)
    for (x <- keys; y <- keys.take(5); z <- keys.take(5)) {
      val c = ZOrder3Expr.interleave3(x, y, z)
      assert(c === slow3(x, y, z), s"x=$x y=$y z=$z")
      assert(c >= 0L)
    }
  }

  test("zorder3 codegen expression agrees with the interpreted path") {
    import spark.implicits._
    import graft.functions.ZOrder3Expr
    val df = Seq((3L, 5L, 7L), (0L, 0L, 0L), (123456L, 654321L, 99999L),
      (0x1fffffL, 0x1fffffL, 0x1fffffL)).toDF("x", "y", "z")
      .withColumn("c",
        ZOrder3Expr.zorder3(spark, col("x"), col("y"), col("z")))
    df.collect().foreach { r =>
      assert(r.getLong(3) ===
        ZOrder3Expr.interleave3(r.getLong(0), r.getLong(1), r.getLong(2)))
    }
  }

  test("b43: z-buckets bound all THREE dimensions tighter than a 1-D sort") {
    val out = ops.Relational.zorder3Layout(spark, sf0001).collect()
    assert(out.nonEmpty)
    def full(minC: String, maxC: String): Long =
      out.map(_.getAs[Long](maxC)).max - out.map(_.getAs[Long](minC)).min + 1
    val (pkAll, skAll, okAll) =
      (full("min_pk", "max_pk"), full("min_sk", "max_sk"),
        full("min_ok", "max_ok"))
    // most buckets must be genuine 3-D boxes: simultaneously below half
    // the full range in every dimension (any 1-D sorted layout leaves
    // two of the three spans ≈ the full range in every file)
    val tight = out.count { r =>
      r.getAs[Long]("pk_span") * 2 <= pkAll &&
        r.getAs[Long]("sk_span") * 2 <= skAll &&
        r.getAs[Long]("ok_span") * 2 <= okAll
    }
    assert(tight * 10 >= out.length * 5,
      s"only $tight/${out.length} buckets are tight in all three dims")
  }

  test("b41: z-buckets bound both dimensions tighter than a 1-D sort does") {
    val out = ops.Relational.zorderLayout(spark, sf0001).collect()
    assert(out.nonEmpty)
    val pkAll = out.map(_.getAs[Long]("max_pk")).max -
      out.map(_.getAs[Long]("min_pk")).min + 1
    val skAll = out.map(_.getAs[Long]("max_sk")).max -
      out.map(_.getAs[Long]("min_sk")).min + 1
    // every bucket must be a genuine box: strictly smaller than the full
    // key range in BOTH dimensions simultaneously for most buckets (a
    // partkey-sorted layout leaves sk_span ≈ skAll in every file)
    val tight = out.count { r =>
      r.getAs[Long]("pk_span") * 2 <= pkAll && r.getAs[Long]("sk_span") * 2 <= skAll
    }
    assert(tight * 10 >= out.length * 5,
      s"only $tight/${out.length} buckets are tight in both dims")
  }
}
