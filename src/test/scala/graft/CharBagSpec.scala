package graft

import org.apache.spark.sql.functions._

import graft.functions.CharBagExpressions.{bag_l1, char_bag}

/** The char_bag / bag_l1 kernels behind c22's similarity-join prefilter:
  * hand-computed signatures, the L1 ≤ 2·levenshtein soundness bound on
  * real corpus pairs, and interpreted-vs-codegen agreement. */
class CharBagSpec extends SparkSpec {
  import spark.implicits._

  private def sig(t: String): Array[Byte] =
    Seq(t).toDF("t").select(char_bag(spark, col("t"))).head().getAs[Array[Byte]](0)

  test("char_bag counts a-z and space, ignores everything else") {
    val s = sig("abba z!")
    assert(s.length == 27)
    assert((s(0) & 0xFF) == 2)  // a
    assert((s(1) & 0xFF) == 2)  // b
    assert((s(25) & 0xFF) == 1) // z
    assert((s(26) & 0xFF) == 1) // space ('!' uncounted)
    assert(s.map(_ & 0xFF).sum == 6)
  }

  test("bag_l1 is the exact L1 distance between signatures") {
    val d = Seq(("abc", "abd"), ("aaaa", "a"), ("x y", "x y"))
      .toDF("a", "b")
      .select(bag_l1(spark, char_bag(spark, col("a")),
        char_bag(spark, col("b"))).as("l1"))
      .as[Int].collect()
    assert(d.toSeq == Seq(2, 3, 0))
  }

  test("bag_l1 <= 2 * levenshtein on corpus prefix pairs (soundness)") {
    val p = Tables.documents(spark, sf0001)
      .select(col("doc_id"), expr("left(text, 80)").as("p"),
        char_bag(spark, expr("left(text, 80)")).as("sig"))
    val viol = p.alias("a").crossJoin(p.alias("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(
        bag_l1(spark, col("a.sig"), col("b.sig")).as("l1"),
        levenshtein(col("a.p"), col("b.p")).as("lev"))
      .where(col("l1") > col("lev") * 2)
      .count()
    assert(viol == 0, s"$viol pairs violate bag_l1 <= 2*lev")
  }

  test("interpreted eval matches codegen output") {
    import graft.functions.{BagL1Expr, CharBagExpr}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val texts = Tables.documents(spark, sf0001)
      .select(expr("left(text, 80)")).as[String].take(20)
    for (a <- texts.take(6); b <- texts.take(6)) {
      val ea = CharBagExpr(Literal(UTF8String.fromString(a)))
      val eb = CharBagExpr(Literal(UTF8String.fromString(b)))
      val interp = BagL1Expr(ea, eb).eval(null)
      val viaDf = Seq((a, b)).toDF("a", "b")
        .select(bag_l1(spark, char_bag(spark, col("a")),
          char_bag(spark, col("b")))).as[Int].head()
      assert(interp == viaDf, s"interp $interp != codegen $viaDf")
    }
  }
}
