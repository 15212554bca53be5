package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashExpressions, KmvAgg}

/** KMV distinct-count sketch (functions.KmvAgg + the b09b query):
  * estimator accuracy, duplicate/partitioning insensitivity, and the
  * under-filled-group NULL contract. */
class KmvAggSpec extends SparkSpec {
  import spark.implicits._

  private val K = 128

  private def estimateOf(n: Int, parts: Int): (Long, Double) = {
    val df = spark.range(0, n).repartition(parts)
      .select(HashExpressions.mix64(spark, HashExpressions.fnv1a64(spark, $"id".cast("string"))).as("h"))
      .agg(KmvAgg.kmv_kth(spark, $"h", K).as("f"))
      .select($"f",
        lit((K - 1).toDouble) /
          ($"f".cast("double") * lit(math.pow(2, -64)) + lit(0.5)))
    val row = df.collect().head
    (row.getLong(0), row.getDouble(1))
  }

  test("estimate is within 20% of the true distinct count (k=128, n=5000)") {
    val (_, est) = estimateOf(5000, 4)
    assert(math.abs(est - 5000) / 5000.0 < 0.20, s"est=$est")
  }

  test("result is independent of partitioning (merge associativity)") {
    assert(estimateOf(3000, 1) === estimateOf(3000, 13))
  }

  test("duplicate rows do not occupy sketch slots") {
    val base = spark.range(0, 500)
    val dupes = base.union(base).union(base).repartition(7)
      .select(HashExpressions.mix64(spark, HashExpressions.fnv1a64(spark, $"id".cast("string"))).as("h"))
      .agg(KmvAgg.kmv_kth(spark, $"h", K).as("f"))
      .collect().head.getLong(0)
    val once = base
      .select(HashExpressions.mix64(spark, HashExpressions.fnv1a64(spark, $"id".cast("string"))).as("h"))
      .agg(KmvAgg.kmv_kth(spark, $"h", K).as("f"))
      .collect().head.getLong(0)
    assert(dupes === once)
  }

  test("groups with fewer than k distinct hashes evaluate to NULL") {
    val row = spark.range(0, K - 1)
      .select(HashExpressions.mix64(spark, HashExpressions.fnv1a64(spark, $"id".cast("string"))).as("h"))
      .agg(KmvAgg.kmv_kth(spark, $"h", K).as("f"))
      .collect().head
    assert(row.isNullAt(0))
  }

  test("b09b query: three flag groups, estimate tracks the exact count") {
    val out = ops.Relational.kmvDistinct(spark, sf0001)
      .as[(String, Long, Option[Double])].collect()
    assert(out.map(_._1).toSeq === Seq("A", "N", "R"))
    out.foreach { case (flag, exact, est) =>
      est match {
        case Some(e) =>
          assert(math.abs(e - exact) / exact.toDouble < 0.30,
            s"$flag: exact=$exact est=$e")
        case None => // < k distinct parts in this group at sf0.001 — legal
          assert(exact < 4 * K, s"$flag: NULL estimate but exact=$exact")
      }
    }
  }
}
