package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvSampleAgg
import graft.ops.Relational

/** Laws for the KMV rank sketch (b35):
  *  - degenerate exactness: a group no larger than k samples itself, so
  *    the sketch quantile must EQUAL the exact b27 interpolation;
  *  - partitioning invariance: the kept multiset is a pure function of
  *    the data, so merge order / partition layout cannot change it;
  *  - bounded rank error on a real scale tier.
  */
class KmvSampleSpec extends SparkSpec {

  test("groups no larger than k reproduce the exact interpolation") {
    import spark.implicits._
    // 100 < k rows: the sketch must degrade to the exact value set, and
    // the b27 interpolation over it must equal the hand-computed exact
    // percentile of the population
    val n = 100
    val rows = (1 to n).map(i => ("g", i * 2654435761L, i.toDouble))
    val sample = rows.toDF("g", "h", "v").repartition(7)
      .groupBy(col("g"))
      .agg(KmvSampleAgg.kmv_sample(spark, col("h"), col("v"), Relational.KmvQK).as("s"))
      .head().getSeq[Double](1)
    assert(sample.length == n, "sample must BE the population when n <= k")
    assert(sample == (1 to n).map(_.toDouble))
    // p50 of 1..100 by the h = p(n-1) rule: h = 49.5 → (50 + 51)/2
    val h = 0.5 * (n - 1)
    val exact = sample(h.toInt) + (h - h.toInt) * (sample(h.toInt + 1) - sample(h.toInt))
    assert(exact == 50.5)
  }

  test("b35: sketch quantile rank error is within the O(1/sqrt(k)) bound") {
    val sf001 = "/root/testdata/sf0.01"
    val est = Relational.queries("b35_kmv_quantiles")(spark, sf001)
      .select(col("o_orderpriority"), col("p50_est"), col("p90_est"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(est.nonEmpty)
    // judge the estimate in RANK space (value error depends on local
    // density; rank error is what the k-sample theory bounds): the
    // empirical CDF of the population at the estimate must sit within
    // 4·sqrt(p(1-p)/k) of p — a 4-sigma envelope for the b35 k
    val pop = Tables.orders(spark, sf001)
      .select(col("o_orderpriority"), col("o_totalprice"))
      .collect()
      .groupBy(_.getString(0)).map { case (g, rs) =>
        g -> rs.map(_.getDouble(1)).sorted
      }
    def bound(p: Double) = 4.0 * math.sqrt(p * (1 - p) / Relational.KmvQK)
    pop.foreach { case (g, vs) =>
      val (e50, e90) = est(g)
      val cdf50 = vs.count(_ <= e50).toDouble / vs.length
      val cdf90 = vs.count(_ <= e90).toDouble / vs.length
      assert(math.abs(cdf50 - 0.5) <= bound(0.5),
        s"$g: p50 estimate $e50 sits at rank $cdf50")
      assert(math.abs(cdf90 - 0.9) <= bound(0.9),
        s"$g: p90 estimate $e90 sits at rank $cdf90")
    }
  }

  test("b36: a stream smaller than k is sampled whole — estimate is exact") {
    // sf0.001 has fewer events than HhK, so n_sample = N and
    // (hits·N) DIV n_sample = exact count: the degenerate-exactness law
    val rows = Relational.queries("b36_heavy_hitters")(spark, sf0001).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_n") == r.getAs[Long]("exact_n"),
        s"user ${r.getAs[Long]("user_id")}: est ${r.getAs[Long]("est_n")} " +
          s"!= exact ${r.getAs[Long]("exact_n")} in the degenerate regime")
    }
  }

  test("b36: sample-hit counts sit in the 4-sigma binomial envelope") {
    val sf001 = "/root/testdata/sf0.01"
    val n = Tables.events(spark, sf001).count().toDouble
    val rows = Relational.queries("b36_heavy_hitters")(spark, sf001).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_n").toDouble
      val hits = r.getAs[Long]("hits").toDouble
      val p = exact / n
      val expHits = Relational.HhK.toDouble * p
      val sigma = math.sqrt(Relational.HhK.toDouble * p * (1 - p))
      assert(math.abs(hits - expHits) <= 4 * sigma + 1,
        s"user ${r.getAs[Long]("user_id")}: $hits hits vs expected " +
          s"$expHits (sigma $sigma)")
    }
  }

  test("kmv_sample is partitioning-invariant") {
    import spark.implicits._
    // adversarial layout: same rows, radically different partitionings;
    // k below the group size so the heap actually has to evict
    val rows = (1L to 2000L).map(i => ("g" + (i % 3), i * 2654435761L, i * 1.5))
    def agg(parts: Int): Map[String, Seq[Double]] =
      rows.toDF("g", "h", "v").repartition(parts)
        .groupBy(col("g"))
        .agg(KmvSampleAgg.kmv_sample(spark, col("h"), col("v"), 64).as("s"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val one = agg(1)
    val many = agg(37)
    assert(one.keySet == many.keySet)
    one.foreach { case (g, vs) =>
      assert(vs == many(g), s"group $g: sample differs across partitionings")
      assert(vs.length == 64)
      assert(vs == vs.sorted, s"group $g: sample not value-sorted")
    }
  }
}
