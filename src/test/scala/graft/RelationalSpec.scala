package graft

import org.apache.spark.sql.functions.{col, count, expr, lit, max, min, month}

import graft.ops.Relational

/** Relational-surface tests: result sanity on sf0.001 plus physical-plan
  * assertions — the properties that actually matter at 100 TB (filters
  * and projections reaching the parquet scan, dimensions broadcast,
  * order+limit planned as a per-partition top-k).
  */
class RelationalSpec extends SparkSpec {

  private def plan(name: String): String =
    Relational.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("b01: filter and projection are pushed to the parquet scan") {
    val p = plan("b01_scan_filter")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // pruned read schema: only the 5 referenced columns, not all 11
    assert(!p.contains("l_tax"), "scan should not read unreferenced columns")
  }

  test("b03: dimension joins are broadcast, no shuffle of dims " +
    "(AQE on and off)") {
    withAqeBothWays {
      val p = plan("b03_join_broadcast")
      assert(p.contains("BroadcastHashJoin"), p)
    }
  }

  test("b34: star flagship broadcasts every dim; only the agg shuffles " +
    "(AQE on and off)") {
    withAqeBothWays {
      val p = plan("b34_star_join")
      val nBroadcast = p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin")
      assert(nBroadcast == 4, s"expected 4 broadcast dimension hops, got $nBroadcast in:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
        "the fact table must stream through the broadcast chain unshuffled")
      // the sole row shuffle is the aggregate's partial->final exchange;
      // the top-10 is a TakeOrderedAndProject, not a global sort
      val nShuffle = p.sliding("Exchange hashpartitioning".length)
        .count(_ == "Exchange hashpartitioning")
      assert(nShuffle <= 1, s"expected at most the aggregate exchange, got $nShuffle in:\n$p")
      assert(p.contains("TakeOrderedAndProject"), p)
      assert(p.contains("PushedFilters"), "shipdate filter should reach the scan")
    }
  }

  test("b34: deterministic top-10 ordered by revenue") {
    val rows = Relational.queries("b34_star_join")(spark, sf0001).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b },
      "rows must be revenue-descending")
  }

  test("b37: correlated LATERAL LIMIT decorrelates to one windowed rank") {
    val p = plan("b37_lateral")
    // Catalyst must rewrite the per-outer-row subquery into a single
    // window rank + join — the only per-row-subquery-free shape. A plan
    // that re-ran the inner query per nation would show nested loops of
    // the customer scan; decorrelation shows exactly one Window.
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    val df = Relational.queries("b37_lateral")(spark, sf0001)
    val rows = df.collect()
    // per-nation cap of 3, balances descending within each nation
    val byNation = rows.groupBy(_.getAs[String]("n_name"))
    assert(byNation.values.forall(_.length <= 3))
    byNation.values.foreach { g =>
      val b = g.map(_.getAs[Double]("c_acctbal"))
      assert(b.zip(b.tail).forall { case (x, y) => x >= y }, g.mkString(","))
    }
  }

  test("b38: bloom prefilter is cost-only — result equals the plain semi join") {
    import graft.Tables
    val withBloom = Relational.queries("b38_bloom_semi")(spark, sf0001)
    val keys = Tables.orders(spark, sf0001)
      .where(col("o_totalprice") > 400000).select(col("o_orderkey"))
    val plain = Tables.lineitem(spark, sf0001)
      .join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)").as("revenue"))
    assert(withBloom.except(plain).count() == 0 &&
           plain.except(withBloom).count() == 0,
      "bloom-prefiltered result must be identical to the exact semi join")
    // and the sketch must actually prune: the prefiltered scan is a
    // strict subset of the fact table (selectivity < 1)
    val bf = keys.stat.bloomFilter("o_orderkey", 1000L, 0.01)
    val total = Tables.lineitem(spark, sf0001).count()
    val kept = Tables.lineitem(spark, sf0001)
      .filter(r => bf.mightContain(r.getAs[Long]("l_orderkey"))).count()
    assert(kept < total, s"prefilter kept $kept of $total — no pruning")
    // and the probe runs INSIDE whole-stage codegen (r11: the native
    // BloomFilterMightContain expression replaced the JVM udf): in the
    // EXECUTED adaptive plan (codegen spans exist only after stage
    // materialization) the filter carrying the probe must print with a
    // `*(n)` codegen id, not as a standalone interpreted Filter
    withBloom.collect()
    val exec = withBloom.queryExecution.executedPlan.toString
    val codegenned =
      raw"\*\(\d+\) Filter .*might_contain".r.findFirstIn(exec).isDefined
    assert(codegenned,
      s"bloom probe filter is outside WholeStageCodegen:\n$exec")
  }

  test("b36: the sketch aggregates the stream directly — no join, no" +
      " shuffle before the partial aggregate") {
    val p = plan("b36_heavy_hitters")
    // the kmv_sample aggregate must consume the scan via map-side
    // partial aggregation; joining exact counts happens AFTER the
    // k-row sample, never against the full stream twice... the exact
    // side is its own aggregate, so exactly one join of two collapsed
    // tables is expected and it must be broadcast (both sides tiny)
    assert(p.contains("kmv_sample"), p)
    assert(!p.contains("SortMergeJoin"),
      "joining collapsed sketch/exact tables must not shuffle-sort")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("b11: global sort+limit plans TakeOrderedAndProject") {
    val p = plan("b11_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("b07: Q1 aggregate uses partial (map-side) hash aggregation") {
    val p = plan("b07_agg_q1")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_"), "expected map-side partial aggregation")
  }

  test("q1 values match hand-computed slice") {
    import spark.implicits._
    val q1 = Relational.aggQ1(spark, sf0001)
    val row = q1.where($"l_returnflag" === "A" && $"l_linestatus" === "F")
      .collect()(0)
    // independently recompute with a second, simpler plan
    val li = Tables.lineitem(spark, sf0001)
      .where($"l_shipdate" <= org.apache.spark.sql.functions.lit("1998-09-02").cast("timestamp"))
      .where($"l_returnflag" === "A" && $"l_linestatus" === "F")
    val expected = li.agg(
      org.apache.spark.sql.functions.sum($"l_quantity"),
      org.apache.spark.sql.functions.count($"l_quantity")).collect()(0)
    assert(row.getAs[Double]("sum_qty") === expected.getDouble(0))
    assert(row.getAs[Long]("count_order") === expected.getLong(1))
  }

  test("b26: NOT IN with a NULL in the subquery is empty; NOT EXISTS and " +
    "the null-filtered NOT IN agree and are positive") {
    import spark.implicits._
    val out = Relational.notInNulls(spark, sf0001)
      .as[(String, Long)].collect().toMap
    assert(out("not_in") === 0L, out.toString)
    assert(out("not_exists") > 0L, out.toString)
    assert(out("not_exists") === out("not_in_null_filtered"), out.toString)
  }

  test("b26 plan: the unfiltered NOT IN runs as a null-aware anti join " +
    "(AQE on and off)") {
    withAqeBothWays {
      val plan = Relational.notInNulls(spark, sf0001)
        .queryExecution.executedPlan.toString
      // Spark renders the null-aware broadcast anti join as a
      // BroadcastHashJoin whose trailing isNullAwareAntiJoin flag is true
      assert(plan.contains("LeftAnti, BuildRight, true"), plan.take(2000))
    }
  }

  test("b17b: multiset counts dominate distinct counts and satisfy the " +
    "multiset identity |A| = |A∩N|_all + |A∖N|_all") {
    import spark.implicits._
    val out = Relational.setOpsAll(spark, sf0001)
      .as[(String, Long)].collect().toMap
    val aTotal = Tables.lineitem(spark, sf0001)
      .where($"l_returnflag" === "A").count()
    assert(out("intersect_all") >= out("intersect_distinct"), out.toString)
    assert(out("intersect_all") + out("except_all") === aTotal, out.toString)
  }

  test("percentile_cont brackets and orders its percentiles") {
    val df = Relational.percentileCont(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p25, p50, p90) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p25 <= p50 && p50 <= p90, r.toString)
    }
    // p50 of each group sits between the group's min and max price
    val bounds = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderpriority"))
      .agg(min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
    val oob = df.join(bounds, "o_orderpriority")
      .where(col("p50") < col("lo") || col("p50") > col("hi")).count()
    assert(oob == 0)
  }

  test("mode emits one deterministic argmax row per group") {
    val m = Relational.modePerGroup(spark, sf0001)
    val flags = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag")).distinct().count()
    assert(m.count() == flags)
    // the reported count really is the max over that group's months
    val counts = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"), month(col("l_shipdate")).as("m"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("cnt"))
      .groupBy(col("l_returnflag")).agg(max(col("cnt")).as("mx"))
    val bad = m.join(counts, "l_returnflag")
      .where(col("mode_count") =!= col("mx")).count()
    assert(bad == 0)
  }

  test("salted two-phase aggregation equals the direct aggregate") {
    import org.apache.spark.sql.functions.{sum, lit}
    val salted = Relational.saltedAgg(spark, sf0001)
      .select("l_returnflag", "sum_qty", "sum_price", "n_rows")
    val direct = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity").cast("decimal(15,2)")).cast("double")
          .as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(15,2)")).cast("double")
          .as("sum_price"),
        count(lit(1)).as("n_rows"))
    assert(salted.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(salted).count() == 0)
  }

  test("higher moments match the analytic shape of uniform quantities") {
    // l_quantity is ~uniform over 1..50 ⇒ skewness ≈ 0 and excess
    // kurtosis ≈ -1.2 (exactly -6/5·(n²+1)/(n²-1) for discrete uniform);
    // wide tolerances because sf0.001 groups are small samples
    val rows = Relational.higherMoments(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, skew, kurt) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(v > 100 && v < 350, s"var $v")        // uniform(1,50) ⇒ ~208
      assert(math.abs(skew) < 0.5, s"skew $skew")
      assert(kurt > -1.6 && kurt < -0.6, s"kurt $kurt")
    }
  }

  test("count-min sketch never underestimates, for every actor") {
    // the CMS structural guarantee: each of an item's cells sums a
    // superset of its occurrences, so min-of-cells ≥ exact with no
    // probability qualifier — checked over the FULL estimate frame,
    // not the declared top-20 view
    val row = Relational.countMinSketch(spark, sf0001)
      .agg(count(org.apache.spark.sql.functions.when(col("cms_n") < col("exact_n"), 1)),
        count(org.apache.spark.sql.functions.when(col("cms_n") > col("exact_n"), 1)))
      .head()
    val (under, over) = (row.getLong(0), row.getLong(1))
    assert(under == 0)
    // and it is an estimate, not a re-count: at this width some cells
    // must collide, so the total overestimate is strictly positive
    assert(over > 0, "expected live collisions at width " + Relational.CmWidth)
  }

  test("incremental aggregate maintenance equals the from-scratch aggregate") {
    import org.apache.spark.sql.functions.{sum, min, max, count, lit, round, expr, pmod}
    val incremental = Relational.incrementalAgg(spark, sf0001)
    val direct = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE)")
          .as("sum_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .withColumn("avg_price", round(col("sum_price") / col("n"), 6))
    assert(incremental.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(incremental).count() == 0)
    // the delta is genuinely non-empty — the merge path is exercised
    val deltaN = Tables.orders(spark, sf0001)
      .where(pmod(col("o_orderkey"), lit(10)) === 7).count()
    assert(deltaN > 0)
  }

  test("all declared relational queries run on sf0.001 and are non-empty") {
    Relational.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every relational query has an oracle (b09 via its accuracy contract)") {
    val noOracle = Relational.queries.keySet -- Relational.oracles.keySet
    assert(noOracle.isEmpty, noOracle.toString)
  }

  test("b44 log-bucket quantiles: reported buckets bracket the exact " +
    "quantile values within the 1+2^-4 relative-error guarantee") {
    val rows = Relational.logBucketQuantiles(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("q_pm")).toSeq == Seq(500L, 900L, 990L))
    // driver-side exact recompute of the value CDF in cents
    val cents = Tables.lineitem(spark, sf0001)
      .select(expr("CAST(CAST(l_extendedprice AS DECIMAL(9,2)) * 100 AS BIGINT)"))
      .collect().map(_.getLong(0)).sorted
    def bucketOf(v: Long): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      e * 16L + ((v * 16L) >> e) - 16L
    }
    val n = cents.length.toLong
    rows.foreach { r =>
      val q = r.getAs[Long]("q_pm")
      val target = (q * n + 999L) / 1000L
      val v = cents((target - 1).toInt) // exact q-quantile value
      val lb = r.getAs[Long]("lb_cents")
      // the exact quantile value lies in the reported bucket, whose
      // width is bounded by the 4-bit-mantissa guarantee
      assert(r.getAs[Long]("bucket") == bucketOf(v),
        s"q=$q: exact value $v not in reported bucket")
      assert(lb <= v && 16L * v < 17L * lb, s"q=$q v=$v lb=$lb")
      // cumulative counts match a full driver-side histogram replay
      assert(r.getAs[Long]("cum_n") ==
        cents.count(c => bucketOf(c) <= r.getAs[Long]("bucket")))
      assert(r.getAs[Long]("cum_n") >= target)
      assert(r.getAs[Long]("n_total") == n)
    }
  }
}
