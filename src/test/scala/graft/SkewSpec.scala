package graft

import org.apache.spark.sql.functions._

/** Skew evidence for the 100 TB story (SURVEY.md §scale): real corpora
  * have hot keys (one domain = half the crawl), and a shuffle join keyed
  * on them stalls one reducer while 999 idle. Two mitigations, both
  * asserted here:
  *
  *  1. AQE skew-join: the runtime splits the oversized partition into
  *     advisory-sized chunks and replicates the matching side — no code
  *     change in the query. Plan-asserted (`skew=true` on the join) the
  *     same way AnnSpec pins the shuffle-hash probe.
  *  2. Salting: the writer-side fallback when AQE can't help (e.g. a
  *     skewed aggregation): scatter the hot key over N sub-keys, partial
  *     aggregate, then merge. Asserted equal to the direct form.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val aqeKeys = Seq(
    "spark.sql.adaptive.enabled",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes")

  test("AQE splits the skewed join partition (skew=true in the final plan)") {
    val saved = aqeKeys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      // force a shuffle join: the dims here would broadcast at test scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // test-scale thresholds; at 100 TB the defaults (256 MB) do this job
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "128KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")

      // hot key: 0 carries 90% of the fact side (with payload weight so
      // its shuffle partition dwarfs the advisory size)
      val fact = spark.range(0, 200000)
        .select(when($"id" < 180000, 0L).otherwise($"id" % 100).as("k"),
          concat(lit("p"), lpad($"id".cast("string"), 40, "x")).as("payload"))
      val dim = spark.range(0, 100).select($"id".as("k"),
        concat(lit("d"), $"id".cast("string")).as("dk"))

      val joined = fact.join(dim, "k")
      // collect() (not count()) so the SAME QueryExecution is finalized —
      // count() plans a separate query and the inspected plan never runs
      assert(joined.collect().length === 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew-split join in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("two-phase salted aggregation equals the direct aggregation") {
    val salts = 16
    val fact = spark.range(0, 100000)
      .select(when($"id" < 90000, 0L).otherwise($"id" % 100).as("k"),
        ($"id" % 7).as("v"))
    val direct = fact.groupBy($"k")
      .agg(sum($"v").as("sv"), count(lit(1)).as("n"))
    // phase 1 scatters the hot key across `salts` sub-keys (shuffle is
    // uniform), phase 2 merges `salts` tiny partials per key.
    val salted = fact
      .withColumn("salt", pmod(hash($"v", rand(seed = 7)), lit(salts)))
      .groupBy($"k", $"salt")
      .agg(sum($"v").as("psv"), count(lit(1)).as("pn"))
      .groupBy($"k")
      .agg(sum($"psv").as("sv"), sum($"pn").as("n"))
    assert(direct.orderBy($"k").collect().toSeq ===
      salted.orderBy($"k").collect().toSeq)
  }

  test("b42 salted join equals the plain join; build side replicates 8x") {
    val li = Tables.lineitem(spark, sf0001)
    val o = Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_orderpriority")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2)) * " +
          "(1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)").as("revenue"))
      .orderBy($"o_orderpriority")
    assert(plain.collect().toSeq ===
      ops.Relational.saltedJoin(spark, sf0001).collect().toSeq)
    // the build-side inflation the rewrite pays: one replica per salt
    val dim = o.withColumn("salt", explode(sequence(lit(0), lit(7))))
    assert(dim.count() === o.count() * 8)
    // scale-faithful physical shape: the premise is a build side too
    // big to broadcast, so the (key, salt) join must be a shuffled join
    // even at fixture scale
    val plan = ops.Relational.saltedJoin(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"expected shuffled join:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"salted build side must not broadcast:\n$plan")
  }
}
