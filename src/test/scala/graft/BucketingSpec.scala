package graft

import org.apache.spark.sql.functions._

/** Bucketing: the pre-partitioned co-located join — at 100 TB the way a
  * fact-fact join avoids re-shuffling on every query. Both tables are
  * written bucketed by the join key; the join plan must then contain no
  * shuffle exchange on either side. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of tables bucketed on the key plans without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    // a previous JVM's managed-table dirs survive the fresh metastore
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_orderpriority")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")

    // hint forces SMJ (at test scale the optimizer would broadcast);
    // a 100 TB fact-fact join picks SMJ on its own
    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("o_bucketed"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").agg(sum($"l_quantity").as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    // bucket-aware scan: SortMergeJoin with no Exchange below it
    assert(plan.contains("SortMergeJoin"), plan)
    val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
    val beforeAgg = joinSection.split("HashAggregate").last
    assert(!beforeAgg.contains("Exchange hashpartitioning(l_orderkey"),
      s"join should read bucketed layout without re-shuffling:\n$plan")
    // and results must match the plain-parquet join
    val expected = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").agg(sum($"l_quantity").as("q"))
      .orderBy($"o_orderpriority").as[(String, Double)].collect()
    val got = joined.orderBy($"o_orderpriority").as[(String, Double)].collect()
    assert(got.sameElements(expected))
  }
}
