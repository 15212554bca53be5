package graft

import org.apache.spark.sql.functions._

/** Partitioned table layout — at 100 TB the tables are directory-
  * partitioned (e.g. events by type/date) and queries prune partitions at
  * planning time. Write the fixture partitioned, read back filtered, and
  * assert the plan's PartitionFilters actually skip directories. */
class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  test("partitionBy write + partition pruning on read") {
    val out = "target/test-partitioned/events"
    Tables.events(spark, sf0001)
      .select($"event_id", $"user_id", $"value", $"event_type")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)

    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("event_type=")).map(_.getName).sorted
    assert(dirs.length === 5, dirs.mkString(","))

    val q = spark.read.parquet(out).where($"event_type" === "purchase")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("event_type"), plan)
    // pruned scan must agree with the unpartitioned source
    val expected = Tables.events(spark, sf0001)
      .where($"event_type" === "purchase").count()
    assert(q.count() === expected)
    // and the pruned read touches only the one matching directory
    val files = q.select(input_file_name()).distinct().as[String].collect()
    assert(files.forall(_.contains("event_type=purchase")), files.mkString("\n"))
  }
}
