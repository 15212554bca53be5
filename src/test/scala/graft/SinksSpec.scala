package graft

import org.apache.spark.sql.types._

/** A7 sink surface: the classifier's predictions round-trip through
  * every columnar/text sink format without loss. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private lazy val preds = ops.Knn.knnClassify(spark, sf0001)
  private val base = "target/test-sinks"
  private val schema = StructType(Seq(
    StructField("qid", LongType), StructField("pred", IntegerType)))

  private def roundTrip(format: String): Array[(Long, Int)] = {
    val path = s"$base/$format"
    preds.write.mode("overwrite").format(format)
      .option("header", "true").save(path)
    spark.read.schema(schema).format(format)
      .option("header", "true").load(path)
      .orderBy($"qid").as[(Long, Int)].collect()
  }

  test("predictions round-trip identically through parquet, orc, csv, json") {
    val expected = preds.orderBy($"qid").as[(Long, Int)].collect()
    Seq("parquet", "orc", "csv", "json").foreach { fmt =>
      assert(roundTrip(fmt).sameElements(expected), s"sink format $fmt")
    }
  }

  test("hive-partitioned write prunes partitions at read time") {
    import org.apache.spark.sql.functions._
    // the 100-TB layout: events written partitioned by day, so a
    // day-filtered read must touch ONLY that day's files — partition
    // pruning, the scan-level twin of predicate pushdown
    val path = s"$base/events_by_day"
    val ev = Tables.events(spark, sf0001)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("day").parquet(path)
    val days = ev.select($"day").distinct().as[String].collect().sorted
    assert(days.length > 1, "fixture must span multiple days")

    val read = spark.read.parquet(path).where($"day" === days.head)
    // correctness: the pruned read equals the filtered original
    assert(read.count() === ev.where($"day" === days.head).count())
    // plan: the partition filter is recognized as such (not a data
    // filter), and the scan's selected partitions shrink to 1 of N
    val scan = read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("expected a FileSourceScanExec"))
    assert(scan.partitionFilters.nonEmpty,
      "day predicate must be a partition filter")
    assert(scan.relation.location.inputFiles.length >
      scan.selectedPartitions.totalNumberOfFiles,
      "pruned scan must read fewer files than the table holds")
    assert(scan.selectedPartitions.partitionCount === 1,
      "exactly one day partition selected")
  }
}
