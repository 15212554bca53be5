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
}
