package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's A1 source is a text/CSV point-set file parsed line by
  * line. Prove the engine ingests that format too: round-trip the
  * embeddings through CSV (vector as a ';'-joined field), parse back with
  * split+cast, and require the KNN pipeline to produce identical results
  * from either source. */
class CsvSourceSpec extends SparkSpec {
  import spark.implicits._

  private val csvDir = "target/test-csv/embeddings"

  test("schema evolution: mergeSchema unions parquet parts written with " +
    "old and new schemas, nulling the missing column") {
    val dir = "target/test-merge/docs"
    val old = Seq((1L, "alpha")).toDF("doc_id", "text")
    val neu = Seq((2L, "beta", "en")).toDF("doc_id", "text", "lang")
    old.write.mode("overwrite").parquet(s"$dir/part=old")
    neu.write.mode("overwrite").parquet(s"$dir/part=new")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("doc_id", "text", "lang", "part"))
    val rows = merged.select("doc_id", "lang").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(rows.toSeq == Seq((1L, None), (2L, Some("en"))),
      "old-schema rows must surface the evolved column as null")
  }

  test("CSV point-set source parses to the identical labeled point set") {
    val parquet = Tables.embeddings(spark, sf0001)
    parquet
      .select($"vec_id", concat_ws(";", $"embedding").as("embedding_csv"), $"label")
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(csvDir)

    val parsed = spark.read
      .schema(StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding_csv", StringType),
        StructField("label", IntegerType))))
      .option("header", "true").csv(csvDir)
      .select($"vec_id",
        transform(split($"embedding_csv", ";"), x => x.cast("float")).as("embedding"),
        $"label")

    val a = parquet.orderBy($"vec_id")
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect()
    val b = parsed.orderBy($"vec_id")
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect()
    assert(a.length === b.length)
    a.zip(b).foreach { case ((id1, v1, l1), (id2, v2, l2)) =>
      assert(id1 === id2 && l1 === l2)
      assert(v1.length === v2.length)
      // float→text→float round-trip must be exact (Spark prints floats
      // with enough digits to round-trip)
      assert(v1.sameElements(v2), s"vector mismatch at vec_id=$id1")
    }
  }

  test("KNN top-k from the CSV source equals top-k from parquet") {
    import org.apache.spark.sql.expressions.Window
    val parsed = spark.read
      .schema(StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding_csv", StringType),
        StructField("label", IntegerType))))
      .option("header", "true").csv(csvDir)
      .select($"vec_id",
        transform(split($"embedding_csv", ";"), x => x.cast("float")).as("embedding"),
        $"label")

    val q = parsed.select($"vec_id".as("qid"), $"embedding".as("qv")).repartition(4)
    val c = parsed.select($"vec_id".as("cid"), $"embedding".as("cv"))
    val w = Window.partitionBy($"qid").orderBy($"dist".asc, $"cid".asc)
    val fromCsv = q.crossJoin(broadcast(c)).where($"qid" =!= $"cid")
      .select($"qid", $"cid", graft.functions.VectorExpressions
        .cosine_distance(spark, $"qv", $"cv").as("dist"))
      .withColumn("rnk", row_number().over(w)).where($"rnk" <= 10)
      .select($"qid", $"rnk", $"cid", round($"dist", 6).as("dist"))
      .orderBy($"qid", $"rnk")
      .as[(Long, Int, Long, Double)].collect()

    val fromParquet = ops.Knn.knnTopk(spark, sf0001)
      .select($"qid", $"rnk", $"cid", $"dist")
      .as[(Long, Int, Long, Double)].collect()
    assert(fromCsv.sameElements(fromParquet))
  }
}
