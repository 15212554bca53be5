package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (one JSON object per line) is THE interchange format of LLM
  * training corpora — every public text dump (C4, The Pile, RedPajama,
  * FineWeb) ships as .jsonl[.gz]. Prove the engine's ingest tier handles
  * it: round-trip the documents table through JSONL with an explicit
  * schema (never inference — at 100 TB a schema-inference pass is a full
  * extra scan), and pin the malformed-line contract (PERMISSIVE capture
  * vs DROPMALFORMED) that decides what a corrupt shard does to a
  * production ingest.
  */
class JsonlSourceSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "target/test-jsonl/docs"

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("JSONL round-trip: documents written as json lines read back " +
    "identically under an explicit schema") {
    val docs = Tables.documents(spark, sf0001)
    docs.coalesce(1).write.mode("overwrite").json(dir)
    val back = spark.read.schema(docSchema).json(dir)
    val a = docs.orderBy($"doc_id")
      .as[(Long, String, String, String, Long)].collect()
    val b = back.select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
      .as[(Long, String, String, String, Long)].collect()
    assert(a.sameElements(b), "JSONL round-trip must be lossless")
  }

  test("malformed lines: PERMISSIVE captures them in a corrupt-record " +
    "column; DROPMALFORMED silently drops; schema stays explicit") {
    val mixedDir = "target/test-jsonl/mixed"
    val lines = Seq(
      """{"doc_id": 1, "text": "good row", "lang": "en", "source": "web", "n_chars": 8}""",
      """{"doc_id": 2, "text": "truncated row...""", // invalid JSON
      """{"doc_id": 3, "text": "another good row", "lang": "de", "source": "web", "n_chars": 16}""")
    spark.createDataset(lines).coalesce(1)
      .write.mode("overwrite").text(mixedDir)

    // PERMISSIVE (the audit-grade default): bad line surfaces as a row
    // with the raw text in _corrupt_record and nulls elsewhere, so an
    // ingest can COUNT and QUARANTINE instead of guessing
    // cache() is REQUIRED here, not an optimization: Spark refuses a
    // query whose referenced columns are only the internal corrupt-record
    // column over raw files (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — parse
    // once, then audit the parsed result
    val withCorrupt = spark.read
      .schema(docSchema.add(StructField("_corrupt_record", StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(mixedDir)
      .cache()
    val corrupt = withCorrupt.where($"_corrupt_record".isNotNull)
      .select($"_corrupt_record").as[String].collect()
    assert(corrupt.length === 1)
    assert(corrupt.head.contains("truncated row"))
    assert(withCorrupt.where($"_corrupt_record".isNull).count() === 2)

    // DROPMALFORMED: the throughput-grade mode — bad line vanishes
    val dropped = spark.read.schema(docSchema)
      .option("mode", "DROPMALFORMED").json(mixedDir)
    assert(dropped.count() === 2)
    assert(dropped.select($"doc_id").as[Long].collect().sorted
      .sameElements(Array(1L, 3L)))
  }

  test("jsonl ingest feeds the pipeline unchanged: exact dedup over the " +
    "JSONL-sourced table equals the parquet-sourced result") {
    // the pipeline operators take DataFrames by table contract, not by
    // file format — re-run c01's normalized-dedup logic over the JSONL
    // read and require identical survivors. (Writes its own copy so the
    // test does not order-depend on the round-trip test above.)
    val own = "target/test-jsonl/docs2"
    Tables.documents(spark, sf0001).coalesce(1)
      .write.mode("overwrite").json(own)
    val fromJsonl = spark.read.schema(docSchema).json(own)
    val norm = (df: org.apache.spark.sql.DataFrame) =>
      df.select($"doc_id", lower(trim($"text")).as("norm"))
        .groupBy($"norm").agg(min($"doc_id").as("keep_id"))
        .select($"keep_id").orderBy($"keep_id").as[Long].collect()
    val viaParquet = norm(Tables.documents(spark, sf0001))
    val viaJsonl = norm(fromJsonl)
    assert(viaParquet.sameElements(viaJsonl))
  }
}
