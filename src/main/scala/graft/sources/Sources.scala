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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src01_csv_pointset" -> (csvPointSet _),
    "src02_jsonl_corpus" -> (jsonlCorpus _),
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
  )
}
