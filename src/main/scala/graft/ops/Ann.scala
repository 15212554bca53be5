package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorExpressions

/** Approximate nearest-neighbor search (SURVEY.md §2.C4). Brute force
  * (ops.Knn) is the exact baseline and the oracle-checked surface; this
  * module is the scale path: IVF (inverted-file) coarse quantization.
  *
  * Structure — the same three phases as production IVF indexes:
  *  1. "Train": pick C coarse centroids (deterministically: the C
  *     lowest-id vectors — at scale this would be a k-means sample, the
  *     plumbing is identical).
  *  2. Assign: every candidate vector joins its nearest centroid — one
  *     broadcast join over C rows, O(n·C) distance evaluations, then the
  *     inverted lists are exactly a hash partitioning by cent_id.
  *  3. Probe: each query scans only the P nearest inverted lists —
  *     O(n·P/C) of the pair space instead of O(n²).
  *
  * At 100 TB the assignment table is bucketed/partitioned by cent_id so a
  * probe touches only P partitions; recall/cost is tuned with (C, P).
  * Declared without an oracle (approximate); AnnSpec measures recall
  * against the exact top-k. */
object Ann {
  val C = 16 // coarse centroids
  val P = 4  // probed lists per query
  val K = 10

  private[ops] def centroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).where(col("vec_id") < C)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))

  // The assignment table is the index: built once per (session, dataset)
  // and shared by probes/stats — the local analog of a persisted IVF
  // index on a cluster. Fixture files are immutable for a session.
  private val assignCache = new graft.PersistedCache

  def assignments(s: SparkSession, d: String): DataFrame =
    assignCache.getOrBuild(s, d)(buildAssignments(s, d))

  /** Drop cached per-session index state (tests / long-lived sessions);
    * sessions also self-evict on application end. */
  def clearCache(): Unit = assignCache.clear()

  /** (vec_id, cent_id) inverted-list assignment. */
  private def buildAssignments(s: SparkSession, d: String): DataFrame = {
    val e = Tables.repartitioned(Tables.embeddings(s, d), s)
      .select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cdist").asc, col("cent_id").asc)
    e.crossJoin(broadcast(centroids(s, d)))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        VectorExpressions.cosine_distance(s, col("embedding"), col("cent_vec"))
          .as("cdist"))
      .withColumn("crn", row_number().over(w)).where(col("crn") === 1)
      // cdist stays: consumers (e.g. the exact cell-blocked similarity
      // join) derive per-cell radii from the assignment angle.
      .select(col("vec_id"), col("cent_id"), col("embedding"), col("cdist"))
  }

  /** IVF approximate top-k: probe the P nearest lists per query, exact
    * cosine within the probed lists. Leave-one-out like knn_topk. */
  def ivfTopk(s: SparkSession, d: String): DataFrame = {
    val e = Tables.repartitioned(Tables.embeddings(s, d), s)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("cdist").asc, col("cent_id").asc)
    val probes = e.crossJoin(broadcast(centroids(s, d)))
      .select(col("qid"), col("qv"), col("cent_id"),
        VectorExpressions.cosine_distance(s, col("qv"), col("cent_vec")).as("cdist"))
      .withColumn("prn", row_number().over(wProbe)).where(col("prn") <= P)
      .select(col("qid"), col("qv"), col("cent_id"))
    val lists = assignments(s, d)
      .select(col("cent_id"), col("vec_id").as("cid"), col("embedding").as("cv"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("cid").asc)
    // The inverted lists are the DATASET — never broadcast them. A
    // shuffle-hash join partitions both sides by cent_id, i.e. each probe
    // is routed to exactly the partitions holding its P lists; on a
    // cluster `lists` would be bucketed by cent_id so only the probe side
    // moves. (The hint also stops the optimizer from choosing broadcast
    // at test scale, keeping the physical shape scale-faithful.)
    probes.join(lists.hint("shuffle_hash"), Seq("cent_id"))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        VectorExpressions.cosine_distance(s, col("qv"), col("cv")).as("dist"))
      .withColumn("rnk", row_number().over(wTop)).where(col("rnk") <= K)
      .select(col("qid"), col("rnk"), col("cid"), round(col("dist"), 6).as("dist"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** Inverted-list census — list sizes per centroid (skew visibility). */
  def ivfStats(s: SparkSession, d: String): DataFrame =
    assignments(s, d).groupBy(col("cent_id"))
      .agg(count(lit(1)).as("list_size"))
      .orderBy(col("cent_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_ivf_topk" -> (ivfTopk _),
    "ann_ivf_stats" -> (ivfStats _),
  )

  /** ann_ivf_stats is exact (deterministic assignment) → oracle-able via
    * the same nearest-centroid SQL; ann_ivf_topk is approximate → no
    * oracle (rows-only check). */
  val oracles: Map[String, String] = Map(
    "ann_ivf_stats" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cent_vec
         |  FROM embeddings WHERE vec_id < $C),
         |assign AS (
         |  SELECT e.vec_id, c.cent_id,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY 1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
         |                                            c.cent_vec) ASC,
         |               c.cent_id ASC) AS crn
         |  FROM embeddings e CROSS JOIN cents c)
         |SELECT cent_id, count(*) AS list_size FROM assign
         |WHERE crn = 1 GROUP BY cent_id ORDER BY cent_id""".stripMargin,
  )
}
