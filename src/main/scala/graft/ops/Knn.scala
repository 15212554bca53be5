package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Distances

/** The reference's core surface: exact K-nearest-neighbors as a Spark
  * pipeline (SURVEY.md §2.A). The reference computes it twice — a
  * Hadoop-MapReduce job (mapper emits (test_id,(dist,label)), reducer
  * keeps a bounded priority queue + majority vote) and a CUDA kernel
  * (dense m×n distance matrix + per-row selection). Here the same WHAT
  * is declared as: broadcast nested-loop join → compiled distance kernel
  * → per-query top-k window → vote.
  *
  * Scale design (100 TB / 1000 executors):
  *  - Query side is repartitioned across the cluster; candidate side is
  *    `broadcast()` — the exact analog of the reference's
  *    DistributedCache'd training set. Each task streams its query
  *    partition against the in-memory candidate table: no shuffle of the
  *    O(m·n) pair stream ever materializes before the top-k cut.
  *  - When the candidate set outgrows broadcast (≫ a few GB), the shape
  *    becomes block-nested-loop: repartition both sides into B blocks,
  *    cross-join block pairs, keep per-(query, block) partial top-k, then
  *    re-aggregate partial top-ks (a k-size state per query — see
  *    functions.TopKAgg). That is exactly the reference's
  *    combiner→reducer split, and it shuffles only k rows per query.
  *  - The window `row_number` version declared here and the aggregator
  *    version (knn_topk_agg) are equivalence-tested; the window form is
  *    kept as the oracle-facing default because it is plain SQL.
  */
object Knn {
  val K = 10

  /** (qid, cid, dist) pair stream, leave-one-out, cosine.
    *
    * The query side is hash-repartitioned BY qid (not round-robin): the
    * broadcast join preserves the streamed side's partitioning, so every
    * downstream per-query operator — the top-k window, the vote
    * aggregate, the bounded-heap aggregate — finds its ClusteredDistribution
    * already satisfied and plans ZERO further exchanges. With round-robin
    * the window path paid Sort+Exchange+Sort over the pair stream (r17
    * plan audit: knn_topk Exchange hashpartitioning(qid) between two full
    * per-partition sorts); keyed repartition deletes the exchange and one
    * of the sorts at every scale, for the same one-shuffle cost of the
    * 2000-row query-side rebalance itself (guide §2.4: establish the
    * partitioning once, let every keyed consumer reuse it). */
  private def pairs(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.repartition(Tables.parallelism(s), col("vec_id"))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("cv"),
      col("label").as("clabel"))
    q.crossJoin(broadcast(c))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("clabel"),
        graft.functions.VectorExpressions
          .cosine_distance(s, col("qv"), col("cv")).as("dist"))
  }

  private def topkRanked(s: SparkSession, d: String): DataFrame = {
    // Rank on full precision, tie-break on cid (determinism rule §2);
    // round only the projected output column.
    val w = Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("cid").asc)
    pairs(s, d).withColumn("rnk", row_number().over(w)).where(col("rnk") <= K)
  }

  // topk/classify/accuracy all consume the same ranked neighbor set; the
  // O(m·n) pair scan is its only expensive input, so share one persisted
  // copy (k rows per query — tiny) per (session, dataset). Harness-scoped
  // by design: entries live for the session (bounded by the handful of
  // sfDirs the harness touches) and assume the dataset files are
  // immutable for the session's lifetime — true for the read-only
  // /root/testdata fixtures.
  private val topkCache = new graft.PersistedCache
  private def topkRankedShared(s: SparkSession, d: String): DataFrame =
    topkCache.getOrBuild(s, d)(topkRanked(s, d))

  /** Drop cached per-session state (tests / long-lived sessions);
    * sessions also self-evict on application end. */
  def clearCache(): Unit = topkCache.clear()

  def knnTopk(s: SparkSession, d: String): DataFrame =
    topkRankedShared(s, d)
      .select(col("qid"), col("rnk"), col("cid"), round(col("dist"), 6).as("dist"))
      .orderBy(col("qid"), col("rnk"))

  /** A1→A5: classify every embedding by majority vote of its 10 nearest
    * (leave-one-out); vote ties break to the smallest label. */
  /** Majority vote over the first k ranked neighbors (tie → smallest
    * label) — THE vote pipeline; knnClassify is the k = K case and the
    * k-sweep re-invokes it per k so a tie-break or rounding change can
    * never fork between them. */
  private def classifyAt(s: SparkSession, d: String, k: Int): DataFrame = {
    val votes = topkRankedShared(s, d).where(col("rnk") <= k)
      .groupBy(col("qid"), col("clabel")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("qid")).orderBy(col("n").desc, col("clabel").asc)
    votes.withColumn("vr", row_number().over(w)).where(col("vr") === 1)
      .select(col("qid"), col("clabel").as("pred"))
  }

  /** Accuracy of [[classifyAt]] against the held-out labels. */
  private def accuracyAt(s: SparkSession, d: String, k: Int): DataFrame = {
    val truth = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    classifyAt(s, d, k).join(truth, col("qid") === col("vec_id"))
      .agg(count(lit(1)).as("n_queries"),
        round(avg(when(col("pred") === col("label"), 1.0).otherwise(0.0)), 6)
          .as("accuracy"))
  }

  def knnClassify(s: SparkSession, d: String): DataFrame =
    classifyAt(s, d, K).orderBy(col("qid"))

  /** A6: leave-one-out accuracy of the 10-NN cosine classifier. */
  def knnAccuracy(s: SparkSession, d: String): DataFrame =
    accuracyAt(s, d, K).select(col("accuracy"))

  /** A6-sweep: leave-one-out accuracy for k ∈ {1,3,5,10} from ONE
    * ranked-neighbor pass — the hyperparameter sweep the reference's
    * coursework would run as four separate jobs. The O(m·n) pair scan
    * and the rank window are shared (session cache); each k is then a
    * cheap re-aggregation of the same ≤10-row-per-query set, so
    * sweeping k costs four tiny aggregates, not four corpus scans. */
  def knnKSweep(s: SparkSession, d: String): DataFrame =
    Seq(1, 3, 5, 10)
      .map(k => accuracyAt(s, d, k)
        .select(lit(k).as("k"), col("n_queries"), col("accuracy")))
      .reduce(_.unionAll(_)).orderBy(col("k"))

  /** A5-regression: the k-NN REGRESSOR sibling of the classifier —
    * predict each query's numeric target as the mean of its k
    * neighbors' labels (labels are small ints, so sum is exact and the
    * one division is engine-identical), with the per-query absolute
    * error against the held-out true label. Same shared ranked set. */
  def knnRegression(s: SparkSession, d: String): DataFrame = {
    val truth = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    topkRankedShared(s, d)
      .groupBy(col("qid"))
      .agg((sum(col("clabel")).cast("double") / count(lit(1))).as("pred"))
      .join(truth, col("qid") === col("vec_id"))
      .select(col("qid"), round(col("pred"), 6).as("pred"),
        round(abs(col("pred") - col("label")), 6).as("abs_err"))
      .orderBy(col("qid"))
  }

  /** A8: radius / threshold similarity join — all pairs closer than tau.
    * With ~random 64-d vectors cosine distance concentrates near 1, so a
    * small tau keeps the output to the genuinely-near pairs. */
  val RadiusTau = 0.6 // ~100 pairs at sf0.01 — sparse but non-trivial
  def knnRadius(s: SparkSession, d: String): DataFrame =
    pairs(s, d).where(col("dist") < RadiusTau)
      .select(col("qid"), col("cid"), round(col("dist"), 6).as("dist"))
      .orderBy(col("qid"), col("cid"))

  /** Euclidean variant of the top-k (k=5) — the reference's canonical
    * squared-L2 path (sqrt kept so the oracle can use list_distance). */
  def knnTopkL2(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    // keyed repartition: same zero-downstream-exchange shape as [[pairs]]
    val q = e.repartition(Tables.parallelism(s), col("vec_id"))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val p = q.crossJoin(broadcast(c)).where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        graft.functions.VectorExpressions
          .euclidean_distance(s, col("qv"), col("cv")).as("dist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("cid").asc)
    p.withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
      .select(col("qid"), col("rnk"), col("cid"), round(col("dist"), 6).as("dist"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** knn_topk computed through the bounded-heap `top_k_by` aggregate
    * instead of a ranking window: map-side partial top-k shrinks every
    * partition to ≤k rows per query BEFORE the exchange (the reference's
    * combiner semantics) — the shape that survives a candidate set too
    * large to broadcast. Output and oracle are identical to knn_topk. */
  def knnTopkAgg(s: SparkSession, d: String): DataFrame = {
    val nbrs = pairs(s, d)
      .groupBy(col("qid"))
      .agg(graft.functions.TopKAgg
        .top_k_by(s, col("dist"), col("cid"), col("clabel"), K).as("nbrs"))
    nbrs.select(col("qid"), posexplode(col("nbrs")).as(Seq("pos", "nbr")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rnk"),
        col("nbr.id").as("cid"), round(col("nbr.dist"), 6).as("dist"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** Byte budget per candidate block in [[knnTopkBlocked]] — sized so a
    * block co-resides comfortably with a query partition in executor
    * memory (same order as Spark's own broadcast threshold). */
  val BlockBytesConf = "spark.graft.knn.blockBytes"
  private val DefaultBlockBytes = 64L << 20

  /** Candidate-side block count: ceil(candidate bytes / block budget),
    * from Catalyst's scan statistics — file-size based, plan-time, no
    * job, and it keeps summing correctly over a multi-file 100 TB scan.
    * Floored at 2: a candidate set that fits ONE block belongs to the
    * broadcast layout (knn_topk), so this operator always exercises the
    * partial-heap merge path it exists to provide. */
  private[graft] def candidateBlocks(s: SparkSession, d: String): Int = {
    val bytes = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), col("label"))
      .queryExecution.optimizedPlan.stats.sizeInBytes
    val budget = s.conf.getOption(BlockBytesConf).map(_.toLong)
      .getOrElse(DefaultBlockBytes)
    ((bytes + budget - 1) / budget).min(4096).max(2).toInt
  }

  /** The non-broadcast layout: when the candidate set is too large to
    * broadcast, both sides partition and Spark's CartesianProduct runs
    * partition-pair-wise (block-nested-loop) products; `top_k_by` then
    * reduces each (query, candidate-block) to k rows map-side and merges
    * the per-block partial heaps in one k-row-per-query shuffle. Same
    * results, same oracle — only the physical layout differs, and the
    * block count follows the data size ([[candidateBlocks]]), not a
    * constant. */
  def knnTopkBlocked(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val p = Tables.parallelism(s)
    val q = e.repartition(p)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = e.repartition(candidateBlocks(s, d))
      .select(col("vec_id").as("cid"), col("embedding").as("cv"),
        col("label").as("clabel"))
    // SHUFFLE_REPLICATE_NL forbids the broadcast fallback the optimizer
    // would otherwise pick at test scale, forcing the true block layout.
    val pr = q.hint("shuffle_replicate_nl").crossJoin(c)
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("clabel"),
        graft.functions.VectorExpressions
          .cosine_distance(s, col("qv"), col("cv")).as("dist"))
    pr.groupBy(col("qid"))
      .agg(graft.functions.TopKAgg
        .top_k_by(s, col("dist"), col("cid"), col("clabel"), K).as("nbrs"))
      .select(col("qid"), posexplode(col("nbrs")).as(Seq("pos", "nbr")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rnk"),
        col("nbr.id").as("cid"), round(col("nbr.dist"), 6).as("dist"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** A5b: rank-weighted (Borda-count) vote — neighbor at rank r
    * contributes weight K-r+1. Integer weights keep the vote exactly
    * engine-portable (1/d weights would be order-dependent float sums). */
  def knnClassifyWeighted(s: SparkSession, d: String): DataFrame = {
    val votes = topkRankedShared(s, d)
      .groupBy(col("qid"), col("clabel"))
      .agg(sum(lit(K + 1) - col("rnk")).as("w"))
    val wv = Window.partitionBy(col("qid")).orderBy(col("w").desc, col("clabel").asc)
    votes.withColumn("vr", row_number().over(wv)).where(col("vr") === 1)
      .select(col("qid"), col("clabel").as("pred"))
      .orderBy(col("qid"))
  }

  /** A6c: per-class precision/recall/F1 derived from the confusion
    * matrix — integer counts, single-division ratios. */
  def knnPrf(s: SparkSession, d: String): DataFrame = {
    val truth = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    val joined = knnClassify(s, d).join(truth, col("qid") === col("vec_id"))
    val perPred = joined.groupBy(col("pred").as("cls"))
      .agg(count(lit(1)).as("n_pred"),
        sum(when(col("pred") === col("label"), 1L).otherwise(0L)).as("tp"))
    val perTruth = joined.groupBy(col("label").as("cls2"))
      .agg(count(lit(1)).as("n_truth"))
    perPred.join(perTruth, col("cls") === col("cls2"), "full")
      .select(
        coalesce(col("cls"), col("cls2")).as("cls"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"))
      .withColumn("precision",
        round(col("tp").cast("double") / greatest(col("n_pred"), lit(1L)), 6))
      .withColumn("recall",
        round(col("tp").cast("double") / greatest(col("n_truth"), lit(1L)), 6))
      .withColumn("f1", round(
        lit(2.0) * col("tp") / greatest(col("n_pred") + col("n_truth"), lit(1L)), 6))
      .orderBy(col("cls"))
  }

  /** A6b: confusion matrix of the leave-one-out classifier. */
  def knnConfusion(s: SparkSession, d: String): DataFrame = {
    val truth = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    knnClassify(s, d).join(truth, col("qid") === col("vec_id"))
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"), col("pred"))
  }

  /** e04: the same exact-KNN semantics expressed ENTIRELY through the SQL
    * front end — temp view + a SQL string calling the injected codegen'd
    * `cosine_distance` — proving a SQL-only user of the library gets the
    * identical plan and results as the Column-API surface (restricted to
    * 50 query vectors to keep it a smoke-sized pair space). */
  def sqlKnn(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    Tables.embeddings(s, d).where(col("vec_id") < 50)
      .createOrReplaceTempView("graft_sql_emb")
    s.sql("""
      WITH pairs AS (
        SELECT q.vec_id AS qid, c.vec_id AS cid,
               cosine_distance(q.embedding, c.embedding) AS dist
        FROM graft_sql_emb q CROSS JOIN graft_sql_emb c
        WHERE q.vec_id <> c.vec_id),
      ranked AS (
        SELECT qid, cid, dist,
          row_number() OVER (PARTITION BY qid ORDER BY dist ASC, cid ASC)
            AS rnk
        FROM pairs)
      SELECT qid, rnk, cid, round(dist, 6) AS dist
      FROM ranked WHERE rnk <= 3 ORDER BY qid, rnk""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e04_sql_knn" -> (sqlKnn _),
    "knn_topk_agg" -> (knnTopkAgg _),
    "knn_topk_blocked" -> (knnTopkBlocked _),
    "knn_confusion" -> (knnConfusion _),
    "knn_classify_weighted" -> (knnClassifyWeighted _),
    "knn_prf" -> (knnPrf _),
    "knn_topk" -> (knnTopk _),
    "knn_classify" -> (knnClassify _),
    "knn_accuracy" -> (knnAccuracy _),
    "knn_ksweep" -> (knnKSweep _),
    "knn_regression" -> (knnRegression _),
    "knn_radius" -> (knnRadius _),
    "knn_topk_l2" -> (knnTopkL2 _),
  )

  private[ops] val cosPairs =
    """SELECT q.vec_id AS qid, c.vec_id AS cid, c.label AS clabel,
      |       1.0 - list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                    CAST(c.embedding AS DOUBLE[])) AS dist
      |FROM embeddings q CROSS JOIN embeddings c
      |WHERE q.vec_id <> c.vec_id""".stripMargin

  // shared oracle scaffolding: ranked neighbors and plain majority pred
  private def rankedCte = s"""ranked AS (SELECT qid, cid, clabel, dist,
    |  row_number() OVER (PARTITION BY qid ORDER BY dist ASC, cid ASC) AS rnk
    |  FROM pairs)""".stripMargin
  // ONE vote-pipeline CTE builder (suffix-parameterized so the k-sweep
  // can instantiate it per k) — the oracle mirror of classifyAt.
  private def voteCtes(k: Int, sfx: String) =
    s"""votes$sfx AS (SELECT qid, clabel, count(*) AS n
       |  FROM ranked WHERE rnk <= $k GROUP BY qid, clabel),
       |pred$sfx AS (SELECT qid, clabel AS pred FROM (
       |  SELECT qid, clabel,
       |    row_number() OVER (PARTITION BY qid ORDER BY n DESC, clabel ASC) AS vr
       |  FROM votes$sfx) WHERE vr = 1)""".stripMargin
  private def predCte = voteCtes(K, "")

  val oracles: Map[String, String] = Map(
    "knn_classify_weighted" ->
      s"""WITH pairs AS ($cosPairs),
         |$rankedCte,
         |votes AS (SELECT qid, clabel, sum(${K + 1} - rnk) AS w
         |  FROM ranked WHERE rnk <= $K GROUP BY qid, clabel)
         |SELECT qid, clabel AS pred FROM (
         |  SELECT qid, clabel,
         |    row_number() OVER (PARTITION BY qid ORDER BY w DESC, clabel ASC) AS vr
         |  FROM votes) WHERE vr = 1 ORDER BY qid""".stripMargin,
    "knn_prf" ->
      s"""WITH pairs AS ($cosPairs),
         |$rankedCte,
         |$predCte,
         |j AS (SELECT p.qid, p.pred, e.label
         |  FROM pred p JOIN embeddings e ON p.qid = e.vec_id),
         |per_pred AS (SELECT pred AS cls, count(*) AS n_pred,
         |  sum(CASE WHEN pred = label THEN 1 ELSE 0 END) AS tp
         |  FROM j GROUP BY pred),
         |per_truth AS (SELECT label AS cls2, count(*) AS n_truth FROM j GROUP BY label)
         |SELECT coalesce(cls, cls2) AS cls,
         |  CAST(coalesce(tp, 0) AS BIGINT) AS tp,
         |  CAST(coalesce(n_pred, 0) AS BIGINT) AS n_pred,
         |  CAST(coalesce(n_truth, 0) AS BIGINT) AS n_truth,
         |  round(CAST(coalesce(tp, 0) AS DOUBLE) / greatest(coalesce(n_pred, 0), 1), 6) AS precision,
         |  round(CAST(coalesce(tp, 0) AS DOUBLE) / greatest(coalesce(n_truth, 0), 1), 6) AS recall,
         |  round(2.0 * coalesce(tp, 0) / greatest(coalesce(n_pred, 0) + coalesce(n_truth, 0), 1), 6) AS f1
         |FROM per_pred FULL JOIN per_truth ON cls = cls2
         |ORDER BY cls""".stripMargin,
    "knn_topk_blocked" ->
      s"""WITH pairs AS ($cosPairs),
         |ranked AS (SELECT qid, cid, dist,
         |  row_number() OVER (PARTITION BY qid ORDER BY dist ASC, cid ASC) AS rnk
         |  FROM pairs)
         |SELECT qid, rnk, cid, round(dist, 6) AS dist
         |FROM ranked WHERE rnk <= $K ORDER BY qid, rnk""".stripMargin,
    "knn_confusion" ->
      s"""WITH pairs AS ($cosPairs),
         |ranked AS (SELECT qid, cid, clabel, dist,
         |  row_number() OVER (PARTITION BY qid ORDER BY dist ASC, cid ASC) AS rnk
         |  FROM pairs),
         |votes AS (SELECT qid, clabel, count(*) AS n
         |  FROM ranked WHERE rnk <= $K GROUP BY qid, clabel),
         |pred AS (SELECT qid, clabel AS pred FROM (
         |  SELECT qid, clabel,
         |    row_number() OVER (PARTITION BY qid ORDER BY n DESC, clabel ASC) AS vr
         |  FROM votes) WHERE vr = 1)
         |SELECT e.label, p.pred, count(*) AS n
         |FROM pred p JOIN embeddings e ON p.qid = e.vec_id
         |GROUP BY e.label, p.pred ORDER BY e.label, p.pred""".stripMargin,
    "knn_topk_agg" ->
      s"""WITH pairs AS ($cosPairs),
         |ranked AS (SELECT qid, cid, dist,
         |  row_number() OVER (PARTITION BY qid ORDER BY dist ASC, cid ASC) AS rnk
         |  FROM pairs)
         |SELECT qid, rnk, cid, round(dist, 6) AS dist
         |FROM ranked WHERE rnk <= $K ORDER BY qid, rnk""".stripMargin,
    "knn_topk" ->
      s"""WITH pairs AS ($cosPairs),
         |ranked AS (SELECT qid, cid, dist,
         |  row_number() OVER (PARTITION BY qid ORDER BY dist ASC, cid ASC) AS rnk
         |  FROM pairs)
         |SELECT qid, rnk, cid, round(dist, 6) AS dist
         |FROM ranked WHERE rnk <= $K ORDER BY qid, rnk""".stripMargin,
    "e04_sql_knn" ->
      """WITH pairs AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid,
        |    1.0 - list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                 CAST(c.embedding AS DOUBLE[])) AS dist
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id <> c.vec_id AND q.vec_id < 50 AND c.vec_id < 50),
        |ranked AS (SELECT qid, cid, dist,
        |  row_number() OVER (PARTITION BY qid ORDER BY dist ASC, cid ASC) AS rnk
        |  FROM pairs)
        |SELECT qid, rnk, cid, round(dist, 6) AS dist
        |FROM ranked WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,
    "knn_classify" ->
      s"""WITH pairs AS ($cosPairs),
         |ranked AS (SELECT qid, cid, clabel, dist,
         |  row_number() OVER (PARTITION BY qid ORDER BY dist ASC, cid ASC) AS rnk
         |  FROM pairs),
         |votes AS (SELECT qid, clabel, count(*) AS n
         |  FROM ranked WHERE rnk <= $K GROUP BY qid, clabel)
         |SELECT qid, clabel AS pred FROM (
         |  SELECT qid, clabel,
         |    row_number() OVER (PARTITION BY qid ORDER BY n DESC, clabel ASC) AS vr
         |  FROM votes) WHERE vr = 1 ORDER BY qid""".stripMargin,
    "knn_accuracy" ->
      s"""WITH pairs AS ($cosPairs),
         |ranked AS (SELECT qid, cid, clabel, dist,
         |  row_number() OVER (PARTITION BY qid ORDER BY dist ASC, cid ASC) AS rnk
         |  FROM pairs),
         |votes AS (SELECT qid, clabel, count(*) AS n
         |  FROM ranked WHERE rnk <= $K GROUP BY qid, clabel),
         |pred AS (SELECT qid, clabel AS pred FROM (
         |  SELECT qid, clabel,
         |    row_number() OVER (PARTITION BY qid ORDER BY n DESC, clabel ASC) AS vr
         |  FROM votes) WHERE vr = 1)
         |SELECT round(avg(CASE WHEN p.pred = e.label THEN 1.0 ELSE 0.0 END), 6)
         |  AS accuracy
         |FROM pred p JOIN embeddings e ON p.qid = e.vec_id""".stripMargin,
    "knn_ksweep" -> {
      val perK = Seq(1, 3, 5, 10).map { k =>
        s"""${voteCtes(k, s"_$k")},
           |acc_$k AS (SELECT $k AS k, CAST(count(*) AS BIGINT) AS n_queries,
           |  round(avg(CASE WHEN p.pred = e.label THEN 1.0 ELSE 0.0 END), 6)
           |    AS accuracy
           |  FROM pred_$k p JOIN embeddings e ON p.qid = e.vec_id)"""
          .stripMargin
      }.mkString(",\n")
      val union = Seq(1, 3, 5, 10).map(k => s"SELECT * FROM acc_$k")
        .mkString(" UNION ALL ")
      s"""WITH pairs AS ($cosPairs),
         |ranked AS (SELECT qid, cid, clabel, dist,
         |  row_number() OVER (PARTITION BY qid ORDER BY dist ASC, cid ASC) AS rnk
         |  FROM pairs),
         |$perK
         |$union ORDER BY k""".stripMargin
    },
    "knn_regression" ->
      s"""WITH pairs AS ($cosPairs),
         |ranked AS (SELECT qid, cid, clabel, dist,
         |  row_number() OVER (PARTITION BY qid ORDER BY dist ASC, cid ASC) AS rnk
         |  FROM pairs),
         |agg AS (SELECT qid,
         |    CAST(sum(clabel) AS DOUBLE) / count(*) AS pred
         |  FROM ranked WHERE rnk <= $K GROUP BY qid)
         |SELECT a.qid, round(a.pred, 6) AS pred,
         |  round(abs(a.pred - e.label), 6) AS abs_err
         |FROM agg a JOIN embeddings e ON a.qid = e.vec_id
         |ORDER BY a.qid""".stripMargin,
    "knn_radius" ->
      s"""WITH pairs AS ($cosPairs)
         |SELECT qid, cid, round(dist, 6) AS dist FROM pairs
         |WHERE dist < $RadiusTau ORDER BY qid, cid""".stripMargin,
    "knn_topk_l2" ->
      """WITH pairs AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid,
        |         list_distance(CAST(q.embedding AS DOUBLE[]),
        |                       CAST(c.embedding AS DOUBLE[])) AS dist
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id <> c.vec_id),
        |ranked AS (SELECT qid, cid, dist,
        |  row_number() OVER (PARTITION BY qid ORDER BY dist ASC, cid ASC) AS rnk
        |  FROM pairs)
        |SELECT qid, rnk, cid, round(dist, 6) AS dist
        |FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
  )
}
