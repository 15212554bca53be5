package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query/oracle maps from graft.ops.* .
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A1→A5: exact 10-NN cosine classification of every embedding,
    * leave-one-out — the reference's whole pipeline in one query. */
  def entry(spark: SparkSession): DataFrame =
    ops.Knn.knnClassify(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Knn.queries ++ ops.Relational.queries ++ ops.TextOps.queries ++
      ops.EventOps.queries ++ ops.Ann.queries ++ ops.Nsw.queries ++
      ops.Multimodal.queries ++
      ops.Sampling.queries ++ ops.Pipeline.queries ++ ops.Graph.queries ++
      ops.Quality.queries ++ sources.Sources.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Knn.oracles ++ ops.Relational.oracles ++ ops.TextOps.oracles ++
      ops.EventOps.oracles ++ ops.Ann.oracles ++ ops.Nsw.oracles ++
      ops.Multimodal.oracles ++
      ops.Sampling.oracles ++ ops.Pipeline.oracles ++ ops.Graph.oracles ++
      ops.Quality.oracles ++ sources.Sources.oracles
}
