package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Centralized table access for the test corpus
  * (`$sfDir/<table>.parquet`, see TESTDATA.md / FIXTURES.md).
  *
  * Scale notes (100 TB design): every reader returns a plain lazy
  * DataFrame so Catalyst predicate pushdown / column pruning reach the
  * parquet scan untouched. On a real cluster these would be partitioned
  * directories (e.g. lineitem partitioned by ship month) and the same
  * code would get partition pruning for free — nothing here assumes a
  * single file except `repartitioned`, which papers over the local
  * fixture's single-row-group layout.
  */
object Tables {
  def region(s: SparkSession, d: String): DataFrame   = s.read.parquet(s"$d/region.parquet")
  def nation(s: SparkSession, d: String): DataFrame   = s.read.parquet(s"$d/nation.parquet")
  def customer(s: SparkSession, d: String): DataFrame = s.read.parquet(s"$d/customer.parquet")
  def supplier(s: SparkSession, d: String): DataFrame = s.read.parquet(s"$d/supplier.parquet")
  def part(s: SparkSession, d: String): DataFrame     = s.read.parquet(s"$d/part.parquet")
  def orders(s: SparkSession, d: String): DataFrame   = s.read.parquet(s"$d/orders.parquet")
  def lineitem(s: SparkSession, d: String): DataFrame = s.read.parquet(s"$d/lineitem.parquet")
  def documents(s: SparkSession, d: String): DataFrame = s.read.parquet(s"$d/documents.parquet")
  def embeddings(s: SparkSession, d: String): DataFrame = s.read.parquet(s"$d/embeddings.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS); Spark 4 rejects it unless
    * the legacy conf maps it to long. We read nanos-as-long and surface
    * `ts` floored to WHOLE SECONDS (every events oracle rebuilds exactly
    * this second-precision value — see EventOps). The raw nanos stay
    * available as `ts_ns` for tie-breaking.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$d/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      // exact integer floor to seconds (double division would round and
      // could disagree with the oracle's truncation near boundaries)
      .withColumn("ts", timestamp_seconds(expr("ts_ns div 1000000000")))
  }

  /** Default parallelism for explicit repartitions. Single-file parquet
    * fixtures arrive as 1 input partition, which would serialize any
    * heavy downstream operator (measured 63 s vs 17.5 s on the KNN
    * cross-join, BASELINE.md). On a real cluster the scan itself is
    * already split, so this is a no-op-ish rebalance, not a bottleneck.
    */
  def parallelism(s: SparkSession): Int =
    s.sparkContext.defaultParallelism.max(4)

  /** Rebalance a (possibly single-partition) scan across the cluster. */
  def repartitioned(df: DataFrame, s: SparkSession): DataFrame =
    df.repartition(parallelism(s))
}
