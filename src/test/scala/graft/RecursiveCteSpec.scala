package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** SQL:1999 recursive CTEs in Spark (e06) — the probe that justified
  * sharing ONE query text between the engine and the DuckDB oracle. */
class RecursiveCteSpec extends SparkSpec {

  test("WITH RECURSIVE runs a bounded closure") {
    val out = spark.sql(
      """WITH RECURSIVE seq(n) AS (
        |  SELECT 1
        |  UNION ALL
        |  SELECT n + 1 FROM seq WHERE n < 5)
        |SELECT sum(n) AS s FROM seq""".stripMargin)
      .head().getLong(0)
    assert(out == 15L)
  }

  test("e06: hop bounds, edge consistency, and path counts") {
    val r = Graph.tradeReach(spark, sf0001).cache()
    // hop depth is bounded by the recursion guard and 1-hop rows are
    // exactly the out-degree-3 principal-partner edge list
    assert(r.where(col("min_hops") < 1 || col("min_hops") > 3).count() == 0)
    val oneHop = r.where(col("min_hops") === 1).count()
    val nations = Tables.nation(spark, sf0001).count()
    assert(oneHop == nations * 3, s"$oneHop 1-hop rows for $nations nations")
    // a (src,dst) at min_hops=h has at least one path and no self rows
    assert(r.where(col("n_paths") < 1).count() == 0)
    assert(r.where(col("src") === col("dst")).count() == 0)
    r.unpersist()
  }
}
