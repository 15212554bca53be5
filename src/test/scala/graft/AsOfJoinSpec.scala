package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOfDataFrame

/** Native as-of join operator (plans.AsOfJoinPlan/Exec): physical-plan
  * shape, equivalence with the composed formulations, and edge-case
  * semantics on a hand fixture. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def asof(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    AsOfDataFrame.asofJoin(l, r, "k", "rk", "t", "rt")

  private lazy val left = Seq(
    (1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"),
    (2L, 50L, "d"), // key with no right rows at all
    (3L, 10L, "e"), // key whose right rows are all in the future
  ).toDF("k", "t", "tag")
  private lazy val right = Seq(
    (1L, 10L, "r10"), (1L, 15L, "r15"), (1L, 99L, "r99"),
    (3L, 11L, "r11"),
    (4L, 1L, "r1"), // right-only key
  ).toDF("rk", "rt", "rtag")

  test("merge semantics: latest right row at or before each left time") {
    val out = asof(left, right)
      .select($"k", $"t", $"tag", $"rtag")
      .orderBy($"k", $"t").as[(Long, Long, String, Option[String])].collect()
    assert(out === Seq(
      (1L, 5L, "c", None), // before any right row
      (1L, 10L, "a", Some("r10")), // inclusive <=
      (1L, 20L, "b", Some("r15")), // latest of {r10, r15}
      (2L, 50L, "d", None), // unmatched key
      (3L, 10L, "e", None), // right rows exist but only in the future
    ))
  }

  test("null keys and null times never match") {
    val l = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "nullkey"),
      (Some(1L), None, "nulltime")).toDF("k", "t", "tag")
    val r = Seq((Some(1L), Some(5L), "r5"), (Some(1L), None, "rnull"))
      .toDF("rk", "rt", "rtag")
    val out = asof(l, r).select($"tag", $"rtag").orderBy($"tag")
      .as[(String, Option[String])].collect()
    assert(out === Seq(("a", Some("r5")), ("nullkey", None), ("nulltime", None)))
  }

  test("coercible type mismatches widen with explicit casts (int key vs long, date time vs timestamp)") {
    // int32 key + date time on the left, int64 key + timestamp time on
    // the right: the analyzer-style widening in AsOfDataFrame must cast
    // (int→long, date→timestamp) instead of failing the plan's require.
    val l = Seq((1, "2024-01-02", "a"), (1, "2024-01-05", "b"), (2, "2024-01-02", "c"))
      .toDF("k0", "d", "tag")
      .select($"k0".as("k"), to_date($"d").as("t"), $"tag")
    val r = Seq((1L, "2024-01-01 12:00:00", "r1"), (1L, "2024-01-04 00:00:00", "r4"))
      .toDF("rk", "ts", "rtag")
      .select($"rk", to_timestamp($"ts").as("rt"), $"rtag")
    val out = asof(l, r).select($"tag", $"rtag").orderBy($"tag")
      .as[(String, Option[String])].collect()
    // date 2024-01-02 casts to midnight, so r1 (noon 01-01) precedes it;
    // 2024-01-05 midnight sees r4; key 2 never matches
    assert(out === Seq(("a", Some("r1")), ("b", Some("r4")), ("c", None)))
  }

  test("incompatible types fail with a named error") {
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val r = Seq((Array(1L), 5L, "r")).toDF("rk", "rt", "rtag")
    val e = intercept[IllegalArgumentException](asof(l, r).collect())
    assert(e.getMessage.contains("incompatible key types"), e.getMessage)
  }

  test("plan: AsOfJoinExec with exchange + sort inserted per side") {
    val plan = asof(left, right).queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    // EnsureRequirements must satisfy the declared distribution/ordering
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort ["), plan)
  }

  test("d12 native as-of equals d06 range-join and d06b union-window forms") {
    val native = ops.EventOps.asofNative(spark, sf0001).collect().toSeq
    assert(native === ops.EventOps.asofJoin(spark, sf0001).collect().toSeq)
    assert(native === ops.EventOps.asofUnion(spark, sf0001).collect().toSeq)
  }
}
