package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality validation — the constraint-audit layer every warehouse
  * and every training-data pipeline runs before consuming a drop
  * (dbt-test / Great-Expectations shape): each rule is a declarative
  * predicate whose VIOLATIONS are counted, and the suite emits one row
  * per rule. Rules are deliberately heterogeneous so the operator
  * exercises the full audit vocabulary: referential integrity
  * (anti-join), key uniqueness (count vs distinct), domain/range checks
  * (predicate counts), non-null/non-empty, and freshness bounds.
  *
  * Scale shape: every rule is either a map-side predicate count (one
  * partial-agg scan) or a single keyed anti-join/distinct — no rule is
  * quadratic, and independent rules run as independent jobs a scheduler
  * can overlap. The one-row-per-rule output is the contract dashboards
  * and CI gates consume.
  */
object Quality {

  private def rule(name: String, checked: DataFrame, violations: DataFrame) = {
    val n = checked.agg(count(lit(1)).as("n_checked"))
    val v = violations.agg(count(lit(1)).as("n_violations"))
    n.crossJoin(v).select(
      lit(name).as("rule"),
      col("n_checked"), col("n_violations"),
      when(col("n_violations") === 0, 1).otherwise(0).as("passed"))
  }

  /** q01: the constraint suite over the star schema + corpus tables. */
  def constraintChecks(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val lineitem = Tables.lineitem(s, d)
    val customer = Tables.customer(s, d)
    val documents = Tables.documents(s, d)
    val events = Tables.events(s, d)

    val fkLineOrder = rule("fk_lineitem_orders",
      lineitem.select(col("l_orderkey")),
      lineitem.select(col("l_orderkey"))
        .join(orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti"))
    val fkOrderCust = rule("fk_orders_customer",
      orders.select(col("o_custkey")),
      orders.select(col("o_custkey"))
        .join(customer.select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti"))
    val pkOrders = rule("pk_orders_unique",
      orders.select(col("o_orderkey")),
      orders.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
        .where(col("c") > 1))
    val qtyRange = rule("range_quantity_1_50",
      lineitem.select(col("l_quantity")),
      lineitem.where(col("l_quantity") < 1 || col("l_quantity") > 50))
    val docText = rule("nonempty_document_text",
      documents.select(col("text")),
      documents.where(col("text").isNull || length(col("text")) === 0))
    val tsBounds = rule("events_ts_in_2024_01",
      events.select(col("ts")),
      events.where(col("ts") < lit("2024-01-01 00:00:00").cast("timestamp") ||
        col("ts") >= lit("2024-02-01 00:00:00").cast("timestamp")))
    val discountDomain = rule("domain_discount_0_0q1",
      lineitem.select(col("l_discount")),
      lineitem.where(col("l_discount") < 0 || col("l_discount") > 0.1))

    // A rule that legitimately FAILS on this corpus at every fixture
    // tier (bag-of-words duplicates — the same key c21's incremental
    // dedup keys on), so the suite exercises the violation path, not
    // only green checks: each extra copy beyond a group's first counts
    // as one violation.
    val bow = array_join(array_sort(array_distinct(split(col("text"), " "))), " ")
    val docUnique = rule("unique_document_bow",
      documents.select(col("text")),
      documents.groupBy(bow.as("t"))
        .agg((count(lit(1)) - 1).as("extra")).where(col("extra") > 0)
        .select(explode(sequence(lit(1), col("extra")))))

    Seq(fkLineOrder, fkOrderCust, pkOrders, qtyRange, docText, tsBounds,
        discountDomain, docUnique)
      .reduce(_.unionAll(_))
      .orderBy(col("rule"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_constraints" -> (constraintChecks _))

  // passed derives from the counted value inside a subquery so the
  // (possibly expensive) violations query evaluates ONCE per rule —
  // DuckDB does not CSE repeated uncorrelated scalar subqueries.
  private def ruleSql(name: String, checked: String, violations: String) =
    s"""SELECT rule, n_checked, n_violations,
       |  CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS passed
       |FROM (SELECT '$name' AS rule,
       |  (SELECT CAST(count(*) AS BIGINT) FROM ($checked)) AS n_checked,
       |  (SELECT CAST(count(*) AS BIGINT) FROM ($violations))
       |    AS n_violations)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q01_constraints" -> Seq(
      // NOT EXISTS, not NOT IN: the Spark side is a left_anti join, and
      // NOT IN over a set containing NULL is never true (the b26 trap) —
      // the two halves must share anti-join NULL semantics.
      ruleSql("fk_lineitem_orders",
        "SELECT l_orderkey FROM lineitem",
        """SELECT l_orderkey FROM lineitem l
          |WHERE NOT EXISTS (SELECT 1 FROM orders o
          |                  WHERE o.o_orderkey = l.l_orderkey)"""
          .stripMargin),
      ruleSql("fk_orders_customer",
        "SELECT o_custkey FROM orders",
        """SELECT o_custkey FROM orders r
          |WHERE NOT EXISTS (SELECT 1 FROM customer c
          |                  WHERE c.c_custkey = r.o_custkey)"""
          .stripMargin),
      ruleSql("pk_orders_unique",
        "SELECT o_orderkey FROM orders",
        """SELECT o_orderkey FROM orders
          |GROUP BY o_orderkey HAVING count(*) > 1""".stripMargin),
      ruleSql("range_quantity_1_50",
        "SELECT l_quantity FROM lineitem",
        "SELECT l_quantity FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50"),
      ruleSql("nonempty_document_text",
        "SELECT text FROM documents",
        "SELECT text FROM documents WHERE text IS NULL OR length(text) = 0"),
      // second-floored twin (EventOps.duckSecTs) like every other events
      // oracle: the bounds are whole-second-aligned today (so raw-ns
      // comparison would coincide), but the rule must stay faithful to
      // the ts the Spark side actually surfaces
      ruleSql("events_ts_in_2024_01",
        "SELECT ts FROM events",
        s"""SELECT sts FROM (
           |  SELECT ${EventOps.duckSecTs} AS sts FROM events)
           |WHERE sts < TIMESTAMP '2024-01-01 00:00:00'
           |   OR sts >= TIMESTAMP '2024-02-01 00:00:00'""".stripMargin),
      ruleSql("domain_discount_0_0q1",
        "SELECT l_discount FROM lineitem",
        "SELECT l_discount FROM lineitem WHERE l_discount < 0 OR l_discount > 0.1"),
      ruleSql("unique_document_bow",
        "SELECT text FROM documents",
        """SELECT unnest(range(1, CAST(extra AS INTEGER) + 1)) FROM (
          |  SELECT count(*) - 1 AS extra FROM documents
          |  GROUP BY array_to_string(list_sort(list_distinct(
          |    string_split(text, ' '))), ' ')
          |  HAVING count(*) > 1)""".stripMargin))
      .map(r => s"($r)").mkString("", "\nUNION ALL\n", "\nORDER BY rule"))
}
