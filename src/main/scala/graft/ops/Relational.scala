package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational / OLAP surface over the TPC-H-ish star schema
  * (SURVEY.md §2.B). All plans are declarative DataFrame expressions, so
  * Catalyst provides predicate pushdown, column pruning, and join
  * selection; the only hand-made physical decisions are `broadcast()` on
  * dimension tables (≤20k rows at every SF — and at 100 TB a dimension
  * that no longer fits the broadcast threshold simply falls back to a
  * shuffled join by removing the hint).
  *
  * Engine-parity rules used throughout (see SURVEY.md §2 determinism):
  *  - Money sums go through exact DECIMAL casts: the generated prices are
  *    exact 2-decimal values, so `CAST(x AS DECIMAL(p,2))` is lossless and
  *    decimal aggregation is order-independent integer arithmetic —
  *    bitwise identical in Spark and DuckDB. Plain double sums differ at
  *    ~1e-5 across summation orders (measured), which breaks 6-dp hashing.
  *  - Averages are spelled `CAST(exact_sum AS DOUBLE)/count` — one
  *    double division, identical on both engines.
  *  - Scalar-function showcases aggregate with min/max (order-independent)
  *    rather than sums of irrational doubles.
  *  - Every output is totally ordered with a unique-key tie-break.
  */
object Relational {

  // Exact lossless money arithmetic (prices < 1e7, 2-decimal).
  private val decPrice = "CAST(l_extendedprice AS DECIMAL(9,2))"
  private val decDisc  = "(1 - CAST(l_discount AS DECIMAL(3,2)))"
  private val decTax   = "(1 + CAST(l_tax AS DECIMAL(3,2)))"
  // Decimal-sum → double policy (SURVEY §8 entry 32, found at the sf1
  // rehearsal): CAST(decimal AS DOUBLE) is exact only while the sum
  // stays below 2^53 scale-units; past that, Spark's
  // BigDecimal.doubleValue and DuckDB's value·10⁻ˢ double-rounding can
  // disagree by one ulp. Every scale-4 revenue sum (price·(1−disc),
  // the family that crosses next at ~sf10-100) and the scale-6
  // sum_charge therefore convert through explicit integer scale-units
  // — CAST(sum·10^s AS BIGINT) AS DOUBLE, then ONE division — the
  // identical IEEE sequence on both engines at any magnitude, and
  // bit-equal to the plain cast below 2^53. Scale-2 sums keep the
  // plain cast (3 more orders of headroom); the true unbounded-scale
  // form emits DECIMAL.

  /** B1/B2: scan + projection + predicate pushdown. The filter and the
    * 4-column projection both reach the parquet scan (PushedFilters /
    * ReadSchema in explain). */
  def scanFilter(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
             col("l_shipdate") <  lit("1996-02-01").cast("timestamp") &&
             col("l_quantity") >= 47)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** B3: broadcast-hash star join — revenue per nation. Dims broadcast;
    * the fact side streams. */
  def joinBroadcast(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        expr("CAST(sum(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE)").as("total"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** B4: large-large equi-join (lineitem ⋈ orders). Above the broadcast
    * threshold Spark plans a shuffled join on the key; AQE handles skew. */
  def joinShuffle(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("l_quantity")).as("sum_qty"), // integral doubles: exact
        expr(s"CAST(CAST(sum($decPrice * $decDisc) * 10000 AS BIGINT) " +
          "AS DOUBLE) / 10000.0").as("revenue"))
      .orderBy(col("o_orderpriority"))

  /** B34: composed TPC-H Q5/Q9-shape flagship — the full star topology
    * in ONE query: lineitem fact filtered on shipdate (pushed to the
    * scan), four broadcast dimension hops (part, supplier → nation →
    * region) with selective predicates on both dimension arms, a grouped
    * revenue aggregate, and a deterministic top-10. The join primitives
    * (b03–b06) are graded separately; this composes them the way a real
    * OLAP user does, exercising join ordering + AQE end-to-end. The plan
    * contract (asserted in RelationalSpec): every dimension broadcasts,
    * the only shuffle is the final partial→final aggregate exchange, and
    * the fact table never materializes outside the probe side of the
    * broadcast chain — at 100 TB that is the only shape that works, and
    * removing a hint from a grown dimension degrades gracefully to a
    * shuffled join without touching the query. */
  def starJoin(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
             col("l_shipdate") <  lit("1997-01-01").cast("timestamp"))
    val p = Tables.part(s, d).where(col("p_size") <= 25)
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d).where(col("r_name").isin("ASIA", "EUROPE"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"), col("p_brand"))
      .agg(
        count(lit(1)).as("n_lines"),
        expr(s"CAST(CAST(sum($decPrice * $decDisc) * 10000 AS BIGINT) " +
          "AS DOUBLE) / 10000.0").as("revenue"))
      // revenue is a cast of an exact decimal sum, so DESC order is
      // engine-stable; the group key completes the total order
      .orderBy(col("revenue").desc, col("r_name"), col("n_name"),
        col("p_brand"))
      .limit(10)
  }

  /** B38: bloom-prefiltered semi join — Spark's runtime row-level
    * filtering (and every warehouse's "join pushdown") made explicit as
    * a declared, oracle-checked operator. The selective side (orders
    * above a price floor) is summarized into a Bloom filter; the fact
    * scan probes the sketch MAP-SIDE and discards ~the full
    * non-matching volume before the shuffle; the exact semi join then
    * removes the false positives, so the RESULT is exactly the plain
    * semi join (law-tested in RelationalSpec) — the sketch can only
    * change cost, never the answer. At 100 TB this is the difference
    * between shuffling 100 TB of fact rows into the join and shuffling
    * the ~selectivity fraction that can possibly match: the sketch
    * build moves ~KBs to the driver (the same movement as a broadcast
    * build, just lossy-compressed), and the probe is a stateless
    * per-row predicate INSIDE whole-stage codegen: the sketch bytes ride
    * as a binary literal into Spark's native `BloomFilterMightContain`
    * expression (the exact probe InjectRuntimeFilter plants when its
    * creation-side thresholds are met), deserialized once per codegen'd
    * task, so the hot path stays vectorized (plan-asserted in
    * RelationalSpec). The sketch is sized from the orders footer row
    * count — a driver-side metadata read, not a second filtered scan —
    * an upper bound on the inserted keys, so the realized FPP only ever
    * beats the 1% target. */
  def bloomSemi(s: SparkSession, d: String): DataFrame = {
    val keys = Tables.orders(s, d).where(col("o_totalprice") > 400000)
      .select(col("o_orderkey"))
    val expected =
      math.max(1000L, Tables.footerRowCount(s, s"$d/orders.parquet"))
    val bf = keys.stat.bloomFilter("o_orderkey", expected, 0.01)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    graft.functions.Registry.ensure(s, "graft_bloom_might_contain")(exprs =>
      org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)))
    Tables.lineitem(s, d)
      .where(call_function("graft_bloom_might_contain",
        lit(bytes), col("l_orderkey")))
      .join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        expr(s"CAST(CAST(sum($decPrice * $decDisc) * 10000 AS BIGINT) " +
          "AS DOUBLE) / 10000.0").as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  /** B5: left outer join — every customer, including the order-less,
    * counted per nation. */
  def joinLeft(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val n = Tables.nation(s, d)
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_nationkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(when(col("n_orders") === 0, 1).otherwise(0)).as("n_orderless"))
      .orderBy(col("n_name"))
  }

  /** B5b: full outer join — union the per-nation customer census (nations
    * < 15) with the supplier census (nations >= 10). The complementary
    * filters guarantee left-only, matched, and right-only rows, so all
    * three null-production paths of the operator are exercised. Both
    * sides pre-aggregate to ≤25 rows before the join — at scale the
    * full-outer shuffle moves group counts, never base rows. */
  def joinFull(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).where(col("c_nationkey") < 15)
      .groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("n_customers"))
    val sup = Tables.supplier(s, d).where(col("s_nationkey") >= 10)
      .groupBy(col("s_nationkey").as("sk"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(sup, col("ck") === col("sk"), "full_outer")
      .select(coalesce(col("ck"), col("sk")).as("nationkey"),
        col("n_customers"), col("n_suppliers"))
      .orderBy(col("nationkey"))
  }

  /** B6: left anti join — parts never shipped in the first year. */
  def joinAnti(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .join(
        Tables.lineitem(s, d)
          .where(col("l_shipdate") < lit("1996-01-01").cast("timestamp")),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_never_ordered"))
      .orderBy(col("p_brand"))

  /** B6: left semi join — customers with at least one URGENT order. */
  def joinSemi(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).where(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  /** B7: TPC-H Q1-shape hash aggregate — partial (map-side) aggregation
    * then a 6-group final merge; the canonical scale-out aggregate. */
  def aggQ1(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        expr(s"CAST(sum($decPrice) AS DOUBLE)").as("sum_base_price"),
        expr(s"CAST(CAST(sum($decPrice * $decDisc) * 10000 AS BIGINT) " +
          "AS DOUBLE) / 10000.0").as("sum_disc_price"),
        // scale-6 decimal → double through EXPLICIT integer micro-units:
        // below 2^53 µ-units CAST(decimal AS DOUBLE) is exact and the
        // engines agree for free, but the sf1 rehearsal crossed it
        // (sum_charge ≈ 2.75e16 µ-units) and Spark's BigDecimal.doubleValue
        // vs DuckDB's hugeint·10⁻ˢ double-rounding diverged by one ulp.
        // Routing both engines through CAST(µ-units AS BIGINT) AS DOUBLE
        // then ONE division makes the rounding sequence identical at any
        // scale (and bit-equal to the old path below 2^53).
        expr(s"CAST(CAST(sum($decPrice * $decDisc * $decTax) * 1000000 " +
          "AS BIGINT) AS DOUBLE) / 1000000.0").as("sum_charge"),
        expr("round(sum(l_quantity) / count(1), 6)").as("avg_qty"),
        expr(s"round(CAST(sum($decPrice) AS DOUBLE) / count(1), 6)").as("avg_price"),
        expr("round(CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(1), 6)").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** B8: exact distinct + count-distinct. */
  def distinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("nd_parts"),
        countDistinct(col("l_suppkey")).as("nd_supps"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("nd_ps"))
      .orderBy(col("l_returnflag"))

  /** B8b: dropDuplicates on a key subset — the set-semantics dedup
    * operator (deterministic because only the key columns are kept). */
  def dropDup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"))
      .dropDuplicates("l_returnflag", "l_linestatus")
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** B9: approximate distinct (HyperLogLog++). The sketch itself is not
    * portable across engines — DuckDB cannot reproduce Spark's HLL++
    * registers — so the raw estimate can never be hash-compared. What
    * CAN be oracled is the sketch's accuracy contract: the estimate is a
    * deterministic function of the input, so `|approx − exact| / exact ≤
    * tol` is a stable boolean. The query emits the exact count (oracled
    * directly) plus that predicate at tol = 0.05 = 2.5× the requested
    * rsd; the oracle asserts TRUE. A broken HLL (or a silently changed
    * rsd) flips the boolean and fails the hash — no more unexplained
    * `no_oracle` row. At 100 TB the approx form is the only affordable
    * one — fixed-size sketch per group, mergeable map-side; the exact
    * count rides along here only because the fixture is small. */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(
        col("l_returnflag"),
        col("exact_parts"),
        (abs(col("approx_parts").cast("double") - col("exact_parts").cast("double"))
          <= lit(0.05) * col("exact_parts").cast("double")).as("within_tol"))
      .orderBy(col("l_returnflag"))

  /** Sketch size for the KMV distinct estimator (b09b). */
  private[ops] val KmvK = 128

  /** B9b: approximate distinct WITH an exact oracle — the k-minimum-values
    * sketch over the engine's own fnv1a64 hash ([[graft.functions.KmvAgg]]).
    * Unlike HLL (b09) the whole computation is a pure function of the
    * data: the k-th smallest distinct hash per group is order- and
    * partitioning-independent, and the estimate `(k−1)/(f·2⁻⁶⁴ + 0.5)`
    * is three IEEE ops from the same signed integer on both engines, so
    * DuckDB reproduces it bit-for-bit (HUGEINT fnv fold + the identical
    * division). The exact count rides along for error visibility.
    *
    * Scale: one aggregation pass, ≤ k longs of state per group partially
    * aggregated map-side — the affordable distinct at 100 TB, now with a
    * cross-engine-checkable answer. Groups with < k distinct values
    * yield NULL (the sketch cannot fill); consumers fall back to the
    * exact count that is already in the row. */
  def kmvDistinct(s: SparkSession, d: String): DataFrame = {
    // fnv alone is non-uniform on short numeric keys (2× KMV bias
    // measured on 2k keys); the murmur finalizer restores avalanche
    val h = graft.functions.HashExpressions.mix64(s,
      graft.functions.HashExpressions.fnv1a64(
        s, col("l_partkey").cast("string")))
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_partkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).cast("long").as("n_exact"),
        graft.functions.KmvAgg.kmv_kth(s, h, KmvK).as("f"))
      .select(col("l_returnflag"), col("n_exact"),
        round(lit((KmvK - 1).toDouble) /
          (col("f").cast("double") * lit(math.pow(2, -64)) + lit(0.5)), 6)
          .as("kmv_est"))
      .orderBy(col("l_returnflag"))
  }

  /** Sample size for the KMV rank sketch (b35); tests reference it. */
  private[graft] val KmvQK = 256

  /** B35: mergeable quantile sketch WITH an exact oracle — b09b's KMV
    * trick extended from distinct-counting to rank estimation
    * ([[graft.functions.KmvSampleAgg]]). Keeping the k rows whose
    * unique-key hashes are smallest in unsigned order is a uniform
    * deterministic sample per group; the b27 interpolation formula over
    * the sampled values estimates any percentile with rank error
    * O(1/√k). Unlike t-digest/KLL the sketch state is a pure function of
    * the data, so DuckDB reproduces the exact sampled multiset (rank the
    * same fnv+mix64 hashes, take rn ≤ k) and the estimate hash-matches
    * bit-for-bit.
    *
    * Scale: b21/b27 are exact global rank selections — one full window
    * pass over every row. This is the 100-TB form: fixed 4 KB of state
    * per group, partial-aggregated map-side, one tiny final row per
    * group. Groups with ≤ k rows degrade to the exact interpolation
    * (law-tested in KmvSampleSpec: sample ≡ population there). */
  def kmvQuantiles(s: SparkSession, d: String): DataFrame = {
    // hash the unique ROW key, not the value: duplicate values must be
    // sampled independently for the sample to be rank-uniform
    val h = graft.functions.HashExpressions.mix64(s,
      graft.functions.HashExpressions.fnv1a64(
        s, col("o_orderkey").cast("string")))
    val agg = Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_totalprice"), h.as("h"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_exact"),
        graft.functions.KmvSampleAgg.kmv_sample(
          s, col("h"), col("o_totalprice"), KmvQK).as("sample"))
    // b27's interpolation over the k sampled values (already sorted
    // ascending by the aggregate) — array indexing instead of a window
    def est(p: Double, nm: String): Column = {
      val n = size(col("sample"))
      val hh = lit(p) * (n - lit(1)).cast("double")
      val lo = element_at(col("sample"), (floor(hh) + 1).cast("int"))
      val hi = element_at(col("sample"),
        least((floor(hh) + 2).cast("int"), n))
      round(when(hh - floor(hh) === 0, lo)
        .otherwise(lo + (hh - floor(hh)) * (hi - lo)), 6).as(nm)
    }
    agg.select(col("o_orderpriority"), col("n_exact"),
        size(col("sample")).cast("long").as("n_sample"),
        est(0.5, "p50_est"), est(0.9, "p90_est"))
      .orderBy(col("o_orderpriority"))
  }

  /** B44: log-bucketed quantile sketch (the DDSketch shape, Masson et
    * al. VLDB'19) — quantiles with a GUARANTEED relative-error bound
    * from a tiny mergeable histogram, the production alternative to
    * b35's KMV sample when the error bar must be a hard promise.
    * Values (price cents, exact integers) map to bucket (e, m) where
    * e = ⌊log₂ v⌋ via the bit-length of the binary string (exact in
    * both engines — no floating log anywhere) and m = ⌊v·16/2^e⌋ − 16
    * is a 4-bit mantissa refinement: every value in bucket (e, m) lies
    * within a factor 1 + 2⁻⁴ of the bucket's lower bound
    * (16+m)·2^(e−4), i.e. ≤ 6.25 % relative error, independent of the
    * data distribution or scale factor.
    *
    * Mergeability is the 100-TB story and the query exercises it: the
    * histogram is built as PER-MONTH partials then merged by bucket-key
    * sum (the b40 monoid shape — at scale each partition/day/source
    * ships its ≤ few-hundred-row histogram and the merge is a free
    * rollup; a spec law asserts merged ≡ direct). Quantiles q ∈ {.5,
    * .9, .99} read off the cumulative walk: the first bucket whose
    * cumulative count reaches ⌈q·N⌉. Two keyed aggregates + one
    * few-hundred-row window — no sort of the data, no per-value state,
    * constant memory at any scale. */
  def logBucketQuantiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
      .select(expr(s"CAST($decPrice * 100 AS BIGINT)").as("cents"),
        date_format(col("l_shipdate"), "yyyy-MM").as("mon"))
      .withColumn("e", (length(expr("bin(cents)")) - 1).cast("int"))
      .withColumn("m", expr(
        "CAST((cents * 16) DIV shiftleft(CAST(1 AS BIGINT), e) - 16 AS INT)"))
    val part = li.groupBy(col("mon"), col("e"), col("m"))
      .agg(count(lit(1)).as("pn"))
    val hist = part.groupBy(col("e"), col("m")).agg(sum(col("pn")).as("n"))
    val wcum = Window.orderBy(col("e"), col("m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum_n", sum(col("n")).over(wcum))
    val tot = hist.agg(sum(col("n")).as("n_total"))
    val wq = Window.partitionBy(col("q_pm")).orderBy(col("e"), col("m"))
    Seq(500L, 900L, 990L).toDF("q_pm")
      .crossJoin(cum).crossJoin(broadcast(tot))
      .where(col("cum_n") >= expr("(q_pm * n_total + 999) DIV 1000"))
      .withColumn("rn", row_number().over(wq))
      .where(col("rn") === 1)
      .select(col("q_pm"),
        (col("e") * 16 + col("m")).cast("long").as("bucket"),
        col("e").cast("long").as("e"), col("m").cast("long").as("m"),
        // e < 4 (cents < 16) is out of domain for this bucket layout:
        // Spark's shiftleft masks a negative count (count & 63) and
        // would yield garbage SILENTLY — fail loudly instead (TPC-H
        // prices keep cents ≥ ~90000 so the domain holds on fixtures)
        expr("CASE WHEN e >= 4 " +
          "THEN (16 + m) * shiftleft(CAST(1 AS BIGINT), e - 4) " +
          "ELSE raise_error(concat('logBucketQuantiles: value below 16 " +
          "cents is out of the bucket domain (e=', e, ')')) END")
          .as("lb_cents"),
        col("cum_n"), col("n_total"))
      .orderBy(col("q_pm"))
  }

  /** Sample size for the heavy-hitter estimate (b36); tests reference it. */
  private[graft] val HhK = 2048

  /** B36: heavy hitters (frequent items) from the deterministic uniform
    * sample — the third member of the KMV sketch family (b09b distinct
    * count, b35 quantiles, now frequency). The top actors by event
    * volume are estimated WITHOUT a full-stream aggregation: keep the
    * [[HhK]] events whose unique-key hashes are smallest in unsigned
    * order (a uniform sample, pure function of the data), count each
    * actor's sample hits, and scale by N/k in exact integer arithmetic
    * — (hits·N) DIV k. Space-Saving/Misra-Gries state depends on arrival
    * order, so it could never be hash-checked cross-engine; the
    * hash-sample estimator is order-free, mergeable, and carries the
    * same O(1/√k) relative-error guarantee for items above the sampling
    * fraction. The exact count rides along for the error audit (the
    * oracle recomputes BOTH sides identically).
    *
    * Scale: the sketch is one fixed-size aggregate (4 KB of state,
    * partial map-side combine); the per-item counting then happens on k
    * rows, not N. At 100 TB the exact join-back would be dropped and the
    * estimate alone shipped — it is kept here because auditing the
    * estimator against truth is the point of the declared query. */
  def sampledHeavyHitters(s: SparkSession, d: String): DataFrame = {
    val h = graft.functions.HashExpressions.mix64(s,
      graft.functions.HashExpressions.fnv1a64(
        s, col("event_id").cast("string")))
    val ev = Tables.events(s, d)
    val agg = ev
      .select(col("user_id").cast("double").as("uv"), h.as("h"))
      .agg(count(lit(1)).as("n_total"),
        graft.functions.KmvSampleAgg.kmv_sample(
          s, col("h"), col("uv"), HhK).as("sample"))
    // scale by the ACTUAL sample size, not k: a stream smaller than k
    // is sampled whole (n_sample = N) and the estimate becomes exact
    val est = agg
      .select(col("n_total"), size(col("sample")).cast("long").as("n_sample"),
        explode(col("sample")).as("uv"))
      .groupBy(col("uv"), col("n_total"), col("n_sample"))
      .agg(count(lit(1)).as("hits"))
      .select(col("uv").cast("long").as("user_id"), col("hits"),
        expr("(hits * n_total) DIV n_sample").as("est_n"))
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
    est.join(exact, "user_id")
      .select(col("user_id"), col("hits"), col("est_n"), col("exact_n"))
      .orderBy(col("est_n").desc, col("user_id").asc)
      .limit(10)
  }

  /** Count-min sketch geometry (b39); tests reference these. Width MUST
    * be a power of two: 2^64 mod W = 0 is what makes Spark's
    * pmod-on-signed-long equal DuckDB's unsigned HUGEINT modulo. */
  private[graft] val CmDepth = 4
  private[graft] val CmWidth = 1024

  /** B39: count-min sketch — the fourth sketch in the declared family
    * (b09b distinct count, b35 quantiles, b36 frequencies-by-sampling,
    * now frequencies-by-counting). [[CmDepth]] salted hash rows ×
    * [[CmWidth]] integer cells; every lineitem increments one cell per
    * hash row keyed on its order key,
    * an item's estimate is the MIN of its cells, and the structural
    * guarantee est ≥ exact holds with NO probability qualifier (each
    * cell sums a superset of the item's occurrences) — law-tested, and
    * the overestimate column makes the collision noise auditable against
    * b36's sampling estimator on the same stream.
    *
    * Unlike Space-Saving (arrival-order-dependent) and like the rest of
    * the family, the sketch is a pure function of the data MULTISET:
    * cells are integer sums, so partitioning/order cannot change them
    * and DuckDB rebuilds the identical 4096 cells. Mergeability is the
    * 100-TB story: each task's partial aggregate is a bounded
    * [[CmDepth]]·[[CmWidth]] cell table (≈ 32 KB), so the map-side
    * combine collapses the stream before the exchange — the shuffle
    * moves at most cells·tasks rows regardless of N, and probes touch
    * only the tiny broadcast sketch table. */
  def countMinSketch(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"))
    def cellOf(j: Column, key: Column): Column =
      pmod(graft.functions.HashExpressions.fnv1a64(s,
        concat(lit("cm"), j.cast("string"), lit(":"), key.cast("string"))),
        lit(CmWidth.toLong))
    val rows = explode(array((0 until CmDepth).map(lit(_)): _*))
    val sketch = li
      .select(col("l_orderkey"), rows.as("j"))
      .select(col("j"), cellOf(col("j"), col("l_orderkey")).as("cell"))
      .groupBy(col("j"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
    val exact = li.groupBy(col("l_orderkey")).agg(count(lit(1)).as("exact_n"))
    val probes = exact
      .select(col("l_orderkey"), col("exact_n"), rows.as("j"))
      .select(col("l_orderkey"), col("exact_n"), col("j"),
        cellOf(col("j"), col("l_orderkey")).as("cell"))
    probes.join(broadcast(sketch), Seq("j", "cell"))
      .groupBy(col("l_orderkey"), col("exact_n"))
      .agg(min(col("cnt")).as("cms_n"))
  }

  /** The declared b39 view: top-20 keys with the estimate audit. */
  def countMinTop(s: SparkSession, d: String): DataFrame =
    countMinSketch(s, d)
      .select(col("l_orderkey"), col("exact_n"), col("cms_n"),
        (col("cms_n") - col("exact_n")).as("overestimate"))
      .orderBy(col("exact_n").desc, col("l_orderkey").asc)
      .limit(20)

  /** B10: rollup with grouping-null coalescing (region → nation → total). */
  def rollupAgg(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        expr("CAST(sum(CAST(c_acctbal AS DECIMAL(9,2))) AS DOUBLE)").as("sum_bal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_customers"), col("sum_bal"))
      .orderBy(col("region"), col("nation"))
  }

  /** B10b: cube over two independent dimensions. */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE)").as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy(col("status"), col("priority"))

  /** B11/B12: global ORDER BY + LIMIT — Spark plans TakeOrderedAndProject
    * (per-partition top-k, then a k-row merge on the driver: no global
    * sort, scale-safe). */
  def sortLimit(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** B12: global top-k by computed revenue per customer. */
  def topkCustomers(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(expr(s"CAST(CAST(sum($decPrice * $decDisc) * 10000 AS BIGINT) " +
          "AS DOUBLE) / 10000.0").as("revenue"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(10)
  }

  /** B13: per-group top-k via ranking window. */
  def topkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
      .select(col("o_orderpriority"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rnk"))
  }

  /** B14: ranking window functions over suppliers within nation. */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
    Tables.supplier(s, d)
      .select(col("s_nationkey"), col("s_suppkey"), col("s_acctbal"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("prank"),
        round(cume_dist().over(w), 6).as("cdist"))
      .orderBy(col("s_nationkey"), col("s_suppkey"))
  }

  /** B15: lag/lead/first/last analytics — day gaps between consecutive
    * orders per customer plus each customer's full order span, aggregated
    * per market segment. All values are integer days: exact. */
  def windowLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val gaps = Tables.orders(s, d)
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("next_date", lead(col("o_orderdate"), 1).over(w))
      .withColumn("first_date", first(col("o_orderdate")).over(wf))
      .withColumn("last_date", last(col("o_orderdate")).over(wf))
      .where(col("prev_date").isNotNull)
      // datediff is int32; the oracle's date_diff is BIGINT — keep the
      // integer FAMILY identical end-to-end (sums of int32 vs HUGEINT
      // drift to float64 in the driver's pandas canon; see VERDICT r1)
      .withColumn("gap_days", datediff(col("o_orderdate"), col("prev_date")).cast("long"))
      .withColumn("fwd_days",
        when(col("next_date").isNotNull,
          datediff(col("next_date"), col("o_orderdate")).cast("long")))
      .withColumn("span_days", datediff(col("last_date"), col("first_date")).cast("long"))
    gaps.join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_gaps"),
        min(col("gap_days")).as("min_gap"),
        max(col("gap_days")).as("max_gap"),
        round(sum(col("gap_days")).cast("double") / count(lit(1)), 6).as("avg_gap"),
        sum(col("fwd_days")).as("sum_fwd"),
        max(col("span_days")).as("max_span"))
      .orderBy(col("c_mktsegment"))
  }

  /** B16: running-total window frame (ROWS UNBOUNDED PRECEDING..CURRENT),
    * restricted to a customer slice to keep declared output modest. The
    * running sum is decimal-exact. */
  def windowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .where(col("o_custkey") < 100)
      .withColumn("running_total",
        sum(expr("CAST(o_totalprice AS DECIMAL(9,2))")).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("running_total"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** B17: set operations — segment membership via UNION/INTERSECT/EXCEPT
    * on customer keys, reported as tagged counts. */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val hiBal = c.where(col("c_acctbal") > 5000).select(col("c_custkey"))
    val auto = c.where(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
    val u = hiBal.union(auto).distinct().agg(count(lit(1)).as("n"))
      .select(lit("union").as("op"), col("n"))
    val i = hiBal.intersect(auto).agg(count(lit(1)).as("n"))
      .select(lit("intersect").as("op"), col("n"))
    val e = hiBal.except(auto).agg(count(lit(1)).as("n"))
      .select(lit("except").as("op"), col("n"))
    val ua = hiBal.unionAll(auto).agg(count(lit(1)).as("n"))
      .select(lit("union_all").as("op"), col("n"))
    u.union(i).union(e).union(ua).orderBy(col("op"))
  }

  /** B17b: MULTISET set ops — `intersectAll`/`exceptAll` keep duplicate
    * multiplicity (SQL INTERSECT ALL / EXCEPT ALL), which Spark executes
    * as a count-and-replicate aggregation rather than a distinct-ing
    * join; contrasted with the distinct counts so the multiset/set gap
    * is visible in the output. One partial-agg'd shuffle per side. */
  def setOpsAll(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val a = li.where(col("l_returnflag") === "A").select(col("l_partkey"))
    val n = li.where(col("l_returnflag") === "N").select(col("l_partkey"))
    val ia = a.intersectAll(n).agg(count(lit(1)).as("n"))
      .select(lit("intersect_all").as("op"), col("n"))
    val ea = a.exceptAll(n).agg(count(lit(1)).as("n"))
      .select(lit("except_all").as("op"), col("n"))
    val id = a.intersect(n).agg(count(lit(1)).as("n"))
      .select(lit("intersect_distinct").as("op"), col("n"))
    val ed = a.except(n).agg(count(lit(1)).as("n"))
      .select(lit("except_distinct").as("op"), col("n"))
    ia.union(ea).union(id).union(ed).orderBy(col("op"))
  }

  /** B26: NOT IN versus NOT EXISTS under NULLs — the classic three-valued
    * -logic trap, declared so the engine's answer is pinned against the
    * oracle: a NULL anywhere in a NOT IN subquery makes EVERY row's
    * predicate UNKNOWN (count 0), while NOT EXISTS and the null-filtered
    * NOT IN return the real complement. Spark plans the unfiltered form
    * as a null-aware anti join (asserted in RelationalSpec); the
    * subquery side is tiny after aggregation, so at scale all three are
    * one broadcast anti join each. */
  def notInNulls(s: SparkSession, d: String): DataFrame = {
    val pv = s"part_ni_${graft.Tables.dirTag(d)}"
    val lv = s"line_ni_${graft.Tables.dirTag(d)}"
    Tables.part(s, d).createOrReplaceTempView(pv)
    Tables.lineitem(s, d).createOrReplaceTempView(lv)
    // every 100th-order lineitem contributes NULL instead of its part key
    val pk = s"CASE WHEN l_orderkey % 100 = 0 THEN NULL ELSE l_partkey END"
    // restrict to pre-1996 shipments (as b06) so a complement exists
    val old = "l_shipdate < TIMESTAMP '1996-01-01'"
    s.sql(
      s"""SELECT 'not_in' AS variant, count(*) AS n FROM $pv
         |WHERE p_partkey NOT IN (SELECT $pk FROM $lv WHERE $old)
         |UNION ALL
         |SELECT 'not_in_null_filtered', count(*) FROM $pv
         |WHERE p_partkey NOT IN
         |  (SELECT $pk FROM $lv WHERE $old AND $pk IS NOT NULL)
         |UNION ALL
         |SELECT 'not_exists', count(*) FROM $pv p
         |WHERE NOT EXISTS
         |  (SELECT 1 FROM $lv l WHERE $old AND $pk = p.p_partkey)
         |ORDER BY variant""".stripMargin)
  }

  /** B18: scalar subquery — orders above the global average price. The
    * threshold is decimal-exact so both engines cut the same rows. */
  def subqueryAgg(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val avgPrice = o.agg(
      (expr("CAST(sum(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE)") /
        count(lit(1))).as("avg_price"))
    o.crossJoin(broadcast(avgPrice))
      .where(col("o_totalprice") > col("avg_price"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_above"),
        expr("CAST(sum(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE)").as("total_above"))
      .orderBy(col("o_orderpriority"))
  }

  /** B18b: IN / NOT IN subqueries through the SQL entry point (the
    * DSL twin is the semi/anti join pair in b06). */
  def inSubquery(s: SparkSession, d: String): DataFrame = {
    val ov = s"orders_in_${graft.Tables.dirTag(d)}"
    val cv = s"cust_in_${graft.Tables.dirTag(d)}"
    Tables.orders(s, d).createOrReplaceTempView(ov)
    Tables.customer(s, d).createOrReplaceTempView(cv)
    s.sql(
      s"""SELECT c_mktsegment,
         |  sum(CASE WHEN c_custkey IN
         |    (SELECT o_custkey FROM $ov WHERE o_totalprice > 400000)
         |    THEN 1 ELSE 0 END) AS n_big_spenders,
         |  count(*) AS n_customers
         |FROM $cv
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  /** B19: CASE / COALESCE / NULLIF over supplier balances (includes
    * genuine negatives). */
  def caseNull(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .withColumn("bucket",
        when(col("s_acctbal") < 0, "negative")
          .when(col("s_acctbal") < 5000, "mid")
          .otherwise("high"))
      .withColumn("flag", coalesce(nullif(col("bucket"), lit("mid")), lit("is_mid")))
      .groupBy(col("bucket"), col("flag"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(s_acctbal AS DECIMAL(9,2))) AS DOUBLE)").as("sum_bal"))
      .orderBy(col("bucket"))

  /** B10c: GROUPING SETS through the spark.sql entry point (the
    * DataFrame API has rollup/cube; arbitrary sets are SQL-first). */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    // per-dataset view name: a fixed name would let concurrent callers on
    // the same session read each other's dataset
    val view = s"orders_v_${graft.Tables.dirTag(d)}"
    Tables.orders(s, d).createOrReplaceTempView(view)
    s.sql(
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |       coalesce(o_orderpriority, 'ALL') AS priority,
         |       count(*) AS n,
         |       CAST(sum(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) AS total
         |FROM $view
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY status, priority""".stripMargin)
  }

  /** B7b: dispersion statistics with engine-exact arithmetic — variance
    * from lossless decimal power sums (E[X²]−E[X]², one double expression
    * at the end), plus exact interpolated median. */
  def statsAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        expr("CAST(sum(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE)").as("s1"),
        expr("CAST(sum(CAST(o_totalprice AS DECIMAL(9,2)) * CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE)").as("s2"),
        expr("percentile(o_totalprice, 0.5)").as("median_price"))
      .select(col("o_orderstatus"), col("n"),
        round(col("s1") / col("n"), 6).as("mean_price"),
        // variance is ~1e10: 6-dp rounding sits below double ULP there
        // and engines disagree sub-ULP — 2 dp is safely above ULP.
        round(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")), 2)
          .as("var_price"),
        round(sqrt(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))), 6)
          .as("stddev_price"),
        round(col("median_price"), 6).as("median_price"))
      .orderBy(col("o_orderstatus"))

  /** B19b: null-safe equality (`<=>` / IS NOT DISTINCT FROM) — nulls are
    * manufactured with nullif so both branches of the three-valued-logic
    * table appear. */
  def nullSafeEq(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("a", nullif(col("l_returnflag"), lit("N")))
      .withColumn("b", nullif(col("l_linestatus"), lit("O")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(when(col("a") <=> col("b"), 1).otherwise(0)).as("n_null_safe_eq"),
        sum(when(col("a") === col("b"), 1).otherwise(0)).as("n_plain_eq"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** B7c: correlation/covariance from exact power sums — the built-in
    * corr/covar aggregates are order-dependent float accumulations, so
    * they are reconstructed from lossless decimal sums with the closed
    * formula (engine-identical single expression at the end). */
  def corrAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sx"), // integral doubles: exact
        expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE)").as("sy"),
        sum(col("l_quantity") * col("l_quantity")).as("sxx"), // exact ints
        expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE)").as("syy"),
        expr("CAST(sum(CAST(l_quantity AS DECIMAL(4,1)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE)").as("sxy"))
      .select(col("l_returnflag"), col("n"),
        round((col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n"))), 2)
          .as("covar_pop"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6).as("corr"))
      .orderBy(col("l_returnflag"))

  /** B7d: histogram — fixed-width value bucketing via floor arithmetic
    * (portable across engines, unlike width_bucket variants). */
  def histogram(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("bucket", floor(col("o_totalprice") / 50000).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE)").as("sum_price"))
      .orderBy(col("bucket"))

  /** E: scalar-function kitchen sink — math/string/date built-ins in one
    * projection, aggregated order-independently (min/max/count only). */
  def scalarKitchen(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        min(round(sqrt(col("l_quantity")), 6)).as("min_sqrt_qty"),
        max(round(log(col("l_extendedprice")), 6)).as("max_ln_price"),
        min(round(pow(col("l_discount"), 2), 6)).as("min_disc_sq"),
        max(round(exp(col("l_tax")), 6)).as("max_exp_tax"),
        max(abs(col("l_quantity") - 25)).as("max_abs_dev"),
        min(concat(upper(col("l_linestatus")), lit("-"), lower(col("l_returnflag")))).as("min_concat"),
        max(length(trim(col("l_linestatus")))).as("max_len"),
        min(substring(col("l_linestatus"), 1, 1)).as("min_sub"),
        max(year(col("l_shipdate"))).as("max_year"),
        min(month(col("l_shipdate"))).as("min_month"),
        max(datediff(col("l_shipdate"), lit("1995-01-01").cast("timestamp"))).as("max_days_since"),
        // Spark dayofweek is 1=Sunday..7; DuckDB dayofweek is 0=Sunday..6
        // — the oracle adds 1 to align
        sum(when(dayofweek(col("l_shipdate")) === 2, 1).otherwise(0)).as("n_monday_ships"))
      .orderBy(col("l_returnflag"))

  /** B40: incremental aggregate maintenance — the 100-TB rollup pattern:
    * yesterday's aggregate STATE is stored; today only the DELTA is
    * scanned and merged into it, never the full history. Works because
    * every kept statistic is a mergeable monoid under insert-only data:
    * counts and DECIMAL sums add, min/least and max/greatest combine,
    * and avg is derived from (sum, n) at read time — the same algebra
    * Spark runs internally as partial/final aggregation, surfaced here
    * at the query level as a maintenance strategy. The declared output
    * is built the incremental way (base state ⟗ delta state, full-outer
    * so groups appearing only in the delta — or only in the base — are
    * kept); RelationalSpec asserts it equals the from-scratch aggregate
    * column-for-column, and the oracle runs the identical two-phase SQL.
    * The split key (orderkey mod 10 = 7 → delta) is a stand-in for
    * "today's partition" of a date-partitioned fact table. */
  def incrementalAgg(s: SparkSession, d: String): DataFrame = {
    def stateOf(df: DataFrame): DataFrame = df
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(o_totalprice AS DECIMAL(15,2))")).as("sum_dec"),
        min(col("o_totalprice")).as("min_p"),
        max(col("o_totalprice")).as("max_p"))
    val o = Tables.orders(s, d)
    val base = stateOf(o.where(pmod(col("o_orderkey"), lit(10)) =!= 7))
    val delta = stateOf(o.where(pmod(col("o_orderkey"), lit(10)) === 7))
      .select(col("o_orderpriority"), col("n").as("dn"),
        col("sum_dec").as("dsum"), col("min_p").as("dmin"),
        col("max_p").as("dmax"))
    base.join(delta, Seq("o_orderpriority"), "full")
      .select(col("o_orderpriority"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        expr("CAST(coalesce(sum_dec, 0) + coalesce(dsum, 0) AS DOUBLE)")
          .as("sum_price"),
        least(coalesce(col("min_p"), col("dmin")),
          coalesce(col("dmin"), col("min_p"))).as("min_price"),
        greatest(coalesce(col("max_p"), col("dmax")),
          coalesce(col("dmax"), col("max_p"))).as("max_price"))
      .withColumn("avg_price",
        round(col("sum_price") / col("n"), 6))
      .orderBy(col("o_orderpriority"))
  }

  /** B41: Z-order (Morton) clustering layout — the multi-dimensional
    * data-layout operator behind Delta/Iceberg Z-ORDER. The query
    * computes each row's Morton code over (l_partkey, l_suppkey) with
    * the codegen [[graft.functions.ZOrder2Expr]], assigns rows to 64
    * equi-width code-range buckets (= the files a range-partitioned
    * writer would produce), and reports each bucket's bounding box in
    * BOTH dimensions — the min/max footer statistics a 100 TB scan
    * would prune on. The point the output demonstrates: z-buckets are
    * tight in both partkey AND suppkey simultaneously (pk_span and
    * sk_span are each a small fraction of the full key range), whereas
    * sorting by one column leaves the other column's span at ~100% per
    * file, so single-dimension layouts can only prune one filter class.
    *
    * Shape at scale: the Morton code is a map-side projection; the
    * bucket width comes from one scalar max() broadcast back (in a real
    * writer it is a constant chosen from table stats); the layout write
    * itself would be `repartitionByRange($"z")` — one range shuffle, the
    * same cost as any global sort-write. Nothing here is fixture-bound.
    *
    * Oracle: the interleave is reproduced bit-for-bit in DuckDB as a
    * generated 62-term shift/or chain ([[zorderInterleaveSql]]) — the
    * custom expression stays hash-oracled like every scalar in §2.F. */
  def zorderLayout(s: SparkSession, d: String): DataFrame = {
    // Normalize each dimension to an 8-bit cell id BEFORE interleaving —
    // the step production Z-ORDER implementations (Delta's
    // range_partition_id, Iceberg's z-order transforms) all perform.
    // Interleaving RAW keys of different magnitudes lets the wide column
    // own the high z-bits and the layout degenerates to a 1-D sort on it
    // (measured here: 3/17 tight buckets raw vs 64/64 normalized at
    // sf0.001). Equi-width on (min, max) keeps the mapping a pure
    // integer function of two broadcast scalars — deterministic and
    // oracle-identical, and ≈ equi-depth on these uniform keys.
    val stats = Tables.lineitem(s, d).agg(
      min(col("l_partkey")).as("pk_lo"), max(col("l_partkey")).as("pk_hi"),
      min(col("l_suppkey")).as("sk_lo"), max(col("l_suppkey")).as("sk_hi"))
    val cells = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"))
      .crossJoin(broadcast(stats))
      .select(col("l_partkey"), col("l_suppkey"),
        expr("(l_partkey - pk_lo) * 256 DIV (pk_hi - pk_lo + 1)").as("cx"),
        expr("(l_suppkey - sk_lo) * 256 DIV (sk_hi - sk_lo + 1)").as("cy"))
    cells
      .withColumn("z", graft.functions.ZOrder2Expr.zorder2(s,
        col("cx"), col("cy")))
      // 16-bit z-space → 64 equi-width code ranges = the files a
      // range-partitioned writer would cut
      .select(col("l_partkey"), col("l_suppkey"),
        expr("z DIV 1024").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_pk"), max(col("l_partkey")).as("max_pk"),
        min(col("l_suppkey")).as("min_sk"), max(col("l_suppkey")).as("max_sk"))
      .withColumn("pk_span", col("max_pk") - col("min_pk") + 1)
      .withColumn("sk_span", col("max_sk") - col("min_sk") + 1)
      .orderBy(col("bucket"))
  }

  /** DuckDB twin of [[graft.functions.ZOrder2Expr]]: bit i of `x` goes
    * to bit 2i, bit i of `y` to bit 2i+1 — spelled as an explicit 62-term
    * shift/mask/or chain over the low 31 bits (everything stays inside
    * non-negative BIGINT). */
  private[ops] def zorderInterleaveSql(x: String, y: String): String =
    (0 until 31).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " | ", ")")

  /** B43: the 3-column Morton layout — b41 one dimension up, because a
    * real multi-predicate scan workload rarely stops at two clustering
    * columns (Delta/Iceberg Z-ORDER accept N). Same normalize-first
    * discipline (each key equi-width-mapped to an 8-bit cell id before
    * interleaving — raw keys of different magnitudes would hand the
    * widest column the high z-bits and flatten the layout to a 1-D
    * sort), then [[graft.functions.ZOrder3Expr]] interleaves the three
    * cell ids into a 24-bit code cut into 64 equi-width ranges = the
    * files a range-partitioned writer would produce. The declared row
    * is each file's bounding BOX in all THREE dimensions; ZOrderSpec
    * asserts most boxes are simultaneously tight in all three — the
    * property that lets a 100-TB scan filtered on ANY of the columns
    * prune from footer stats alone. */
  def zorder3Layout(s: SparkSession, d: String): DataFrame = {
    val stats = Tables.lineitem(s, d).agg(
      min(col("l_partkey")).as("pk_lo"), max(col("l_partkey")).as("pk_hi"),
      min(col("l_suppkey")).as("sk_lo"), max(col("l_suppkey")).as("sk_hi"),
      min(col("l_orderkey")).as("ok_lo"), max(col("l_orderkey")).as("ok_hi"))
    val cells = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
      .crossJoin(broadcast(stats))
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
        expr("(l_partkey - pk_lo) * 256 DIV (pk_hi - pk_lo + 1)").as("cx"),
        expr("(l_suppkey - sk_lo) * 256 DIV (sk_hi - sk_lo + 1)").as("cy"),
        expr("(l_orderkey - ok_lo) * 256 DIV (ok_hi - ok_lo + 1)").as("cz"))
    cells
      .withColumn("z", graft.functions.ZOrder3Expr.zorder3(s,
        col("cx"), col("cy"), col("cz")))
      // 24-bit z-space → 64 equi-width code ranges (2^18 codes each)
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
        expr("z DIV 262144").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_pk"), max(col("l_partkey")).as("max_pk"),
        min(col("l_suppkey")).as("min_sk"), max(col("l_suppkey")).as("max_sk"),
        min(col("l_orderkey")).as("min_ok"), max(col("l_orderkey")).as("max_ok"))
      .withColumn("pk_span", col("max_pk") - col("min_pk") + 1)
      .withColumn("sk_span", col("max_sk") - col("min_sk") + 1)
      .withColumn("ok_span", col("max_ok") - col("min_ok") + 1)
      .orderBy(col("bucket"))
  }

  /** DuckDB twin of [[graft.functions.ZOrder3Expr]]: bit i of x/y/z →
    * bit 3i/3i+1/3i+2 over the low 21 bits — a 63-term shift/or chain,
    * all inside non-negative BIGINT. */
  private[ops] def zorder3InterleaveSql(x: String, y: String,
      z: String): String =
    (0 until 21).map(i =>
      s"((($x >> $i) & 1) << ${3 * i}) | ((($y >> $i) & 1) << ${3 * i + 1})" +
        s" | ((($z >> $i) & 1) << ${3 * i + 2})")
      .mkString("(", " | ", ")")

  /** E07: generator/UDTF kitchen sink — §2.F's "mapper line parser" slot
    * exercised as a DECLARED query: four lateral-view generator forms
    * (`posexplode` over a computed `sequence`, `posexplode` over an
    * array slice, `posexplode_outer` over a possibly-empty extraction —
    * the outer row with NULL pos/val is the semantics under test — and
    * `inline` over an array of structs) unioned into one (doc_id, gen,
    * ord, val) stream. Generators run inside `Generate` map-side — row
    * explosion with no shuffle; the only exchange is the final orderBy,
    * which exists for the deterministic declared output. NULLS FIRST is
    * pinned explicitly: Spark's ASC default is nulls-first, DuckDB's is
    * nulls-last — exactly the cross-engine trap the kitchen sinks exist
    * to document. */
  def generatorKitchen(s: SparkSession, d: String): DataFrame = {
    // text IS NOT NULL on BOTH sides: posexplode_outer over a NULL array
    // would emit a row here while the oracle's two-branch dig CTE drops
    // NULL text entirely (len(NULL) matches neither branch) — a latent
    // cross-engine fork if a fixture regeneration ever ships NULL text
    val base = Tables.documents(s, d)
      .where(col("doc_id") < 20 && col("text").isNotNull)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    val seqG = base.select(col("doc_id"), lit("seq").as("gen"),
      posexplode(sequence(lit(1), lit(3))))
      .select(col("doc_id"), col("gen"), col("pos").cast("long").as("ord"),
        col("col").cast("string").as("val"))
    val tokG = base.select(col("doc_id"), lit("tok").as("gen"),
      posexplode(slice(split(col("text"), " "), 1, 3)))
      .select(col("doc_id"), col("gen"), col("pos").cast("long").as("ord"),
        col("col").as("val"))
    val digG = base.select(col("doc_id"), lit("digit").as("gen"),
      posexplode_outer(expr("regexp_extract_all(text, '[0-9]+')")))
      .select(col("doc_id"), col("gen"), col("pos").cast("long").as("ord"),
        col("col").as("val"))
    val inlG = base.select(col("doc_id"), lit("meta").as("gen"),
      expr("inline(array(struct(0L AS ord, lang AS val)," +
        " struct(1L AS ord, CAST(n_chars AS STRING) AS val)))"))
    seqG.union(tokG).union(digG).union(inlG)
      .orderBy(col("doc_id").asc, col("gen").asc,
        col("ord").asc_nulls_first, col("val").asc_nulls_first)
  }

  /** B20: unpivot/melt — the relational transpose inverse of d09's
    * pivot: three wide measure columns to (measure, value) long form via
    * the native `Dataset.unpivot` (Generate under the hood — map-side
    * row explosion, no shuffle; the oracle is the portable UNION ALL
    * form). Restricted to a small orderkey slice to keep the declared
    * output bounded; the operator itself streams at any scale. */
  def unpivotMeasures(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_orderkey") < 200)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_discount"), col("l_tax"))
      .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "measure", "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))

  /** B21: exact discrete percentiles (p10/p50/p90) per group via integer
    * rank selection — `ceil(p·n)` computed with integer arithmetic
    * (`(p·n + b−1) div b`), so the selected element is a pure function of
    * the data with no float interpolation to drift between engines. The
    * shape is one ranking window + one 5-group final aggregate; at scale
    * this is the standard exact-quantile plan (a cheaper approximate twin
    * is `percentile_approx`, deliberately not declared — same reasoning
    * as b09). */
  def percentileDisc(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("o_orderpriority"))))
      .groupBy(col("o_orderpriority"))
      .agg(
        max(col("n")).as("n"),
        max(when(col("rn") === expr("(n + 9) div 10"), col("o_totalprice"))).as("p10"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("o_totalprice"))).as("p50"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("o_totalprice"))).as("p90"))
      .orderBy(col("o_orderpriority"))
  }

  /** B27: interpolated percentiles (SQL PERCENTILE_CONT semantics) per
    * order priority. Both engines evaluate the SAME manual formulation —
    * h = p·(n−1); linear interpolation between the two bracketing
    * order statistics — instead of their native quantile functions,
    * whose interpolation arithmetic is not specified to the ulp. The
    * shape is b21's rank-targeting trick twice over: row_number + count
    * windows, then the bracketing values are picked out by a max(CASE
    * rn = target) aggregate — one window pass and one partial-agg
    * shuffle, no per-group sort-and-collect anywhere.
    *
    * The `frac = 0` guard is load-bearing: at the top rank (p·(n−1)
    * integral, e.g. p50 of odd n) the hi bracket does not exist and the
    * unguarded formula would be `v + 0 · (NULL − v)` = NULL. */
  def percentileCont(s: SparkSession, d: String): DataFrame = {
    val byP = Window.partitionBy(col("o_orderpriority"))
    val w = byP.orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val ps = Seq(("p25", 0.25), ("p50", 0.5), ("p90", 0.9))
    val base = Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(byP))
    val aggs = ps.flatMap { case (nm, p) =>
      val h = lit(p) * (col("n") - 1)
      Seq(
        max(when(col("rn") === floor(h) + 1, col("o_totalprice")))
          .as(nm + "_lo"),
        max(when(col("rn") === floor(h) + 2, col("o_totalprice")))
          .as(nm + "_hi"),
        max(h - floor(h)).as(nm + "_f"))
    }
    val outCols = col("o_orderpriority") +: col("n") +:
      ps.map { case (nm, _) =>
        round(when(col(nm + "_f") === 0, col(nm + "_lo"))
          .otherwise(col(nm + "_lo") +
            col(nm + "_f") * (col(nm + "_hi") - col(nm + "_lo"))), 6).as(nm)
      }
    base.groupBy(col("o_orderpriority"))
      .agg(max(col("n")).as("n"), aggs: _*)
      .select(outCols: _*)
      .orderBy(col("o_orderpriority"))
  }

  /** B28: per-group mode (most frequent value) with a deterministic
    * tie-break — SQL's MODE() leaves ties implementation-defined, so the
    * portable form is the argmax idiom: count per (group, value), then
    * rank by (count desc, value asc) and keep rank 1 — here "which ship
    * month is the busiest per return flag". Two shuffles, both
    * on small-cardinality keys, both partial-aggregated map-side; the
    * rank-1 filter is a WindowGroupLimit at scale. */
  def modePerGroup(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), month(col("l_shipdate")).as("ship_month"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("cnt").desc, col("ship_month").asc)
    counts.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("l_returnflag"), col("ship_month").as("mode_month"),
        col("cnt").as("mode_count"))
      .orderBy(col("l_returnflag"))
  }

  /** B29: salted two-phase aggregation, DECLARED — the skew-mitigation
    * rewrite as a first-class operator (SkewSpec asserts the equality
    * law in tests; this makes it a graded query). A hot group key melts
    * one reducer; salting fans each group into S sub-groups
    * (key, hash mod S), partially aggregates — each sub-group lands on
    * a different reducer — then re-aggregates the S partials per key.
    * Works for any commutative+associative aggregate; sums go through
    * lossless DECIMAL so the two-phase reassociation is exact (double
    * addition would make phase order observable in the last ulp). The
    * salt is a deterministic hash of a high-cardinality column, not
    * rand(): retries and both engines see identical sub-groups. With
    * only 3 group keys on this table, every groupBy here IS the hot-key
    * case the rewrite exists for. */
  def saltedAgg(s: SparkSession, d: String): DataFrame = {
    val S = 8
    val partial = Tables.lineitem(s, d)
      .withColumn("salt", pmod(col("l_partkey"), lit(S)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(
        sum(col("l_quantity").cast("decimal(15,2)")).as("p_qty"),
        sum(col("l_extendedprice").cast("decimal(15,2)")).as("p_price"),
        count(lit(1)).as("p_n"))
    partial.groupBy(col("l_returnflag"))
      .agg(
        sum(col("p_qty")).cast("double").as("sum_qty"),
        sum(col("p_price")).cast("double").as("sum_price"),
        sum(col("p_n")).as("n_rows"),
        count(lit(1)).as("n_salts"))
      .orderBy(col("l_returnflag"))
  }

  /** B42: salted/replicated skew JOIN, DECLARED — b29 fixed the skewed
    * AGGREGATE; this is the partner rewrite for a skewed shuffle JOIN.
    * When one join key owns a disproportionate share of the probe side
    * (one hot order, one celebrity user), a plain shuffle join lands the
    * whole hot key on a single reducer and the stage runs at the speed
    * of that straggler. Salting splits the probe side into S
    * deterministic sub-streams (key, hash mod S) and REPLICATES each
    * build row S times, once per salt, so a hot key's rows spread over S
    * reducers at the cost of an S× build-side inflation — the manual
    * form of AQE's skew-join split, for when the build side is too big
    * to broadcast but much smaller than the probe side (the only regime
    * where the rewrite pays). The salt is a deterministic hash of a
    * high-cardinality probe column, never rand(): retries and both
    * engines see identical sub-streams. Semantically a no-op — the
    * oracle is the PLAIN join+aggregate, which IS the contract of a
    * skew rewrite, and SkewSpec asserts the equality law plus the S×
    * build replication. Sums reassociate through lossless DECIMAL so
    * the sub-stream merge order is unobservable. */
  def saltedJoin(s: SparkSession, d: String): DataFrame = {
    val S = 8
    val fact = Tables.lineitem(s, d)
      .withColumn("salt", pmod(col("l_partkey"), lit(S)))
      .select(col("l_orderkey"), col("salt"), col("l_extendedprice"),
        col("l_discount"))
    val dim = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
    // Pin a shuffled join: the rewrite's premise is a build side too big
    // to broadcast, and at fixture scale the optimizer would otherwise
    // broadcast the replicated dim and silently skip the shape under
    // test (the ivf shuffle_hash lesson; plan-asserted in SkewSpec).
    fact.join(dim.hint("shuffle_hash"),
        fact("l_orderkey") === dim("o_orderkey") &&
          fact("salt") === dim("salt"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        expr(s"CAST(CAST(sum($decPrice * $decDisc) * 10000 AS BIGINT) " +
          "AS DOUBLE) / 10000.0").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** B31: IGNORE NULLS navigation — `lag(..., ignoreNulls)` and running
    * `first/last_value` skipping nulls, over a deterministically masked
    * price column (every third order key reports no price: the
    * sparse-measurements shape — forward-fill-from-last-reading). Both
    * engines implement SQL:2011 IGNORE NULLS natively; the mask and the
    * (date, key) tie-broken ordering make the answer exact. */
  def ignoreNullsNav(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .where(col("o_orderkey") <= 2000)
      .withColumn("price_sparse",
        when(col("o_orderkey") % 3 === 0, lit(null).cast("double"))
          .otherwise(col("o_totalprice")))
      .select(col("o_orderkey"), col("o_custkey"), col("price_sparse"),
        lag(col("price_sparse"), 1, null, ignoreNulls = true).over(w)
          .as("prev_price"),
        first(col("price_sparse"), ignoreNulls = true).over(running)
          .as("first_price"),
        last(col("price_sparse"), ignoreNulls = true).over(running)
          .as("ffill_price"))
      .orderBy(col("o_orderkey"))
  }

  /** B32: aggregate FILTER clause — per-aggregate predicates inside one
    * grouped pass (SQL:2003 FILTER), the idiom that replaces N scans
    * with one: every conditional count/sum shares the same shuffle and
    * hash table. Declared through the SQL front end since the DataFrame
    * DSL spells it `when(...)`; the money sums go through DECIMAL for
    * order-independent exactness. */
  def filterClauseAgg(s: SparkSession, d: String): DataFrame = {
    val lv = s"line_fc_${graft.Tables.dirTag(d)}"
    Tables.lineitem(s, d).createOrReplaceTempView(lv)
    s.sql(
      s"""SELECT l_returnflag,
         |  count(*) AS n_all,
         |  count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
         |  count(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)))
         |    FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_revenue,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)))
         |    FILTER (WHERE l_quantity >= 25) AS DOUBLE) AS bulk_revenue
         |FROM $lv GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** B33: higher-moment aggregates — skewness and excess kurtosis per
    * group, from EXACT integer power sums (l_quantity is integral 1-50,
    * so Σq..Σq⁴ are exact BIGINTs; Σq⁴ ≤ 6.25e6·n stays far inside
    * int64 at any realistic group size). Native `skewness`/`kurtosis`
    * are order-dependent streaming one-pass estimates — not
    * hash-comparable across engines; the raw-sum formulation is
    * order-independent by construction, and the float stage is a single
    * FIXED sequence of IEEE ops both engines evaluate identically
    * (b24_regression's discipline, one moment higher). Map-side partial
    * aggregation of five integer sums; no second pass. */
  def higherMoments(s: SparkSession, d: String): DataFrame = {
    val q = col("l_quantity").cast("long")
    val agg = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(q).as("s1"), sum(q * q).as("s2"),
        sum(q * q * q).as("s3"), sum(q * q * q * q).as("s4"))
    val n = col("n").cast("double")
    val m = col("s1").cast("double") / n
    val a2 = col("s2").cast("double") / n
    val a3 = col("s3").cast("double") / n
    val a4 = col("s4").cast("double") / n
    val v = a2 - m * m
    val m3 = a3 - lit(3) * m * a2 + lit(2) * m * m * m
    val m4 = a4 - lit(4) * m * a3 + lit(6) * m * m * a2 -
      lit(3) * m * m * m * m
    agg.select(col("l_returnflag"), col("n"),
        round(m, 6).as("mean_qty"),
        round(v, 6).as("var_qty"),
        round(m3 / (v * sqrt(v)), 6).as("skewness"),
        round(m4 / (v * v) - 3, 6).as("excess_kurtosis"))
      .orderBy(col("l_returnflag"))
  }

  /** B25: MERGE/upsert as a batch operator — the daily-maintenance shape
    * every warehouse needs: a delta of changed+new rows folds into a base
    * table, each output row tagged with the action the merge took
    * (update / insert / keep). Built as ONE full-outer join on the key
    * with presence flags; at 100 TB the base side is bucketed by key so
    * only the delta shuffles, and the classify/coalesce step is a
    * map-side projection. Base and delta are carved deterministically
    * from `orders` (key mod filters; updated rows get price + 10.00 — a
    * single exact IEEE add on both engines), and the declared output is
    * bounded to keys ≤ 4000. */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).where(col("o_orderkey") <= 4000)
    val base = o.where(col("o_orderkey") % 4 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice"), lit(1).as("in_b"))
    val delta = o.where(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"),
        (col("o_totalprice") + lit(10.0)).as("upd_price"), lit(1).as("in_d"))
    base.join(delta, Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
        when(col("in_b").isNotNull && col("in_d").isNotNull, "update")
          .when(col("in_b").isNull, "insert")
          .otherwise("keep").as("action"),
        coalesce(col("upd_price"), col("o_totalprice")).as("price"))
      .orderBy(col("o_orderkey"))
  }

  /** B24: simple linear regression per group — slope, intercept, R² of
    * extendedprice on quantity. Same exact-moment technique as b07_corr
    * (integral-double sums for x, lossless DECIMAL sums for y — all
    * order-independent), then a FIXED sequence of IEEE double ops shared
    * verbatim with the oracle: parity comes from both engines executing
    * the identical arithmetic on the identical exact moments, not from
    * rounding away the difference. Native regr_slope/regr_r2 exist in
    * both engines but accumulate running double means (order-dependent,
    * engine-specific) — unusable for hash comparison; this formulation
    * is also the scale shape (one partial-agg'd shuffle of 6 numbers per
    * group). */
  def regression(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sx"), // integral doubles: exact
        expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE)").as("sy"),
        sum(col("l_quantity") * col("l_quantity")).as("sxx"),
        expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE)").as("syy"),
        expr("CAST(sum(CAST(l_quantity AS DECIMAL(4,1)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE)").as("sxy"))
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("denx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("deny", col("n") * col("syy") - col("sy") * col("sy"))
      .select(col("l_returnflag"), col("n"),
        round(col("num") / col("denx"), 6).as("slope"),
        round(col("sy") / col("n") - col("num") / col("denx") * (col("sx") / col("n")), 6)
          .as("intercept"),
        round(col("num") * col("num") / (col("denx") * col("deny")), 6).as("r2"))
      .orderBy(col("l_returnflag"))

  /** B22: correlated EXISTS with a non-equi inner predicate, through the
    * SQL front end — suppliers out-banked by a same-nation customer.
    * Catalyst decorrelates this into a join (no per-row subquery
    * execution), which is exactly the rewrite a scale-out engine needs. */
  def existsCorrelated(s: SparkSession, d: String): DataFrame = {
    val sv = s"supp_ex_${graft.Tables.dirTag(d)}"
    val cv = s"cust_ex_${graft.Tables.dirTag(d)}"
    Tables.supplier(s, d).createOrReplaceTempView(sv)
    Tables.customer(s, d).createOrReplaceTempView(cv)
    s.sql(
      s"""SELECT s_nationkey, count(*) AS n_outranked
         |FROM $sv
         |WHERE EXISTS (SELECT 1 FROM $cv
         |              WHERE c_nationkey = s_nationkey
         |                AND c_acctbal > s_acctbal + 1000)
         |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
  }

  /** B37: correlated LATERAL subquery — per-nation top-3 customers by
    * account balance, expressed as SQL:1999 LATERAL (the comma form both
    * engines parse) with ORDER BY + LIMIT INSIDE the correlated subquery.
    * The semantically identical DSL form is b13's window-rank per-group
    * top-k; declaring the LATERAL spelling pins the decorrelation path:
    * Catalyst rewrites the per-row subquery into one window-ranked join
    * (DecorrelateInnerQuery handles the correlated LIMIT), so execution
    * is a single partitioned rank — no per-outer-row re-execution, which
    * is the only shape that survives a 100-TB outer side. The oracle runs
    * the IDENTICAL query text (e06 discipline — the tightest possible
    * cross-engine contract for this corner of the SQL surface).
    * Determinism: balance ties broken by c_custkey inside the LIMIT. */
  private def lateralSql(nation: String, customer: String): String =
    s"""SELECT n.n_name, t.c_custkey, t.c_acctbal
       |FROM $nation n, LATERAL (
       |  SELECT c_custkey, c_acctbal
       |  FROM $customer c
       |  WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 0
       |  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 3
       |) t
       |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin

  def lateralTopK(s: SparkSession, d: String): DataFrame = {
    val nv = s"nation_lat_${graft.Tables.dirTag(d)}"
    val cv = s"cust_lat_${graft.Tables.dirTag(d)}"
    Tables.nation(s, d).createOrReplaceTempView(nv)
    Tables.customer(s, d).createOrReplaceTempView(cv)
    s.sql(lateralSql(nv, cv))
  }

  /** B16b: value-based RANGE frame — rolling 30-day order count/revenue
    * per customer, ordered by an integer day offset so the frame bounds
    * are exact on both engines. Rows sharing a day share a frame, so the
    * result is deterministic without a row tie-break inside the frame. */
  def rangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day").asc)
      .rangeBetween(-30, 0)
    Tables.orders(s, d)
      .where(col("o_custkey") < 100)
      .withColumn("day",
        datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).cast("long"))
      .select(col("o_custkey"), col("o_orderkey"), col("day"),
        count(lit(1)).over(w).as("n_30d"),
        sum(expr("CAST(o_totalprice AS DECIMAL(9,2))")).over(w)
          .cast("double").as("sum_30d"))
      .orderBy(col("o_custkey"), col("day"), col("o_orderkey"))
  }

  /** B23: ordered string aggregation (listagg/group_concat) — the
    * collect-and-join aggregate family. Determinism: collect_list order
    * is partition-dependent, so the list is ALWAYS array_sort'ed before
    * joining (and the oracle uses ORDER BY inside the aggregate) — the
    * only portable contract for string aggregation on a distributed
    * engine. The full concat stays bounded (≤ customers-per-nation
    * names); at 100 TB one would cap with slice() exactly as top3 does. */
  def stringAgg(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .where(col("c_custkey") <= 200)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        array_join(array_sort(collect_list(col("c_name"))), ",").as("names_csv"),
        array_join(slice(array_sort(collect_list(col("c_name"))), 1, 3), ",")
          .as("top3_names"))
      .orderBy(col("n_name"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b23_string_agg" -> (stringAgg _),
    "b21_percentile_disc" -> (percentileDisc _),
    "b27_percentile_cont" -> (percentileCont _),
    "b28_mode" -> (modePerGroup _),
    "b29_salted_agg" -> (saltedAgg _),
    "b42_salted_join" -> (saltedJoin _),
    "b31_ignore_nulls" -> (ignoreNullsNav _),
    "b32_filter_clause" -> (filterClauseAgg _),
    "b33_higher_moments" -> (higherMoments _),
    "b22_exists_correlated" -> (existsCorrelated _),
    "b37_lateral" -> (lateralTopK _),
    "b24_regression" -> (regression _),
    "b25_merge_upsert" -> (mergeUpsert _),
    "b17b_setops_all" -> (setOpsAll _),
    "b26_not_in_nulls" -> (notInNulls _),
    "b16b_range_frame" -> (rangeFrame _),
    "b20_unpivot" -> (unpivotMeasures _),
    "b01_scan_filter" -> (scanFilter _),
    "b03_join_broadcast" -> (joinBroadcast _),
    "b04_join_shuffle" -> (joinShuffle _),
    "b34_star_join" -> (starJoin _),
    "b38_bloom_semi" -> (bloomSemi _),
    "b05_join_left" -> (joinLeft _),
    "b05_join_full" -> (joinFull _),
    "b06_join_anti" -> (joinAnti _),
    "b06_join_semi" -> (joinSemi _),
    "b07_agg_q1" -> (aggQ1 _),
    "b08_distinct" -> (distinctAgg _),
    "b08_dropdup" -> (dropDup _),
    "b09_approx_distinct" -> (approxDistinct _),
    "b09b_kmv_distinct" -> (kmvDistinct _),
    "b35_kmv_quantiles" -> (kmvQuantiles _),
    "b44_logbucket_quantiles" -> (logBucketQuantiles _),
    "b36_heavy_hitters" -> (sampledHeavyHitters _),
    "b39_countmin" -> (countMinTop _),
    "b10_rollup" -> (rollupAgg _),
    "b10_cube" -> (cubeAgg _),
    "b10_grouping_sets" -> (groupingSets _),
    "b07_stats" -> (statsAgg _),
    "b07_corr" -> (corrAgg _),
    "b07_histogram" -> (histogram _),
    "b11_sort_limit" -> (sortLimit _),
    "b12_topk_customers" -> (topkCustomers _),
    "b13_topk_pergroup" -> (topkPerGroup _),
    "b14_window_rank" -> (windowRank _),
    "b15_window_lag" -> (windowLag _),
    "b16_window_running" -> (windowRunning _),
    "b17_setops" -> (setOps _),
    "b18_subquery" -> (subqueryAgg _),
    "b18_in_subquery" -> (inSubquery _),
    "b19_case_null" -> (caseNull _),
    "b19_null_safe_eq" -> (nullSafeEq _),
    "e01_scalar_kitchen" -> (scalarKitchen _),
    "e07_generator_kitchen" -> (generatorKitchen _),
    "b40_incremental_agg" -> (incrementalAgg _),
    "b41_zorder_layout" -> (zorderLayout _),
    "b43_zorder3_layout" -> (zorder3Layout _),
  )

  val oracles: Map[String, String] = Map(
    // the oracle IS the engine query — identical LATERAL text, bare names
    "b37_lateral" -> lateralSql("nation", "customer"),
    // the bloom prefilter is cost-only: the oracle is the plain semi join
    "b38_bloom_semi" ->
      """SELECT l_returnflag, count(*) AS n_lines,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(3,2)))) * 10000
        |    AS BIGINT) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the double arithmetic after the exact moments is spelled
    // EXPRESSION-IDENTICALLY to the Spark side (same ops, same order)
    "b24_regression" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(l_quantity) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sy,
        |    sum(l_quantity * l_quantity) AS sxx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(4,1)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag),
        |d AS (
        |  SELECT l_returnflag, n, sx, sy,
        |    n * sxy - sx * sy AS num,
        |    n * sxx - sx * sx AS denx,
        |    n * syy - sy * sy AS deny
        |  FROM m)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  round(num / denx, 6) AS slope,
        |  round(sy / n - num / denx * (sx / n), 6) AS intercept,
        |  round(num * num / (denx * deny), 6) AS r2
        |FROM d ORDER BY l_returnflag""".stripMargin,
    "b17b_setops_all" ->
      """WITH a AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'),
        |n AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N')
        |SELECT 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM n)
        |UNION ALL
        |SELECT 'except_all', CAST(count(*) AS BIGINT)
        |  FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM n)
        |UNION ALL
        |SELECT 'intersect_distinct', CAST(count(*) AS BIGINT)
        |  FROM (SELECT * FROM a INTERSECT SELECT * FROM n)
        |UNION ALL
        |SELECT 'except_distinct', CAST(count(*) AS BIGINT)
        |  FROM (SELECT * FROM a EXCEPT SELECT * FROM n)
        |ORDER BY op""".stripMargin,
    "b26_not_in_nulls" ->
      """SELECT 'not_in' AS variant, CAST(count(*) AS BIGINT) AS n
        |FROM part
        |WHERE p_partkey NOT IN
        |  (SELECT CASE WHEN l_orderkey % 100 = 0 THEN NULL
        |               ELSE l_partkey END FROM lineitem
        |   WHERE l_shipdate < TIMESTAMP '1996-01-01')
        |UNION ALL
        |SELECT 'not_in_null_filtered', CAST(count(*) AS BIGINT)
        |FROM part
        |WHERE p_partkey NOT IN
        |  (SELECT CASE WHEN l_orderkey % 100 = 0 THEN NULL
        |               ELSE l_partkey END FROM lineitem
        |   WHERE l_shipdate < TIMESTAMP '1996-01-01'
        |     AND (CASE WHEN l_orderkey % 100 = 0 THEN NULL
        |               ELSE l_partkey END) IS NOT NULL)
        |UNION ALL
        |SELECT 'not_exists', CAST(count(*) AS BIGINT)
        |FROM part p
        |WHERE NOT EXISTS
        |  (SELECT 1 FROM lineitem l
        |   WHERE l_shipdate < TIMESTAMP '1996-01-01'
        |     AND (CASE WHEN l_orderkey % 100 = 0 THEN NULL
        |               ELSE l_partkey END) = p.p_partkey)
        |ORDER BY variant""".stripMargin,
    "b25_merge_upsert" ->
      """WITH o AS (SELECT * FROM orders WHERE o_orderkey <= 4000),
        |base AS (
        |  SELECT o_orderkey, o_totalprice FROM o WHERE o_orderkey % 4 <> 0),
        |delta AS (
        |  SELECT o_orderkey, o_totalprice + 10.0 AS upd_price
        |  FROM o WHERE o_orderkey % 3 = 0)
        |SELECT o_orderkey,
        |  CASE WHEN b.o_orderkey IS NOT NULL AND d.o_orderkey IS NOT NULL
        |         THEN 'update'
        |       WHEN b.o_orderkey IS NULL THEN 'insert'
        |       ELSE 'keep' END AS action,
        |  coalesce(d.upd_price, b.o_totalprice) AS price
        |FROM base b FULL OUTER JOIN delta d USING (o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "b23_string_agg" ->
      """SELECT n_name, count(*) AS n_customers,
        |  string_agg(c_name, ',' ORDER BY c_name) AS names_csv,
        |  array_to_string((list(c_name ORDER BY c_name))[1:3], ',') AS top3_names
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_custkey <= 200
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "b21_percentile_disc" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority, max(n) AS n,
        |  max(CASE WHEN rn = (n + 9) // 10 THEN o_totalprice END) AS p10,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END) AS p50,
        |  max(CASE WHEN rn = (9 * n + 9) // 10 THEN o_totalprice END) AS p90
        |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "b27_percentile_cont" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders),
        |a AS (
        |  -- percentile literals CAST to DOUBLE: DuckDB parses 0.25/0.5/0.9
        |  -- as DECIMAL, and h = p*(n-1) in decimal arithmetic can differ
        |  -- from Spark's IEEE product by ~1e-14 — enough to flip a
        |  -- rounding-boundary hash. The cast makes both engines execute
        |  -- the identical double op sequence (same discipline as b24/b33).
        |  SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n,
        |    max(CASE WHEN rn = floor(CAST(0.25 AS DOUBLE)*(n-1)) + 1 THEN o_totalprice END) AS p25_lo,
        |    max(CASE WHEN rn = floor(CAST(0.25 AS DOUBLE)*(n-1)) + 2 THEN o_totalprice END) AS p25_hi,
        |    max(CAST(0.25 AS DOUBLE)*(n-1) - floor(CAST(0.25 AS DOUBLE)*(n-1))) AS p25_f,
        |    max(CASE WHEN rn = floor(CAST(0.5 AS DOUBLE)*(n-1)) + 1 THEN o_totalprice END) AS p50_lo,
        |    max(CASE WHEN rn = floor(CAST(0.5 AS DOUBLE)*(n-1)) + 2 THEN o_totalprice END) AS p50_hi,
        |    max(CAST(0.5 AS DOUBLE)*(n-1) - floor(CAST(0.5 AS DOUBLE)*(n-1))) AS p50_f,
        |    max(CASE WHEN rn = floor(CAST(0.9 AS DOUBLE)*(n-1)) + 1 THEN o_totalprice END) AS p90_lo,
        |    max(CASE WHEN rn = floor(CAST(0.9 AS DOUBLE)*(n-1)) + 2 THEN o_totalprice END) AS p90_hi,
        |    max(CAST(0.9 AS DOUBLE)*(n-1) - floor(CAST(0.9 AS DOUBLE)*(n-1))) AS p90_f
        |  FROM r GROUP BY o_orderpriority)
        |SELECT o_orderpriority, n,
        |  round(CASE WHEN p25_f = 0 THEN p25_lo
        |    ELSE p25_lo + p25_f * (p25_hi - p25_lo) END, 6) AS p25,
        |  round(CASE WHEN p50_f = 0 THEN p50_lo
        |    ELSE p50_lo + p50_f * (p50_hi - p50_lo) END, 6) AS p50,
        |  round(CASE WHEN p90_f = 0 THEN p90_lo
        |    ELSE p90_lo + p90_f * (p90_hi - p90_lo) END, 6) AS p90
        |FROM a ORDER BY o_orderpriority""".stripMargin,
    "b33_higher_moments" ->
      """WITH a AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(q) AS BIGINT) AS s1,
        |    CAST(sum(q*q) AS BIGINT) AS s2,
        |    CAST(sum(q*q*q) AS BIGINT) AS s3,
        |    CAST(sum(q*q*q*q) AS BIGINT) AS s4
        |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q
        |        FROM lineitem)
        |  GROUP BY l_returnflag),
        |f AS (
        |  SELECT l_returnflag, n,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
        |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS a2,
        |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS a3,
        |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS a4
        |  FROM a),
        |g AS (
        |  SELECT l_returnflag, n, m, a2 - m * m AS v,
        |    a3 - 3 * m * a2 + 2 * m * m * m AS m3,
        |    a4 - 4 * m * a3 + 6 * m * m * a2 - 3 * m * m * m * m AS m4
        |  FROM f)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  round(m, 6) AS mean_qty,
        |  round(v, 6) AS var_qty,
        |  round(m3 / (v * sqrt(v)), 6) AS skewness,
        |  round(m4 / (v * v) - 3, 6) AS excess_kurtosis
        |FROM g ORDER BY l_returnflag""".stripMargin,
    "b31_ignore_nulls" ->
      """WITH m AS (
        |  SELECT o_orderkey, o_custkey, o_orderdate,
        |    CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |         ELSE o_totalprice END AS price_sparse
        |  FROM orders WHERE o_orderkey <= 2000)
        |SELECT o_orderkey, o_custkey, price_sparse,
        |  lag(price_sparse IGNORE NULLS) OVER w AS prev_price,
        |  first_value(price_sparse IGNORE NULLS) OVER
        |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS first_price,
        |  last_value(price_sparse IGNORE NULLS) OVER
        |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS ffill_price
        |FROM m
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_orderkey""".stripMargin,
    "b32_filter_clause" ->
      """SELECT l_returnflag,
        |  count(*) AS n_all,
        |  count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
        |  count(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)))
        |    FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_revenue,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)))
        |    FILTER (WHERE l_quantity >= 25) AS DOUBLE) AS bulk_revenue
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // b42: the oracle is the UNSALTED join — a skew rewrite's contract
    // is semantic transparency; the DECIMAL revenue sum makes the
    // engine's salted sub-stream reassociation exact
    "b42_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(3,2)))) * 10000
        |    AS BIGINT) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "b29_salted_agg" ->
      """WITH p AS (
        |  SELECT l_returnflag, l_partkey % 8 AS salt,
        |    sum(CAST(l_quantity AS DECIMAL(15,2))) AS p_qty,
        |    sum(CAST(l_extendedprice AS DECIMAL(15,2))) AS p_price,
        |    count(*) AS p_n
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag,
        |  CAST(sum(p_qty) AS DOUBLE) AS sum_qty,
        |  CAST(sum(p_price) AS DOUBLE) AS sum_price,
        |  CAST(sum(p_n) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_salts
        |FROM p GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "b28_mode" ->
      """WITH c AS (
        |  SELECT l_returnflag,
        |    CAST(date_part('month', l_shipdate) AS INTEGER) AS ship_month,
        |    count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT l_returnflag, ship_month, cnt, row_number() OVER (
        |    PARTITION BY l_returnflag ORDER BY cnt DESC, ship_month ASC)
        |    AS rn
        |  FROM c)
        |SELECT l_returnflag, ship_month AS mode_month,
        |  CAST(cnt AS BIGINT) AS mode_count
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    "b22_exists_correlated" ->
      """SELECT s_nationkey, count(*) AS n_outranked
        |FROM supplier
        |WHERE EXISTS (SELECT 1 FROM customer
        |              WHERE c_nationkey = s_nationkey
        |                AND c_acctbal > s_acctbal + 1000)
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "b16b_range_frame" ->
      """WITH t AS (
        |  SELECT o_custkey, o_orderkey,
        |    date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS day,
        |    o_totalprice
        |  FROM orders WHERE o_custkey < 100)
        |SELECT o_custkey, o_orderkey, day,
        |  count(*) OVER w AS n_30d,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(9,2))) OVER w AS DOUBLE) AS sum_30d
        |FROM t
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, day, o_orderkey""".stripMargin,
    "b20_unpivot" ->
      """WITH src AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
        |  FROM lineitem WHERE l_orderkey < 200)
        |SELECT l_orderkey, l_linenumber,
        |  'l_quantity' AS measure, l_quantity AS value FROM src
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |FROM src
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,
    "b01_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1996-02-01'
        |  AND l_quantity >= 47
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "b03_join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "b04_join_shuffle" ->
      """SELECT o_orderpriority, count(*) AS n_lines, sum(l_quantity) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "b05_join_left" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, c_nationkey, count(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey, c_nationkey)
        |SELECT n_name, count(*) AS n_customers,
        |  CAST(sum(CASE WHEN n_orders = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_orderless
        |FROM per_cust JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "b05_join_full" ->
      """WITH c AS (
        |  SELECT c_nationkey AS ck, count(*) AS n_customers
        |  FROM customer WHERE c_nationkey < 15 GROUP BY c_nationkey),
        |s AS (
        |  SELECT s_nationkey AS sk, count(*) AS n_suppliers
        |  FROM supplier WHERE s_nationkey >= 10 GROUP BY s_nationkey)
        |SELECT coalesce(ck, sk) AS nationkey,
        |  CAST(n_customers AS BIGINT) AS n_customers,
        |  CAST(n_suppliers AS BIGINT) AS n_suppliers
        |FROM c FULL OUTER JOIN s ON ck = sk
        |ORDER BY nationkey""".stripMargin,
    "b06_join_anti" ->
      """SELECT p_brand, count(*) AS n_never_ordered
        |FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey
        |                    AND l_shipdate < TIMESTAMP '1996-01-01')
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "b06_join_semi" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "b07_agg_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) * (1 + CAST(l_tax AS DECIMAL(3,2)))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0 AS sum_charge,
        |  round(sum(l_quantity) / count(*), 6) AS avg_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) / count(*), 6) AS avg_price,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "b08_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS nd_parts,
        |  count(DISTINCT l_suppkey) AS nd_supps,
        |  count(DISTINCT (l_partkey, l_suppkey)) AS nd_ps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "b08_dropdup" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // the sketch registers are engine-specific, but the accuracy contract
    // is oracle-able: the oracle asserts TRUE where Spark emits the
    // (deterministic) |approx − exact| / exact ≤ 0.05 predicate
    "b09_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the KMV rank-sketch twin: reproduce the same fnv+mix64 hash per
    // order key (staged into CTE columns — see b09b's note on expression
    // blowup), rank per group in unsigned hash order, keep rn ≤ k —
    // exactly the aggregate's kept multiset — then apply the identical
    // DOUBLE interpolation over the sample
    // b36: rank the same fnv+mix64 hashes of the unique event key, keep
    // rn <= k (ties break by value, mirroring the buffer's (hash, value)
    // order), count sample hits per user, scale by N/k in BIGINT
    // arithmetic — both engines compute the identical estimate.
    // b39: hash each DISTINCT (user, row) pair once — a cell's count is
    // the sum of exact_n over the users that map there, which is the
    // same multiset sum the engine accumulates event-by-event. 1024
    // divides 2^64, so unsigned % equals Spark's pmod on the signed long.
    "b39_countmin" ->
      s"""WITH exact AS (
         |  SELECT l_orderkey, count(*) AS exact_n FROM lineitem
         |  GROUP BY l_orderkey),
         |salted AS (
         |  SELECT l_orderkey, j, 'cm' || j || ':' || l_orderkey AS t
         |  FROM exact CROSS JOIN (SELECT unnest(range(0, $CmDepth)) AS j) js),
         |uh AS (
         |  SELECT l_orderkey, j,
         |    CAST((${TextOps.fnvFold(TextOps.FnvOffU)}) % $CmWidth AS BIGINT)
         |      AS cell
         |  FROM salted),
         |sketch AS (
         |  SELECT j, cell, CAST(sum(exact_n) AS BIGINT) AS cnt
         |  FROM uh JOIN exact USING (l_orderkey) GROUP BY j, cell),
         |est AS (
         |  SELECT l_orderkey, min(cnt) AS cms_n
         |  FROM uh JOIN sketch USING (j, cell) GROUP BY l_orderkey)
         |SELECT l_orderkey, exact_n, cms_n, cms_n - exact_n AS overestimate
         |FROM est JOIN exact USING (l_orderkey)
         |ORDER BY exact_n DESC, l_orderkey ASC LIMIT 20""".stripMargin,
    "b36_heavy_hitters" ->
      s"""WITH dv AS (
         |  SELECT CAST(event_id AS VARCHAR) AS t,
         |         CAST(user_id AS DOUBLE) AS uv
         |  FROM events),
         |fv AS (SELECT uv, (${TextOps.fnvFold(TextOps.FnvOffU)}) AS h0
         |       FROM dv),
         |m1 AS (SELECT uv, ${TextOps.mix64Xs33("h0")} AS h1 FROM fv),
         |m2 AS (SELECT uv, ${TextOps.mix64MulMod("h1",
                  TextOps.Mix64C1._1, TextOps.Mix64C1._2)} AS h2 FROM m1),
         |m3 AS (SELECT uv, ${TextOps.mix64Xs33("h2")} AS h3 FROM m2),
         |m4 AS (SELECT uv, ${TextOps.mix64MulMod("h3",
                  TextOps.Mix64C2._1, TextOps.Mix64C2._2)} AS h4 FROM m3),
         |hv AS (SELECT uv, ${TextOps.mix64Xs33("h4")} AS u FROM m4),
         |rk AS (SELECT uv, row_number() OVER (ORDER BY u, uv) AS rn
         |       FROM hv),
         |sm AS (SELECT uv FROM rk WHERE rn <= $HhK),
         |tot AS (SELECT count(*) AS n_total FROM events),
         |ns AS (SELECT count(*) AS n_sample FROM sm),
         |hh AS (SELECT uv, count(*) AS hits FROM sm GROUP BY uv),
         |ex AS (SELECT CAST(user_id AS DOUBLE) AS uv, count(*) AS exact_n
         |       FROM events GROUP BY user_id)
         |SELECT CAST(hh.uv AS BIGINT) AS user_id, hh.hits,
         |  (hh.hits * tot.n_total) // ns.n_sample AS est_n, ex.exact_n
         |FROM hh JOIN ex USING (uv) CROSS JOIN tot CROSS JOIN ns
         |ORDER BY est_n DESC, user_id LIMIT 10""".stripMargin,
    // identical exact-integer bucket chain: bit-length e via bin(),
    // 4-bit mantissa via `//` and `<<` on BIGINTs, same per-month
    // partial→merge grouping, same ⌈q·N⌉ rank rule
    "b44_logbucket_quantiles" ->
      """WITH li AS (
        |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(9,2)) * 100
        |           AS BIGINT) AS cents,
        |    strftime(l_shipdate, '%Y-%m') AS mon FROM lineitem),
        |b AS (
        |  SELECT mon, length(bin(cents)) - 1 AS e,
        |    (cents * 16) // (CAST(1 AS BIGINT) << (length(bin(cents)) - 1))
        |      - 16 AS m
        |  FROM li),
        |part AS (SELECT mon, e, m, CAST(count(*) AS BIGINT) AS pn
        |         FROM b GROUP BY 1, 2, 3),
        |hist AS (SELECT e, m, CAST(sum(pn) AS BIGINT) AS n
        |         FROM part GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM hist),
        |cum AS (
        |  SELECT e, m, CAST(sum(n) OVER (ORDER BY e, m
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_n
        |  FROM hist),
        |q AS (SELECT CAST(unnest([500, 900, 990]) AS BIGINT) AS q_pm)
        |SELECT q_pm, e * 16 + m AS bucket, e, m,
        |  (16 + m) * (CAST(1 AS BIGINT) << (e - 4)) AS lb_cents,
        |  cum_n, n_total
        |FROM (
        |  SELECT q.q_pm, c.e, c.m, c.cum_n, t.n_total,
        |    row_number() OVER (PARTITION BY q.q_pm ORDER BY c.e, c.m)
        |      AS rn
        |  FROM q CROSS JOIN cum c CROSS JOIN tot t
        |  WHERE c.cum_n >= (q.q_pm * t.n_total + 999) // 1000) z
        |WHERE rn = 1 ORDER BY q_pm""".stripMargin,
    "b35_kmv_quantiles" ->
      s"""WITH dv AS (
         |  SELECT o_orderpriority, o_totalprice,
         |    CAST(o_orderkey AS VARCHAR) AS t
         |  FROM orders),
         |fv AS (SELECT o_orderpriority, o_totalprice,
         |         (${TextOps.fnvFold(TextOps.FnvOffU)}) AS h0
         |       FROM dv),
         |m1 AS (SELECT o_orderpriority, o_totalprice,
         |         ${TextOps.mix64Xs33("h0")} AS h1 FROM fv),
         |m2 AS (SELECT o_orderpriority, o_totalprice,
         |         ${TextOps.mix64MulMod("h1",
                    TextOps.Mix64C1._1, TextOps.Mix64C1._2)} AS h2 FROM m1),
         |m3 AS (SELECT o_orderpriority, o_totalprice,
         |         ${TextOps.mix64Xs33("h2")} AS h3 FROM m2),
         |m4 AS (SELECT o_orderpriority, o_totalprice,
         |         ${TextOps.mix64MulMod("h3",
                    TextOps.Mix64C2._1, TextOps.Mix64C2._2)} AS h4 FROM m3),
         |hv AS (SELECT o_orderpriority, o_totalprice,
         |         ${TextOps.mix64Xs33("h4")} AS u FROM m4),
         |rk AS (
         |  SELECT o_orderpriority, o_totalprice,
         |    row_number() OVER (PARTITION BY o_orderpriority
         |                       ORDER BY u, o_totalprice) AS rn
         |  FROM hv),
         |sm AS (SELECT o_orderpriority, o_totalprice FROM rk WHERE rn <= $KmvQK),
         |rv AS (
         |  SELECT o_orderpriority, o_totalprice,
         |    row_number() OVER (PARTITION BY o_orderpriority
         |                       ORDER BY o_totalprice) AS vr,
         |    count(*) OVER (PARTITION BY o_orderpriority) AS ns
         |  FROM sm),
         |a AS (
         |  SELECT o_orderpriority, CAST(max(ns) AS BIGINT) AS n_sample,
         |    max(CASE WHEN vr = floor(CAST(0.5 AS DOUBLE)*(ns-1)) + 1 THEN o_totalprice END) AS p50_lo,
         |    max(CASE WHEN vr = floor(CAST(0.5 AS DOUBLE)*(ns-1)) + 2 THEN o_totalprice END) AS p50_hi,
         |    max(CAST(0.5 AS DOUBLE)*(ns-1) - floor(CAST(0.5 AS DOUBLE)*(ns-1))) AS p50_f,
         |    max(CASE WHEN vr = floor(CAST(0.9 AS DOUBLE)*(ns-1)) + 1 THEN o_totalprice END) AS p90_lo,
         |    max(CASE WHEN vr = floor(CAST(0.9 AS DOUBLE)*(ns-1)) + 2 THEN o_totalprice END) AS p90_hi,
         |    max(CAST(0.9 AS DOUBLE)*(ns-1) - floor(CAST(0.9 AS DOUBLE)*(ns-1))) AS p90_f
         |  FROM rv GROUP BY o_orderpriority),
         |ex AS (
         |  SELECT o_orderpriority, count(*) AS n_exact
         |  FROM orders GROUP BY o_orderpriority)
         |SELECT a.o_orderpriority, ex.n_exact, a.n_sample,
         |  round(CASE WHEN p50_f = 0 THEN p50_lo
         |    ELSE p50_lo + p50_f * (p50_hi - p50_lo) END, 6) AS p50_est,
         |  round(CASE WHEN p90_f = 0 THEN p90_lo
         |    ELSE p90_lo + p90_f * (p90_hi - p90_lo) END, 6) AS p90_est
         |FROM a JOIN ex USING (o_orderpriority)
         |ORDER BY o_orderpriority""".stripMargin,
    "b34_star_join" ->
      """SELECT r_name, n_name, p_brand,
        |  count(*) AS n_lines,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(3,2)))) * 10000
        |    AS BIGINT) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND p_size <= 25 AND r_name IN ('ASIA', 'EUROPE')
        |GROUP BY r_name, n_name, p_brand
        |ORDER BY revenue DESC, r_name, n_name, p_brand
        |LIMIT 10""".stripMargin,
    // the KMV twin of the engine aggregate: same fnv1a64 (HUGEINT fold),
    // rank distinct hashes in unsigned order, take the k-th, and apply
    // the identical 3-op estimate from the identical signed integer
    "b09b_kmv_distinct" ->
      s"""WITH dv AS (
         |  SELECT DISTINCT l_returnflag, CAST(l_partkey AS VARCHAR) AS t
         |  FROM lineitem),
         |-- fnv staged into a COLUMN first: mix64Fold textually expands
         |-- its operand many times, and feeding it the whole fnvFold
         |-- expression produced ~3 MB of SQL whose expression tree
         |-- overflowed a DuckDB worker stack (observed segfault at
         |-- sf0.1, spurious tiny-alloc OOM bursts at sf0.01)
         |fv AS (SELECT l_returnflag,
         |         (${TextOps.fnvFold(TextOps.FnvOffU)}) AS h0
         |       FROM dv),
         |m1 AS (SELECT l_returnflag, ${TextOps.mix64Xs33("h0")} AS h1 FROM fv),
         |m2 AS (SELECT l_returnflag, ${TextOps.mix64MulMod("h1",
                  TextOps.Mix64C1._1, TextOps.Mix64C1._2)} AS h2 FROM m1),
         |m3 AS (SELECT l_returnflag, ${TextOps.mix64Xs33("h2")} AS h3 FROM m2),
         |m4 AS (SELECT l_returnflag, ${TextOps.mix64MulMod("h3",
                  TextOps.Mix64C2._1, TextOps.Mix64C2._2)} AS h4 FROM m3),
         |hv AS (SELECT l_returnflag, ${TextOps.mix64Xs33("h4")} AS u FROM m4),
         |du AS (SELECT DISTINCT l_returnflag, u FROM hv),
         |rk AS (
         |  SELECT l_returnflag, u,
         |    row_number() OVER (PARTITION BY l_returnflag ORDER BY u) AS rn
         |  FROM du),
         |kth AS (
         |  -- the aggregate returns the SIGN-FLIPPED k-th hash, u − 2^63
         |  -- (not the signed reinterpretation u − 2^64): always in BIGINT
         |  SELECT l_returnflag, CAST(u - ${TextOps.H63} AS BIGINT) AS f
         |  FROM rk WHERE rn = $KmvK),
         |ex AS (
         |  SELECT l_returnflag,
         |    CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT ex.l_returnflag, ex.n_exact,
         |  round(CAST(${KmvK - 1} AS DOUBLE) /
         |    (CAST(f AS DOUBLE) * power(2.0, -64) + 0.5), 6) AS kmv_est
         |FROM ex LEFT JOIN kth USING (l_returnflag)
         |ORDER BY l_returnflag""".stripMargin,
    "b10_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        |  count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(9,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region, nation""".stripMargin,
    "b10_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "b10_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,
    "b07_stats" ->
      """WITH s AS (
        |  SELECT o_orderstatus, count(*) AS n,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(9,2)) * CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) AS s2,
        |    quantile_cont(o_totalprice, 0.5) AS median_price
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, n,
        |  round(s1 / n, 6) AS mean_price,
        |  round(s2 / n - (s1 / n) * (s1 / n), 2) AS var_price,
        |  round(sqrt(s2 / n - (s1 / n) * (s1 / n)), 6) AS stddev_price,
        |  round(median_price, 6) AS median_price
        |FROM s ORDER BY o_orderstatus""".stripMargin,
    "b07_corr" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(l_quantity) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sy,
        |    sum(l_quantity * l_quantity) AS sxx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(4,1)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round(sxy / n - (sx / n) * (sy / n), 2) AS covar_pop,
        |  round((n * sxy - sx * sy) /
        |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "b07_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS INTEGER) AS bucket,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "b11_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "b12_topk_customers" ->
      """SELECT c_custkey, c_name, revenue FROM (
        |  SELECT o_custkey,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS revenue
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY o_custkey) r
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 10""".stripMargin,
    "b13_topk_pergroup" ->
      """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin,
    "b14_window_rank" ->
      """SELECT s_nationkey, s_suppkey, s_acctbal,
        |  row_number() OVER w AS rn,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS prank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey ASC)
        |ORDER BY s_nationkey, s_suppkey""".stripMargin,
    "b15_window_lag" ->
      """WITH gaps AS (
        |  SELECT o_custkey,
        |    date_diff('day',
        |      lag(o_orderdate) OVER w, o_orderdate) AS gap_days,
        |    date_diff('day',
        |      o_orderdate, lead(o_orderdate) OVER w) AS fwd_days,
        |    date_diff('day',
        |      first_value(o_orderdate) OVER wf,
        |      last_value(o_orderdate) OVER wf) AS span_days
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate ASC, o_orderkey ASC),
        |         wf AS (PARTITION BY o_custkey
        |                ORDER BY o_orderdate ASC, o_orderkey ASC
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT c_mktsegment, count(*) AS n_gaps,
        |  min(gap_days) AS min_gap, max(gap_days) AS max_gap,
        |  round(CAST(sum(gap_days) AS DOUBLE) / count(*), 6) AS avg_gap,
        |  CAST(sum(fwd_days) AS BIGINT) AS sum_fwd,
        |  max(span_days) AS max_span
        |FROM gaps JOIN customer ON o_custkey = c_custkey
        |WHERE gap_days IS NOT NULL
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "b16_window_running" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(9,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_total
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "b17_setops" ->
      """WITH hi AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
        |auto AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
        |SELECT 'except' AS op, count(*) AS n FROM (SELECT * FROM hi EXCEPT SELECT * FROM auto)
        |UNION ALL
        |SELECT 'intersect', count(*) FROM (SELECT * FROM hi INTERSECT SELECT * FROM auto)
        |UNION ALL
        |SELECT 'union', count(*) FROM (SELECT * FROM hi UNION SELECT * FROM auto)
        |UNION ALL
        |SELECT 'union_all', count(*) FROM (SELECT * FROM hi UNION ALL SELECT * FROM auto)
        |ORDER BY op""".stripMargin,
    "b18_subquery" ->
      """SELECT o_orderpriority, count(*) AS n_above,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) AS total_above
        |FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) / count(*)
        |  FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "b19_case_null" ->
      """WITH b AS (
        |  SELECT s_acctbal,
        |    CASE WHEN s_acctbal < 0 THEN 'negative'
        |         WHEN s_acctbal < 5000 THEN 'mid'
        |         ELSE 'high' END AS bucket
        |  FROM supplier)
        |SELECT bucket, coalesce(nullif(bucket, 'mid'), 'is_mid') AS flag,
        |  count(*) AS n,
        |  CAST(sum(CAST(s_acctbal AS DECIMAL(9,2))) AS DOUBLE) AS sum_bal
        |FROM b GROUP BY bucket, flag ORDER BY bucket""".stripMargin,
    "b19_null_safe_eq" ->
      """WITH t AS (
        |  SELECT l_returnflag, l_linestatus,
        |    nullif(l_returnflag, 'N') AS a, nullif(l_linestatus, 'O') AS b
        |  FROM lineitem)
        |SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CASE WHEN a IS NOT DISTINCT FROM b THEN 1 ELSE 0 END) AS BIGINT) AS n_null_safe_eq,
        |  CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS n_plain_eq,
        |  count(*) AS n
        |FROM t GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "b40_incremental_agg" ->
      """WITH base AS (
        |  SELECT o_orderpriority, count(*) AS n,
        |    sum(CAST(o_totalprice AS DECIMAL(15,2))) AS sum_dec,
        |    min(o_totalprice) AS min_p, max(o_totalprice) AS max_p
        |  FROM orders WHERE o_orderkey % 10 != 7 GROUP BY o_orderpriority),
        |delta AS (
        |  SELECT o_orderpriority, count(*) AS dn,
        |    sum(CAST(o_totalprice AS DECIMAL(15,2))) AS dsum,
        |    min(o_totalprice) AS dmin, max(o_totalprice) AS dmax
        |  FROM orders WHERE o_orderkey % 10 = 7 GROUP BY o_orderpriority),
        |m AS (
        |  SELECT o_orderpriority,
        |    coalesce(n, 0) + coalesce(dn, 0) AS n,
        |    CAST(coalesce(sum_dec, 0) + coalesce(dsum, 0) AS DOUBLE)
        |      AS sum_price,
        |    least(coalesce(min_p, dmin), coalesce(dmin, min_p)) AS min_price,
        |    greatest(coalesce(max_p, dmax), coalesce(dmax, max_p)) AS max_price
        |  FROM base FULL OUTER JOIN delta USING (o_orderpriority))
        |SELECT o_orderpriority, CAST(n AS BIGINT) AS n, sum_price,
        |  min_price, max_price, round(sum_price / n, 6) AS avg_price
        |FROM m ORDER BY o_orderpriority""".stripMargin,
    "b41_zorder_layout" ->
      s"""WITH st AS (
         |  SELECT min(l_partkey) AS pk_lo, max(l_partkey) AS pk_hi,
         |    min(l_suppkey) AS sk_lo, max(l_suppkey) AS sk_hi
         |  FROM lineitem),
         |cells AS (
         |  SELECT l_partkey, l_suppkey,
         |    (l_partkey - pk_lo) * 256 // (pk_hi - pk_lo + 1) AS cx,
         |    (l_suppkey - sk_lo) * 256 // (sk_hi - sk_lo + 1) AS cy
         |  FROM lineitem, st),
         |z AS (
         |  SELECT l_partkey, l_suppkey,
         |    ${zorderInterleaveSql("cx", "cy")} AS z
         |  FROM cells)
         |SELECT z // 1024 AS bucket, count(*) AS n_rows,
         |  min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
         |  min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk,
         |  max(l_partkey) - min(l_partkey) + 1 AS pk_span,
         |  max(l_suppkey) - min(l_suppkey) + 1 AS sk_span
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
    "b43_zorder3_layout" ->
      s"""WITH st AS (
         |  SELECT min(l_partkey) AS pk_lo, max(l_partkey) AS pk_hi,
         |    min(l_suppkey) AS sk_lo, max(l_suppkey) AS sk_hi,
         |    min(l_orderkey) AS ok_lo, max(l_orderkey) AS ok_hi
         |  FROM lineitem),
         |cells AS (
         |  SELECT l_partkey, l_suppkey, l_orderkey,
         |    (l_partkey - pk_lo) * 256 // (pk_hi - pk_lo + 1) AS cx,
         |    (l_suppkey - sk_lo) * 256 // (sk_hi - sk_lo + 1) AS cy,
         |    (l_orderkey - ok_lo) * 256 // (ok_hi - ok_lo + 1) AS cz
         |  FROM lineitem, st),
         |z AS (
         |  SELECT l_partkey, l_suppkey, l_orderkey,
         |    ${zorder3InterleaveSql("cx", "cy", "cz")} AS z
         |  FROM cells)
         |SELECT z // 262144 AS bucket, count(*) AS n_rows,
         |  min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
         |  min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk,
         |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
         |  max(l_partkey) - min(l_partkey) + 1 AS pk_span,
         |  max(l_suppkey) - min(l_suppkey) + 1 AS sk_span,
         |  max(l_orderkey) - min(l_orderkey) + 1 AS ok_span
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
    "e07_generator_kitchen" ->
      """WITH base AS (
        |  SELECT doc_id, text, lang, n_chars FROM documents
        |  WHERE doc_id < 20 AND text IS NOT NULL),
        |seq AS (
        |  SELECT doc_id, 'seq' AS gen, CAST(i - 1 AS BIGINT) AS ord,
        |    CAST(i AS VARCHAR) AS val
        |  FROM base CROSS JOIN (SELECT unnest(range(1, 4)) AS i) r),
        |tok AS (
        |  SELECT doc_id, 'tok' AS gen,
        |    CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS ord,
        |    unnest(l) AS val
        |  FROM (SELECT doc_id, list_slice(string_split(text, ' '), 1, 3) AS l
        |        FROM base) z),
        |dig AS (
        |  SELECT doc_id, 'digit' AS gen, CAST(NULL AS BIGINT) AS ord,
        |    CAST(NULL AS VARCHAR) AS val
        |  FROM base WHERE len(regexp_extract_all(text, '[0-9]+')) = 0
        |  UNION ALL
        |  SELECT doc_id, 'digit' AS gen,
        |    CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS ord, unnest(l) AS val
        |  FROM (SELECT doc_id, regexp_extract_all(text, '[0-9]+') AS l
        |        FROM base) z WHERE len(l) > 0),
        |meta AS (
        |  SELECT doc_id, 'meta' AS gen, CAST(0 AS BIGINT) AS ord, lang AS val
        |  FROM base
        |  UNION ALL
        |  SELECT doc_id, 'meta' AS gen, CAST(1 AS BIGINT) AS ord,
        |    CAST(n_chars AS VARCHAR) AS val
        |  FROM base)
        |SELECT * FROM (
        |  SELECT * FROM seq UNION ALL SELECT * FROM tok
        |  UNION ALL SELECT * FROM dig UNION ALL SELECT * FROM meta)
        |ORDER BY doc_id, gen, ord ASC NULLS FIRST, val ASC NULLS FIRST""".stripMargin,
    "e01_scalar_kitchen" ->
      """SELECT l_returnflag,
        |  min(round(sqrt(l_quantity), 6)) AS min_sqrt_qty,
        |  max(round(ln(l_extendedprice), 6)) AS max_ln_price,
        |  min(round(pow(l_discount, 2), 6)) AS min_disc_sq,
        |  max(round(exp(l_tax), 6)) AS max_exp_tax,
        |  max(abs(l_quantity - 25)) AS max_abs_dev,
        |  min(concat(upper(l_linestatus), '-', lower(l_returnflag))) AS min_concat,
        |  max(length(trim(l_linestatus))) AS max_len,
        |  min(substring(l_linestatus, 1, 1)) AS min_sub,
        |  max(year(l_shipdate)) AS max_year,
        |  min(month(l_shipdate)) AS min_month,
        |  max(date_diff('day', TIMESTAMP '1995-01-01', l_shipdate)) AS max_days_since,
        |  CAST(sum(CASE WHEN dayofweek(l_shipdate) + 1 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_monday_ships
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "b18_in_subquery" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CASE WHEN c_custkey IN
        |    (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_big_spenders,
        |  count(*) AS n_customers
        |FROM customer
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
  )
}
