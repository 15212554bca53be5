package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Events / time-series surface (SURVEY.md §2.D). The reference is pure
  * batch, so this block is driver-mandated scope: the declared queries
  * are batch over the `events` table; `graft.streaming.Streams` holds the
  * Structured Streaming twins (watermarks, stateful dedup, session
  * state), exercised by tests rather than the oracle harness.
  *
  * Engine parity: DuckDB reads `events.ts` as TIMESTAMP_NS while our
  * Spark view floors it to whole seconds, so every oracle first rebuilds
  * the identical second-precision timestamp
  * (`make_timestamp((epoch_ns(ts)//1000000000)*1000000)`). Timestamps in
  * declared outputs are formatted as strings — engines disagree on
  * timestamp physical types, strings hash identically.
  *
  * Scale design: every query here keys its shuffle by (time-bucket,
  * type) or by user — both high-cardinality and well-distributed at
  * 100 TB. Session/lag windows partition by user_id, which is the
  * natural key a production stream would also be sharded on.
  */
object EventOps {

  private val fmt = "yyyy-MM-dd HH:mm:ss"
  // DuckDB twin of Tables.events' second-floored timestamp.
  private[ops] val duckSecTs = "make_timestamp((epoch_ns(ts) // 1000000000) * 1000000)"
  private val decValue = "CAST(value AS DECIMAL(9,2))" // values are exact 2-dp

  /** D1: tumbling 1-hour window per event type. */
  def windowTumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        expr(s"CAST(sum($decValue) AS DOUBLE)").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(date_format(col("h"), fmt).as("wstart"), col("event_type"),
        col("n"), col("sum_value"), col("min_value"), col("max_value"))
      .orderBy(col("wstart"), col("event_type"))

  /** D2: sliding 1-hour window, 15-minute slide — Spark's native
    * overlapping-window operator; each event lands in 4 windows. */
  def windowSliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr(s"CAST(sum($decValue) AS DOUBLE)").as("sum_value"))
      .select(date_format(col("window.start"), fmt).as("wstart"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("wstart"), col("event_type"))

  /** The one session definition shared by d03 and d25 (VERDICT r7 advice:
    * the two had drifted into separate inline copies): 30-minute-gap
    * sessions per user, events canonically ordered by (ts_ns, event_id)
    * — the sub-second tie-break cannot move a session boundary (gaps are
    * computed on second-floored `ts`, and two events inside one second
    * are always ≤ 1800 s apart) but makes the scan order total. Returns
    * one row per (user_id, session_id) with n_events and the
    * [s_start, s_end] timestamp interval; callers format/derive from
    * there. Input must carry user_id, ts, ts_ns, event_id.
    */
  private def sessionIntervals(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns").asc, col("event_id").asc)
    val runSum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(runSum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
  }

  /** D3: sessionization — gap > 30 minutes starts a new session. Declared
    * in the portable lag+cumulative-sum form (identical SQL in DuckDB);
    * the streaming twin uses session_window/state. */
  def sessionize(s: SparkSession, d: String): DataFrame =
    sessionIntervals(Tables.events(s, d))
      .select(col("user_id"), col("n_events"),
        (col("s_end").cast("long") - col("s_start").cast("long")).as("duration_sec"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        max(col("duration_sec")).as("max_session_sec"))
      .orderBy(col("user_id"))

  /** D4: keep-first dedup per (user, event_type) — the batch equivalent
    * of streaming dropDuplicatesWithinWatermark. */
  def dedupFirst(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_ns").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        date_format(col("ts"), fmt).as("first_ts"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** D5: JSON extraction from the props payload. */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"))

  /** D6: as-of join — each event matched to the user's most recent order
    * at or before the event time. Expressed as range-join + per-event
    * rank (portable); at scale this becomes a sort-merge as-of: both
    * sides hash-partitioned by user and time-sorted, one linear merge
    * pass per partition (see plans.AsOfJoin notes). */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"))
    // "most recent prior order" = max(o_orderdate) over the range match:
    // a hash aggregate (map-side partial max per event), not a sort
    // window — measured ~3× faster and the scale-safe shape.
    e.join(o, col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"), "left")
      .groupBy(col("event_id"), col("event_type"), col("ts"))
      .agg(max(col("o_orderdate")).as("last_od"))
      .groupBy(col("event_type"))
      .agg(count(col("last_od")).as("n_matched"),
        count(lit(1)).as("n_events"),
        sum(datediff(col("ts"), col("last_od"))).as("sum_days_since"))
      .orderBy(col("event_type"))
  }

  /** D7: time-series diff — per-user consecutive value deltas (ordered
    * by raw nanos + id: total order), aggregated order-independently. */
  def timeseriesDiff(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("dv", col("value") - lag(col("value"), 1).over(w))
      .where(col("dv").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_diffs"),
        round(min(col("dv")), 6).as("min_dv"),
        round(max(col("dv")), 6).as("max_dv"),
        expr("CAST(sum(CAST(dv AS DECIMAL(11,2))) AS DOUBLE)").as("sum_dv"))
      .orderBy(col("event_type"))
  }

  /** D3b: Spark's native session_window operator in batch. Boundary
    * semantics (verified empirically on a gap of exactly 30 min, sf0.1
    * user 511): an event arriving exactly at session-end MERGES into the
    * session, i.e. a new session starts only when the gap is strictly
    * greater than 30 min — the same `>` convention as d03. */
  def sessionWindowNative(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"))
      .orderBy(col("user_id"))

  /** E-map: from_json into a typed map, exploded to key/value rows —
    * the map/json scalar surface (map_keys/map_values/element_at are the
    * same parsed-map column). */
  def mapJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.IntegerType)).as("m"))
      .select(col("event_type"), explode(col("m")).as(Seq("key", "value")))
      .groupBy(col("event_type"), col("key"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"),
        max(col("value")).as("max_v"), sum(col("value")).as("sum_v"))
      .orderBy(col("event_type"), col("key"))

  /** D6b: the same as-of semantics via the linear union+window
    * formulation — the shape that scales when the range join blows up:
    * union both streams tagged, sort by (key, time, tag) once, and let
    * `last(..., ignoreNulls)` carry the most recent order date forward.
    * One sort exchange, O(n+m) — no per-event candidate expansion at all.
    * Output (and oracle) identical to d06. */
  def asofUnion(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id").as("k"), col("ts").as("t"), lit(1).as("tag"),
        col("event_id"), col("event_type"), col("ts"),
        lit(null).cast("timestamp").as("o_orderdate"))
    val o = Tables.orders(s, d)
      .select(col("o_custkey").as("k"), col("o_orderdate").as("t"), lit(0).as("tag"),
        lit(null).cast("long").as("event_id"), lit(null).cast("string").as("event_type"),
        lit(null).cast("timestamp").as("ts"), col("o_orderdate"))
    // orders sort before events at equal time (tag 0 < 1) → inclusive <=
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t").asc, col("tag").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.unionByName(o)
      .withColumn("last_od", last(col("o_orderdate"), ignoreNulls = true).over(w))
      .where(col("tag") === 1)
      .groupBy(col("event_type"))
      .agg(count(col("last_od")).as("n_matched"),
        count(lit(1)).as("n_events"),
        sum(datediff(col("ts"), col("last_od"))).as("sum_days_since"))
      .orderBy(col("event_type"))
  }

  /** D9: pivot — event counts per hour-of-day, one column per event
    * type (Spark's relational transpose; the oracle is the portable
    * conditional-aggregation form). */
  def pivotCounts(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("hour_of_day", hour(col("ts")))
      .groupBy(col("hour_of_day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
      .orderBy(col("hour_of_day"))

  /** D10: gap filling — densify each event type's hourly series over its
    * observed [min, max] hour range (integer hours from raw nanos, exact
    * on both engines), flag the missing hours, and forward-fill the last
    * observed count (`last(..., ignoreNulls)` over an ordered frame —
    * the standard gauge-style ffill).
    *
    * Scale: the timeline is generated per key from a one-row-per-key
    * bounds aggregate (`sequence` + explode — map-side, no shuffle
    * beyond the hourly aggregation), and the fill window partitions by
    * event_type, so a 100 TB event log densifies in parallel per key.
    * Counts (longs) are forward-filled rather than double sums so the
    * output is order-independent and hash-exact. */
  def gapFill(s: SparkSession, d: String): DataFrame = {
    val H = 3600L * 1000000000L
    val hourly = Tables.events(s, d)
      .groupBy(col("event_type"), expr(s"ts_ns div $H").as("hour"))
      .agg(count(lit(1)).as("n"))
    val timeline = hourly
      .groupBy(col("event_type"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"))).as("hour"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    timeline.join(hourly, Seq("event_type", "hour"), "left")
      .withColumn("is_gap", col("n").isNull.cast("int"))
      .withColumn("n_filled", last(col("n"), ignoreNulls = true).over(w))
      .select(col("event_type"), col("hour"), col("is_gap"), col("n_filled"))
      .orderBy(col("event_type"), col("hour"))
  }

  /** D11: interval (range) self-join — per event, how many other events
    * of the same type happened in the preceding 60 seconds (inclusive,
    * integer-second timeline: exact on both engines).
    *
    * Scale shape: the range predicate is decomposed into a TIME-BUCKET
    * equi-join — bucket = sec div 60, the probe side fans out to buckets
    * {b−1, b}, so every qualifying pair shares a (type, bucket) key and
    * candidates are bounded to two buckets per probe row; the exact
    * [sec−60, sec] re-check then trims the superset. That is the standard
    * interval-join decomposition (equi-join on coarse buckets + residual
    * predicate) — a hash shuffle, never an O(n²) per-type scan, and the
    * bucket key spreads load even when one event_type dominates. */
  def intervalJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        expr("ts_ns div 1000000000").as("sec"))
    val probe = ev.withColumn("cb",
      explode(array(expr("sec div 60 - 1"), expr("sec div 60"))))
    val build = ev.select(col("event_id").as("b_id"),
      col("event_type").as("b_type"), col("sec").as("b_sec"),
      expr("sec div 60").as("b_bucket"))
    probe.join(build,
        col("event_type") === col("b_type") && col("cb") === col("b_bucket") &&
          col("b_sec") >= col("sec") - 60 && col("b_sec") <= col("sec") &&
          col("b_id") =!= col("event_id"), "left")
      .groupBy(col("event_id"), col("event_type"))
      .agg(count(col("b_id")).as("n_near"))
      .orderBy(col("event_id"))
  }

  /** D6c: the as-of join through the NATIVE physical operator
    * ([[graft.plans.AsOfJoinExec]] via the injected planner strategy) —
    * the third formulation of the same semantics. d06 composes a range
    * join + max-aggregate, d06b a union + window; this one runs the
    * co-partitioned sorted merge directly: one shuffle per side, one
    * O(n+m) pass, constant state. Same aggregate shape and the SAME
    * oracle as the other two — three plans, one provable answer. */
  def asofNative(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"))
    org.apache.spark.sql.graft.AsOfDataFrame
      .asofJoin(e, o, "user_id", "o_custkey", "ts", "o_orderdate")
      .groupBy(col("event_type"))
      .agg(count(col("o_orderdate")).as("n_matched"),
        count(lit(1)).as("n_events"),
        sum(datediff(col("ts"), col("o_orderdate"))).as("sum_days_since"))
      .orderBy(col("event_type"))
  }

  /** One smoothed reading: input row plus its running EWMA. */
  case class EwmaRow(event_id: Long, user_id: Long, value: Double, ewma: Double)

  /** D13: per-user exponential smoothing (EWMA, α = ¼) — the classic
    * online time-series smoother, inherently sequential per key so the
    * parallel unit is the user: one shuffle to co-locate each user's
    * events, a within-partition sort, then a linear scan with O(1) state
    * (the packStream shape). α and 1−α are exact binary fractions and
    * each step is two multiplies + one add in a FIXED order, so the
    * DuckDB recursive-CTE twin reproduces the whole cascade bit-for-bit
    * (seeded with ewma₁ = x₁). At 100 TB a skewed giant key would salt
    * by coarse time range exactly like c18b. */
  def ewmaSmooth(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        col("ts_ns").cast("long"), col("value").cast("double"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_ns"), col("event_id"))
      .as[(Long, Long, Long, Double)]
      .mapPartitions { it =>
        var cur = Long.MinValue // user ids are non-negative
        var prev = 0.0
        it.map { case (eid, uid, _, v) =>
          val e = if (uid != cur) { cur = uid; v } else 0.25 * v + 0.75 * prev
          prev = e
          EwmaRow(eid, uid, v, e)
        }
      }
      .toDF()
      // floor-quantized micro-units, not round(…, 6): EWMA values are
      // exact decimals whose digit count grows two per step, so they
      // land on .5 ULP-of-6-decimals boundaries where Spark (BigDecimal
      // half-up on the binary expansion) and DuckDB (scaled-multiply)
      // disagree; multiply-then-floor is the same two IEEE ops on both
      // engines and therefore boundary-proof
      .select(col("event_id"), col("user_id"), col("value"),
        expr("CAST(floor(ewma * 1000000) AS BIGINT)").as("ewma_micro"))
      .orderBy(col("event_id"))
  }

  /** d14: rolling distinct-count — per event type, the number of
    * DISTINCT users among the last 100 events (a sliding uniques gauge:
    * "how many different actors drove the recent burst", the windowed
    * form of a fraud/bot signal). Spark has no count(DISTINCT) window
    * aggregate, so the operator is `size(collect_set(...))` over a
    * row frame — semantically identical, and the set is bounded by the
    * frame (≤100 entries) so per-row state is small and constant.
    *
    * Scale shape: one shuffle on event_type (the window partition key),
    * then a single sorted pass with an O(frame) sliding state per
    * partition. A 100 TB stream would use high-cardinality partition
    * keys (type × shard-of-time) the same way the tumbling windows here
    * do; the frame bound keeps memory flat regardless of partition size.
    * The ordering ties on whole-second ts are broken by event_id in BOTH
    * engines, which makes the frame contents — not just the ordering —
    * deterministic. */
  def rollingDistinct(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-99, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("ts"), col("user_id"))
      .withColumn("d_users_100", size(collect_set(col("user_id")).over(w)))
      .select(col("event_id"), col("event_type"), col("d_users_100"))
      .orderBy(col("event_id"))
  }

  /** d22: rolling MEDIAN — the robust companion to d13's EWMA: a mean-
    * based smoother follows every spike; the trailing-25 median ignores
    * up to 12 outliers per frame, which is what you want under bursty
    * noise (q03's MAD argument, applied to smoothing). The median is
    * rank-SELECTED from the sorted frame (element (m+1) div 2, the b21
    * lower-median discipline) — an actual data value, no interpolation
    * arithmetic, so the DOUBLE passes through both engines untouched
    * and hashing is exact. Frame contents are deterministic: ordering
    * ties on the whole-second ts are broken by event_id on both sides.
    * Scale: same frame as d14 — one shuffle on the partition key, then
    * a sorted pass with O(frame)=25 state per row; collect_list over a
    * bounded ROWS frame is constant memory, never a per-key corpus
    * collection. */
  def rollingMedian(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-24, Window.currentRow)
    Tables.events(s, d)
      .withColumn("frame", sort_array(collect_list(col("value")).over(w)))
      .select(col("event_id"), col("event_type"),
        element_at(col("frame"),
          expr("CAST((size(frame) + 1) div 2 AS INT)")).as("med_25"))
      .orderBy(col("event_id"))
  }

  /** d15: sequential funnel — per user, the earliest
    * view → click → purchase chain with strictly increasing timestamps
    * and a 24 h step deadline; the product-analytics conversion query.
    * Built as three successive "first event after X" aggregates (min-ts
    * per user with a strict lower bound from the previous step), each a
    * broadcast-sized join on user_id — NO window over the full stream
    * and no per-user event collection. At 100 TB the per-step aggregates
    * shuffle (user_id, ts) pairs only, partial-aggregated map-side; the
    * step tables are |users|-sized, tiny relative to the stream, so AQE
    * broadcasts them into each probe. Min-ts semantics make the chain
    * greedy-earliest, which is deterministic even with same-second ties
    * because min over a set needs no tie-break. */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"))
    def firstAfter(typ: String, prev: DataFrame, prevCol: String, outCol: String) =
      ev.where(col("event_type") === typ)
        .join(prev, "user_id")
        .where(col("ts") > col(prevCol) &&
          col("ts") <= col(prevCol) + expr("INTERVAL 24 HOURS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as(outCol))
    val v = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = firstAfter("click", v, "t_view", "t_click")
    val p = firstAfter("purchase", c, "t_click", "t_purchase")
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0) +
          when(col("t_purchase").isNotNull, 1).otherwise(0)).as("stage"))
      .orderBy(col("user_id"))
  }

  /** d16: cohort retention — users grouped by first-seen day (their
    * cohort), then for each (cohort, day-offset) the count of distinct
    * users active that day: the retention-curve matrix. Two aggregates:
    * first-seen per user (one shuffle on user_id) and the distinct
    * (user, day) activity set (same key), then a join on user_id and a
    * final count keyed on (cohort, offset) — every shuffle key is
    * high-cardinality and skew-free. The date arithmetic (to_date /
    * datediff on second-floored timestamps) is calendar-exact in both
    * engines. */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val active = ev.distinct()
    active.join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** e05: the date/time scalar surface in one projection — extraction
    * (year…weekofyear), calendar arithmetic (last_day, add_months,
    * date_add, month truncation) and day differencing, every function
    * chosen because its semantics are pinned by the SQL standard /
    * ISO-8601 in BOTH engines (e.g. weekofyear is ISO in Spark and
    * DuckDB; dayofweek differs by origin — Spark is 1=Sunday, DuckDB
    * 0=Sunday — so the oracle shifts by +1 explicitly rather than
    * pretending they agree). Map-side stateless; the o_orderkey bound
    * keeps the declared output small. */
  def datetimeKitchen(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .where(col("o_orderkey") <= 1000)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("d"))
      .select(col("o_orderkey"), col("d"),
        year(col("d")).as("y"), quarter(col("d")).as("q"),
        month(col("d")).as("m"), dayofmonth(col("d")).as("dom"),
        dayofweek(col("d")).as("dow"), dayofyear(col("d")).as("doy"),
        weekofyear(col("d")).as("wk"),
        last_day(col("d")).as("month_end"),
        add_months(col("d"), 2).as("plus2m"),
        date_add(col("d"), 45).as("plus45d"),
        trunc(col("d"), "month").as("month_start"),
        datediff(col("d"), lit("1995-01-01").cast("date")).as("days_since"))
      .orderBy(col("o_orderkey"))

  /** d17: windowed top-k — the top-3 most active users inside each
    * 1-hour tumbling window: the "trending now" composition of time
    * bucketing with per-group ranking. One shuffle to the (hour, user)
    * partial counts, one window pass per hour bucket; WindowGroupLimit
    * keeps only k rows per hour below the exchange at scale. */
  def windowTopk(s: SparkSession, d: String): DataFrame = {
    val hour = date_trunc("hour", col("ts")).as("hour")
    val counts = Tables.events(s, d)
      .groupBy(hour, col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("hour"))
      .orderBy(col("n_events").desc, col("user_id").asc)
    counts.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .orderBy(col("hour"), col("rk"))
  }

  /** d18: activity streaks — the longest run of CONSECUTIVE active days
    * per user, by the classic gaps-and-islands rewrite: over each
    * user's distinct active days in order, `day − row_number()` is
    * constant exactly within a consecutive run, so grouping by that
    * anchor yields the islands in two keyed aggregations and one window
    * — no self-join, no iteration. Every shuffle keys on user_id. */
  def activityStreaks(s: SparkSession, d: String): DataFrame = {
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
    days
      .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("len"),
        min(col("day")).as("streak_start"), max(col("day")).as("streak_end"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        max(struct(col("len"), col("streak_start"))).getField("streak_start")
          .as("best_start"))
      .orderBy(col("user_id"))
  }

  /** d19: Markov event-transition matrix — for every ordered pair of
    * event types, how often one directly follows the other within a
    * user's stream, plus the row-normalized transition probability (the
    * first-order Markov model behind next-action prediction, anomaly
    * scoring, and funnel discovery; the empirical P(next | current)).
    *
    * The per-user successor is lead() over (ts, event_id) — the
    * event_id tie-break makes the successor deterministic on the
    * whole-second timestamps in BOTH engines, so the transition
    * multiset itself (not just its counts) is engine-identical. The
    * probability is one IEEE division of two BIGINT counts (count /
    * row-total), a single exactly-rounded op — no float accumulation
    * anywhere, so no quantization is needed.
    *
    * Scale shape: one shuffle on user_id (the window partition) to form
    * pairs, then a partial-aggregated count keyed on the (from, to)
    * pair — cardinality = |event types|², tiny regardless of stream
    * size. The row totals come from a second aggregate over the
    * already-collapsed pair table (|types|² rows, broadcast-sized), NOT
    * another pass over the stream. */
  def transitionMatrix(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("row_total"))
    // UNROUNDED division: n/row_total is ONE exactly-rounded IEEE op on
    // identical BIGINT inputs, so it is engine-identical as-is — and
    // round(...,6) would collapse a rare cell (n=1 against a >2M-row
    // total) to exactly 0.0, violating the positivity law
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("row_total")).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** d20: SCD Type-2 history build — turn a change log into versioned
    * dimension rows with validity intervals (the warehouse pattern
    * behind every "as it was then" join; d06/d12's as-of probes are the
    * READ side of exactly this table). The events stream is the change
    * log (user_id = business key, event_type = the tracked attribute):
    * consecutive duplicates collapse (a "change" to the same value is
    * no change), each surviving row opens a version effective from its
    * timestamp until the next change, the last version per key is open
    * (NULL effective_to, is_current = true), and version numbers count
    * from 1 in change order.
    *
    * Determinism: the change order is (ts, event_id) — the event_id
    * tie-break pins same-second changes in BOTH engines, so the
    * collapsed sequence, the interval bounds, and the version numbers
    * are all engine-identical. Scale: one shuffle on user_id (the
    * window partition), two sorted window passes (lag to collapse,
    * lead+row_number to close intervals) over data already partitioned
    * by the same key — Catalyst reuses one sort for all three window
    * functions. The output is |changes|-sized, ≪ the stream. */
  def scd2History(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val changes = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    // the SAME window drives both passes — collapse order and interval/
    // version order must never be edited apart
    changes
      .select(col("user_id"), col("event_type"),
        col("ts").as("effective_from"),
        lead(col("ts"), 1).over(w).as("effective_to"),
        row_number().over(w).as("version_no"))
      .withColumn("is_current", col("effective_to").isNull)
      .orderBy(col("user_id"), col("version_no"))
  }

  /** d21: first-touch attribution — the marketing-analytics companion
    * to the funnel (d15): every purchase's value is credited to the
    * CHANNEL that opened its session (here: the session's first event
    * type; in production, the utm/source field of the landing event),
    * answering "which entry point drives revenue". Sessionization is
    * d03's rule (same user, gap > 30 min starts a new session) with the
    * (ts, event_id) tie-break making the session's first event — hence
    * the channel — deterministic in both engines. Revenue sums in
    * DECIMAL(9,2) (values are exact 2-dp) and is cast to DOUBLE only at
    * the end, so the aggregate is order-independent.
    *
    * Scale: one shuffle on user_id drives all three window passes
    * (lag, running sum, first-of-session — one sort, reused), then a
    * |channels|-sized aggregate of the purchase rows only. */
  def attribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(run))
      // the channel = the session-OPENING event's type, carried forward
      // with IGNORE-NULLS last over the SAME user window — no second
      // (user, session)-keyed shuffle, the one sort serves every pass
      .withColumn("opener",
        when(col("new_s") === 1, col("event_type")))
      .withColumn("channel", last(col("opener"), ignoreNulls = true).over(run))
    sess.where(col("event_type") === "purchase")
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id"), col("session_id")).as("n_sessions"),
        expr("CAST(sum(CAST(value AS DECIMAL(9,2))) AS DOUBLE)").as("revenue"))
      .orderBy(col("channel"))
  }

  /** d23: day-of-week × hour-of-day activity profile — the seasonality
    * grid behind capacity planning and anomaly baselines ("is Tuesday
    * 14:00 unusually quiet?"): per (dow, hour) cell, event count,
    * distinct users, and exact-DECIMAL value sum. dow is Spark's
    * dayofweek() (1 = Sunday … 7 = Saturday); DuckDB's dayofweek() is
    * 0-based Sunday, so the oracle adds 1 — a documented calendar-API
    * fork, pinned rather than papered over with strings.
    *
    * Scale: the classic roll-up-to-tiny-grid shape — one shuffle of
    * map-side partial aggregates down to ≤ 168 cells; the distinct-user
    * count is the only expensive part (two-level agg), exactly what a
    * production profile would approximate with HLL/KMV (b09/b09b) when
    * the grid is hot. */
  def hourlyProfile(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        expr(s"CAST(sum($decValue) AS DOUBLE)").as("sum_value"))
      .orderBy(col("dow"), col("hod"))

  /** d24: OHLC bars — per (day, event_type): open (first value), high,
    * low, close (last value), volume — the canonical downsampling of a
    * tick stream to candlesticks. First/last are selected by min/max
    * over `struct(ts, event_id, value)`: (ts, event_id) is a unique
    * total order, so struct ordering — lexicographic, exactly DuckDB's
    * row() comparison — makes open/close deterministic VALUES, not
    * float arithmetic; high/low are plain min/max.
    *
    * Scale: one shuffle keyed on (day, event_type) with full map-side
    * partial aggregation (min/max of 16-byte structs), output is
    * |days × types| — the textbook pre-aggregation that turns a tick
    * firehose into a chartable table. No window, no sort of the raw
    * stream. */
  def ohlcBars(s: SparkSession, d: String): DataFrame = {
    val key = struct(col("ts"), col("event_id"), col("value"))
    Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(key).getField("value").as("open_v"),
        max(col("value")).as("high_v"),
        min(col("value")).as("low_v"),
        max(key).getField("value").as("close_v"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("open_v"), col("high_v"),
        col("low_v"), col("close_v"))
      .orderBy(col("day"), col("event_type"))
  }

  /** d25: peak concurrency — the maximum number of simultaneously open
    * sessions (d03's 30-min-gap sessions) and the instant it is first
    * reached, by the sweep-line: +1 at each session start, −1 at each
    * end (end-exclusive, so at an exact boundary the −1 sorts FIRST:
    * order by (ts, delta) with delta ∈ {−1, +1}), running sum, global
    * argmax.
    *
    * Scale shape — this is the one operator family whose textbook form
    * is a GLOBAL ordered scan, so it is implemented as the two-pass
    * partitioned prefix sum, not a single-partition window: (1) bucket
    * deltas by hour and compute per-bucket sums + within-bucket running
    * sums in parallel (shuffle keyed on the hour bucket); (2) prefix-sum
    * the |buckets|-sized per-bucket totals (tiny single-partition window
    * over ~700 rows — never the events) and broadcast the bucket offsets
    * back. concurrency(row) = bucket_offset + within-bucket running sum.
    * At 100 TB the heavy pass stays fully parallel; only the bucket
    * directory is sequential. The argmax tie-break (earliest ts, then
    * smallest delta) is total, so both engines pick the same instant. */
  def peakConcurrency(s: SparkSession, d: String): DataFrame = {
    val sess = sessionIntervals(
      Tables.events(s, d).select(col("user_id"), col("ts"), col("ts_ns"), col("event_id")))
    val deltas = sess.select(col("s_start").as("ts"), lit(1).as("delta"))
      .unionAll(sess.select(col("s_end").as("ts"), lit(-1).as("delta")))
      .withColumn("bucket", date_trunc("hour", col("ts")))
    val inBucket = Window.partitionBy(col("bucket"))
      .orderBy(col("ts").asc, col("delta").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRun = deltas.withColumn("run", sum(col("delta")).over(inBucket))
    val bucketTotals = deltas.groupBy(col("bucket"))
      .agg(sum(col("delta")).as("btotal"))
    val offsets = bucketTotals.withColumn("offset",
      coalesce(sum(col("btotal")).over(Window.orderBy(col("bucket").asc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
    withRun.join(broadcast(offsets.select(col("bucket"), col("offset"))),
        "bucket")
      .select(col("ts"), col("delta"),
        (col("offset") + col("run")).as("concurrency"))
      .orderBy(col("concurrency").desc, col("ts").asc, col("delta").asc)
      .limit(1)
      .select(col("concurrency").as("peak_concurrency"),
        date_format(col("ts"), fmt).as("peak_at"))
  }

  /** d26: the STREAMING session closer as a declared, oracled query —
    * `streaming.Streams.closedSessionsTimeout` (flatMapGroupsWithState +
    * GroupStateTimeout.EventTimeTimeout) executed synchronously over the
    * events parquet through a real file-source → memory-sink streaming
    * query. Until now the streaming surface had test-only coverage; this
    * row puts it through the CORRECTNESS gate.
    *
    * Why the output is deterministic (hence oracle-able): the fixture is
    * one file → one data micro-batch (and the NoTimeout closing rule is
    * batch-split-invariant anyway), processed at initial watermark 0, so
    * no row is late-dropped; sessions closed by a following event are
    * exactly "every session but each user's last". The post-batch
    * no-data micro-batch then advances the event-time watermark to
    * max(ts) − 0s and fires EventTimeTimeout for each remaining open
    * session whose gap horizon has passed: end_sec + 1800 < max_sec
    * (STRICT — FlatMapGroupsWithStateExec times out state with
    * timeoutTimestamp strictly below the eviction watermark). Both rules
    * are plain batch SQL — the DuckDB twin rebuilds d03's sessions and
    * applies them verbatim. StreamingSpec pins the boundary semantics
    * with a MemoryStream probe at exactly ±1 s around the horizon.
    *
    * Scale: state is one OpenSession per user active within one gap of
    * the watermark — the bounded-state production shape; the memory sink
    * is only the harness adapter. */
  def streamClosedSessions(s: SparkSession, d: String): DataFrame = {
    val name = "d26_closed_" + graft.Tables.dirTag(d)
    graft.streaming.Streams.runToMemory(
      graft.streaming.Streams.closedSessionsTimeout(s, d).toDF(),
      name, org.apache.spark.sql.streaming.OutputMode.Append())
    s.table(name)
      .select(col("user_id"), col("start_sec"), col("end_sec"),
        col("n_events").cast("long").as("n_events"))
      .orderBy(col("user_id"), col("start_sec"))
  }

  /** d36: the NATIVE session_window aggregation DECLARED in streaming —
    * d08's operator executed by Structured Streaming in Append mode
    * (watermark-finalized sessions; see
    * [[graft.streaming.Streams.sessionWindowStream]]). The emitted set
    * is exactly the sessions whose gap horizon the final watermark
    * (max(ts) − 0s) REACHED — INCLUSIVE: the session-window state store
    * evicts windows with end <= watermark, the opposite boundary
    * convention to d26's strict EventTimeTimeout (both pinned at ±1 s
    * by StreamingSpec probes). Every non-last session qualifies
    * automatically (its closing event arrived > gap after it); a user's
    * last session qualifies iff end_sec + 1800 <= max_sec, so the
    * oracle is d26's session CTE with that one predicate. The window's
    * end carries the gap; subtracting
    * it back yields d03's last-event end_sec, putting all three session
    * forms (SQL, arbitrary state, native operator) in one vocabulary. */
  def streamSessionWindow(s: SparkSession, d: String): DataFrame = {
    val name = "d36_swin_" + graft.Tables.dirTag(d)
    graft.streaming.Streams.runToMemory(
      graft.streaming.Streams.sessionWindowStream(s, d), name,
      org.apache.spark.sql.streaming.OutputMode.Append())
    s.table(name)
      .select(col("user_id"),
        col("sstart").cast("long").as("start_sec"),
        (col("send").cast("long") - 1800).as("end_sec"),
        col("n_events").cast("long").as("n_events"))
      .orderBy(col("user_id"), col("start_sec"))
  }

  /** d27: the watermarked streaming tumbling window DECLARED — d01's
    * aggregate executed by Structured Streaming (event-time window +
    * watermark, Complete mode) over the replayed events parquet. The
    * sum state is DECIMAL (order-independent), so the streamed result is
    * hash-identical to the batch aggregate and shares d01's oracle SQL
    * verbatim. With d26 (arbitrary state) and d28 (stream-stream join)
    * this puts all three production streaming shapes through the
    * correctness gate. */
  def streamTumbling(s: SparkSession, d: String): DataFrame = {
    val name = "d27_tumbling_" + graft.Tables.dirTag(d)
    graft.streaming.Streams.runToMemory(
      graft.streaming.Streams.tumbling(s, d), name,
      org.apache.spark.sql.streaming.OutputMode.Complete())
    s.table(name)
      .select(date_format(col("wstart"), fmt).as("wstart"), col("event_type"),
        col("n"), col("sum_value"), col("min_value"), col("max_value"))
      .orderBy(col("wstart"), col("event_type"))
  }

  /** d34: streaming per-window top-k DECLARED — the bounded-heap
    * TypedImperativeAggregate (§2.F's combiner kernel) executed inside
    * Structured Streaming aggregation state: "top 5 events by value per
    * hour" with O(k) state per window instead of the O(events) a
    * collect-and-rank would hold. Complete mode like d27; the heap's
    * strict (−value, event_id) total order makes the streamed result
    * hash-identical to the batch window-rank twin, which is the oracle. */
  def streamWindowTopk(s: SparkSession, d: String): DataFrame = {
    val name = "d34_topk_" + graft.Tables.dirTag(d)
    graft.streaming.Streams.runToMemory(
      graft.streaming.Streams.windowTopk(s, d), name,
      org.apache.spark.sql.streaming.OutputMode.Complete())
    s.table(name)
      .select(date_format(col("wstart"), fmt).as("wstart"),
        posexplode(col("topk")).as(Seq("pos", "t")))
      .select(col("wstart"), (col("pos") + 1).cast("long").as("rnk"),
        col("t.id").as("event_id"), (-col("t.dist")).as("value"))
      .orderBy(col("wstart"), col("rnk"))
  }

  /** d35: streaming approx-distinct DECLARED — b09b's KMV sketch run as
    * streaming aggregation state (see [[graft.streaming.Streams
    * .kmvDistinct]]): distinct users per 7-day window, ≤k longs of state
    * per window, the estimate derived from the k-th hash by the same
    * three-IEEE-op formula as b09b so the streamed number is
    * hash-identical to the batch twin (windows with < k distinct users
    * report NULL — the sketch's honest "not enough evidence" value). */
  def streamKmvDistinct(s: SparkSession, d: String): DataFrame = {
    val name = "d35_kmv_" + graft.Tables.dirTag(d)
    graft.streaming.Streams.runToMemory(
      graft.streaming.Streams.kmvDistinct(s, d), name,
      org.apache.spark.sql.streaming.OutputMode.Complete())
    val k = graft.streaming.Streams.StreamKmvK
    s.table(name)
      .select(date_format(col("wstart"), fmt).as("wstart"),
        col("n_events"), col("f"),
        round(lit((k - 1).toDouble) /
          (col("f").cast("double") * lit(math.pow(2, -64)) + lit(0.5)), 6)
          .as("kmv_est"))
      .orderBy(col("wstart"))
  }

  /** d28: the stream-stream interval join DECLARED — each click joined
    * to the same user's purchases within the following hour, both sides
    * watermarked so Spark expires buffered join state (the only way a
    * stream-stream join survives unbounded input). Inner-join append
    * output is deterministic and oracle-able against the identical
    * batch SQL WHILE the fixture replays as one data micro-batch (the
    * one-file source guarantees it today); across several batches the
    * watermark could late-drop rows and fork from the batch twin, so
    * that precondition is ASSERTED below, not assumed — mirroring d26's
    * explicit single-batch reasoning. */
  def streamClickToPurchase(s: SparkSession, d: String): DataFrame = {
    val name = "d28_ssj_" + graft.Tables.dirTag(d)
    val q = graft.streaming.Streams.runToMemory(
      graft.streaming.Streams.clickToPurchase(s, d), name,
      org.apache.spark.sql.streaming.OutputMode.Append())
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    require(dataBatches <= 1,
      s"d28 oracle parity needs a single data micro-batch, saw $dataBatches")
    s.table(name)
      .select(col("click_id"), col("purchase_id"),
        (col("purchase_ts").cast("long") - col("click_ts").cast("long"))
          .as("lag_sec"))
      .orderBy(col("click_id"), col("purchase_id"))
  }

  /** d29: streaming stateful dedup DECLARED — `Streams.dedup`
    * (dropDuplicatesWithinWatermark on (user_id, event_type)) executed
    * through a real file-source → memory-sink streaming query. This is
    * the fourth production streaming shape through the CORRECTNESS gate
    * (after arbitrary state d26, windowed agg d27, stream-stream join
    * d28): bounded dedup state, the streaming twin of batch d04.
    *
    * Determinism contract: WHICH physical row survives per key is
    * arrival-order dependent (within a micro-batch the operator keeps
    * the first row it processes, not the earliest by event time), so the
    * declared output is the KEY SET — one (user_id, event_type) row per
    * surviving key, which is exactly the distinct key set of the input
    * regardless of ordering. d04 remains the (stronger) batch contract
    * on row identity; StreamingSpec covers the row-level behavior.
    *
    * Scale: state is one entry per key inside the watermark horizon —
    * the bounded-state form that lets exact dedup run on an unbounded
    * stream (the batch operator would need the full history). */
  def streamDedup(s: SparkSession, d: String): DataFrame = {
    val name = "d29_dedup_" + graft.Tables.dirTag(d)
    graft.streaming.Streams.runToMemory(
      graft.streaming.Streams.dedup(s, d), name,
      org.apache.spark.sql.streaming.OutputMode.Append())
    s.table(name)
      .select(col("user_id"), col("event_type"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** d30: the stream-static enrichment join DECLARED — `Streams.enriched`
    * (streaming events ⋈ static customer dimension, broadcast per
    * micro-batch, then a watermarked Complete-mode window aggregate)
    * executed through a real file-source → memory-sink streaming query.
    * Fifth production streaming shape through the CORRECTNESS gate
    * (arbitrary state d26, windowed agg d27, stream-stream join d28,
    * stateful dedup d29): dimension enrichment, THE most common
    * streaming topology — and unlike d28 it needs zero join state, which
    * is why it scales to any stream rate. Inner join + order-independent
    * DECIMAL sum state make the result hash-equal to the batch twin
    * regardless of micro-batching, so the oracle is the plain batch
    * join+aggregate. */
  def streamEnrich(s: SparkSession, d: String): DataFrame = {
    val name = "d30_enrich_" + graft.Tables.dirTag(d)
    graft.streaming.Streams.runToMemory(
      graft.streaming.Streams.enriched(s, d), name,
      org.apache.spark.sql.streaming.OutputMode.Complete())
    s.table(name)
      .select(date_format(col("wstart"), fmt).as("wstart"),
        col("c_mktsegment"), col("n"), col("sum_value"))
      .orderBy(col("wstart"), col("c_mktsegment"))
  }

  /** d31: the sliding streaming window DECLARED — d02's aggregate via
    * Structured Streaming (overlapping windows = 4 concurrent states
    * per event, the shape that multiplies streaming state and makes
    * RocksDB matter; watermark expires each slide 10 min after its
    * close). DECIMAL sum state makes streamed ≡ batch bit-for-bit, so
    * it shares d02's oracle SQL verbatim. Sixth streaming shape through
    * the gate. */
  def streamSliding(s: SparkSession, d: String): DataFrame = {
    val name = "d31_sliding_" + graft.Tables.dirTag(d)
    graft.streaming.Streams.runToMemory(
      graft.streaming.Streams.sliding(s, d), name,
      org.apache.spark.sql.streaming.OutputMode.Complete())
    s.table(name)
      .select(date_format(col("wstart"), fmt).as("wstart"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("wstart"), col("event_type"))
  }

  /** d32: the LEFT OUTER stream-stream join DECLARED — d28's interval
    * join with the hard half added: unmatched clicks surface with NULL
    * purchase columns only after the watermark proves no match can
    * still arrive (state expiry + a flushing micro-batch — the d26
    * machinery driving OUTER JOIN emission instead of session closes).
    * Matched rows ≡ d28. Unmatched clicks are NOT simply the batch
    * complement: one is emitted only when its 1-hour horizon lies
    * strictly below the final global watermark — and with the default
    * multipleWatermarkPolicy=min that watermark is the MIN across both
    * sides of (max side event time − 10 min), so the tail of the click
    * stream is held in state, exactly as it would be on an unbounded
    * stream. The oracle applies that rule verbatim (found empirically:
    * the fixture's LAST click is held because its own side's watermark
    * can never pass its horizon). Seventh streaming shape through the
    * gate; same single-data-micro-batch precondition as d28, asserted. */
  def streamClickToPurchaseLeft(s: SparkSession, d: String): DataFrame = {
    val name = "d32_ssjl_" + graft.Tables.dirTag(d)
    val q = graft.streaming.Streams.runToMemory(
      graft.streaming.Streams.clickToPurchaseLeft(s, d), name,
      org.apache.spark.sql.streaming.OutputMode.Append())
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    require(dataBatches <= 1,
      s"d32 oracle parity needs a single data micro-batch, saw $dataBatches")
    // Boundary guard for the oracle's strict `<` emission rule: Spark
    // evicts unmatched outer state once a click's join horizon falls
    // below the global watermark, and the oracle encodes `cts + 1 HOUR
    // < wm` with STRICT inequality — pinned empirically, not derived
    // from the engine's eviction predicate. A fixture where a click's
    // horizon lands EXACTLY on the final min-policy watermark would make
    // the <-vs-<= boundary observable and could break parity silently;
    // assert no such click exists, so a future fixture that does drive
    // the equality case fails loudly here instead of hash-mismatching.
    val ev = graft.Tables.events(s, d)
    val wmSec = ev.where(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type")).agg(max(col("ts").cast("long")).as("mx"))
      .agg((min(col("mx")) - 600).as("wm_sec"))
    val onBoundary = ev.where(col("event_type") === "click")
      .select((col("ts").cast("long") + 3600).as("horizon"))
      .join(wmSec, col("horizon") === col("wm_sec")).count()
    require(onBoundary == 0,
      s"d32 fixture drives the untested horizon==watermark boundary " +
        s"($onBoundary clicks); pin the <-vs-<= behavior before trusting " +
        "the oracle")
    s.table(name)
      .select(col("click_id"), col("purchase_id"),
        (col("purchase_ts").cast("long") - col("click_ts").cast("long"))
          .as("lag_sec"))
      .orderBy(col("click_id"), col("purchase_id"))
  }

  /** d33: the streaming WRITE side DECLARED — foreachBatch keyed MERGE
    * into a versioned parquet serving table (topology + merge rule +
    * crash-safety in `streaming.Streams.upsertWarehouse`). The declared
    * row set is the committed final table; because no key state is ever
    * evicted, it equals the batch per-user aggregate exactly — the
    * oracle is that plain GROUP BY. Eighth streaming shape through the
    * gate. */
  def streamUpsert(s: SparkSession, d: String): DataFrame =
    graft.streaming.Streams.upsertWarehouse(s, d)

  /** d39: the streaming DEAD-LETTER path DECLARED — src03's PERMISSIVE
    * quarantine composed with the streaming surface (file-source JSONL
    * stream, per-batch foreachBatch routing into versioned good/dead
    * sinks; topology + idempotent commit rule + audit contract in
    * `streaming.Streams.deadLetterIngest`). Twelfth streaming shape
    * through the gate; the oracle is src03's verbatim, because the
    * committed audit is batching-invariant (append-only version log,
    * order-invariant checksums). */
  def streamDeadLetter(s: SparkSession, d: String): DataFrame =
    graft.streaming.Streams.deadLetterIngest(s, d)

  /** d37: GROUPED-MAP custom processing — the Scala rendering of the
    * applyInPandas shape (VERDICT r11 item 8): `groupByKey(user_id)
    * .flatMapGroups` runs an arbitrary imperative function per group
    * where no built-in aggregate fits the per-row sequential logic.
    * The function here run-length-encodes each user's event-type
    * sequence in (sec, event_id) order and keeps the LONGEST run
    * (ties → earliest start) — per-user behavioral streaks.
    *
    * Determinism: the iterator arrives in storage order, so the group
    * is materialized and sorted under the total (sec, event_id) order
    * before scanning — the same discipline every grouped-map pipeline
    * needs (pandas UDAFs get it from their sort keys). SQL CAN express
    * this one (gaps-and-islands — which is exactly what makes it
    * oracle-able); the declared point is the API shape: per-group
    * state is whatever the function wants, not an aggregate monoid.
    *
    * Scale: one hash shuffle on user_id; per-task memory is the
    * largest single user's event count (the grouped-map contract —
    * bounded by per-user volume, never by table size). */
  def groupedMapRuns(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        col("ts").cast("long").as("sec"), col("event_id"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        val evs = it.toIndexedSeq.sortBy(e => (e._3, e._4))
        // run-length encode the event_type sequence
        var best: (String, Long, Long, Long) = null // (type, len, start, end)
        var i = 0
        while (i < evs.length) {
          var j = i
          while (j + 1 < evs.length && evs(j + 1)._2 == evs(i)._2) j += 1
          val run = (evs(i)._2, (j - i + 1).toLong, evs(i)._3, evs(j)._3)
          if (best == null || run._2 > best._2) best = run
          i = j + 1
        }
        if (best == null) Iterator.empty
        else Iterator((uid, best._1, best._2, best._3, best._4))
      }
      .toDF("user_id", "event_type", "run_len", "start_sec", "end_sec")
      .orderBy(col("user_id"))
  }

  /** The declarative (gaps-and-islands window chain) twin of
    * [[groupedMapRuns]] — zero shared code with the imperative per-group
    * function. EventsSpec asserts row-identity at the graded tier and
    * ScaleCheck at sf1 (the double-implementation gate, like the two
    * component-labeling engines): the grouped-map escape hatch must
    * agree with the declarative form wherever both exist. */
  private[graft] def groupedMapRunsDeclarative(s: SparkSession,
      d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        col("ts").cast("long").as("sec"), col("event_id"))
    val runs = e
      .withColumn("brk", when(lag(col("event_type"), 1).over(w).isNull ||
        lag(col("event_type"), 1).over(w) =!= col("event_type"), 1)
        .otherwise(0))
      .withColumn("gid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("event_type"), col("gid"))
      .agg(count(lit(1)).as("run_len"), min(col("sec")).as("start_sec"),
        max(col("sec")).as("end_sec"))
    // Tie-break to a TOTAL order (ADVICE r12): two runs of one user can
    // tie on (run_len, start_sec) when events share a second. gid is the
    // per-user scan-order rank of the run (monotone in (sec, event_id)),
    // so "gid asc" picks exactly the run the imperative twin keeps — the
    // first strictly-best run encountered in scan order. start_sec asc is
    // implied by gid asc (runs are contiguous in time order) and kept
    // only for readability.
    val wBest = Window.partitionBy(col("user_id"))
      .orderBy(col("run_len").desc, col("start_sec").asc, col("gid").asc)
    runs.withColumn("brn", row_number().over(wBest))
      .where(col("brn") === 1)
      .select(col("user_id"), col("event_type"), col("run_len"),
        col("start_sec"), col("end_sec"))
      .orderBy(col("user_id"))
  }

  /** d38: COGROUPED custom processing — `KeyValueGroupedDataset
    * .cogroup`, the two-sided grouped-map twin (applyInPandas with two
    * frames): per user, both the event history and the order history
    * arrive as iterators and an imperative merge computes what a join
    * would contort — here the count of events strictly AFTER the
    * user's latest order (post-purchase activity), with n_orders and
    * the latest order second alongside. Users with no orders count ALL
    * their events (latest order = −∞); users with no events emit 0.
    *
    * Scale: one co-partitioned shuffle of both sides on the key — the
    * cogroup primitive is exactly the partitioning a sort-merge join
    * uses, with the merge function user-defined. */
  def cogroupPostOrder(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("long").as("sec"))
      .as[(Long, Long)].groupByKey(_._1)
    val ord = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp")
        .cast("long").as("osec"))
      .as[(Long, Long)].groupByKey(_._1)
    ev.cogroup(ord) { (uid, evIt, ordIt) =>
      val secs = evIt.map(_._2).toArray
      var nOrders = 0L
      var lastOrder = Long.MinValue
      ordIt.foreach { o =>
        nOrders += 1
        if (o._2 > lastOrder) lastOrder = o._2
      }
      if (secs.isEmpty && nOrders == 0L) Iterator.empty
      else {
        val after = secs.count(_ > lastOrder).toLong
        Iterator((uid, nOrders, secs.length.toLong, after))
      }
    }
      .toDF("user_id", "n_orders", "n_events", "n_events_after_last_order")
      .orderBy(col("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d33_stream_upsert" -> (streamUpsert _),
    "d39_stream_deadletter" -> (streamDeadLetter _),
    "d32_stream_join_left" -> (streamClickToPurchaseLeft _),
    "d31_stream_sliding" -> (streamSliding _),
    "d30_stream_enrich" -> (streamEnrich _),
    "d29_stream_dedup" -> (streamDedup _),
    "d26_stream_sessions" -> (streamClosedSessions _),
    "d36_stream_session_window" -> (streamSessionWindow _),
    "d37_grouped_map" -> (groupedMapRuns _),
    "d38_cogroup" -> (cogroupPostOrder _),
    "d27_stream_tumbling" -> (streamTumbling _),
    "d34_stream_topk" -> (streamWindowTopk _),
    "d35_stream_kmv" -> (streamKmvDistinct _),
    "d28_stream_join" -> (streamClickToPurchase _),
    "d23_hourly_profile" -> (hourlyProfile _),
    "d24_ohlc" -> (ohlcBars _),
    "d25_concurrency" -> (peakConcurrency _),
    "d21_attribution" -> (attribution _),
    "d20_scd2" -> (scd2History _),
    "d19_transitions" -> (transitionMatrix _),
    "d17_window_topk" -> (windowTopk _),
    "d18_streaks" -> (activityStreaks _),
    "e05_datetime_kitchen" -> (datetimeKitchen _),
    "d15_funnel" -> (funnel _),
    "d16_retention" -> (cohortRetention _),
    "d14_rolling_distinct" -> (rollingDistinct _),
    "d22_rolling_median" -> (rollingMedian _),
    "d13_ewma" -> (ewmaSmooth _),
    "d12_asof_native" -> (asofNative _),
    "d11_interval_join" -> (intervalJoin _),
    "d10_gap_fill" -> (gapFill _),
    "d09_pivot" -> (pivotCounts _),
    "d06_asof_union" -> (asofUnion _),
    "d08_session_window" -> (sessionWindowNative _),
    "e02_map_json" -> (mapJson _),
    "d01_window_tumbling" -> (windowTumbling _),
    "d02_window_sliding" -> (windowSliding _),
    "d03_sessionize" -> (sessionize _),
    "d04_dedup_first" -> (dedupFirst _),
    "d05_json_extract" -> (jsonExtract _),
    "d06_asof_join" -> (asofJoin _),
    "d07_timeseries_diff" -> (timeseriesDiff _),
  )

  /** Oracle-side twin of [[sessionIntervals]]: the shared CTE chain
    * deriving one row per event with its session_id (e → lagged →
    * flagged → sess). d03, d25 and d26 all build on this one string, so
    * the 30-minute-gap definition lives in exactly one place per engine
    * (d21 carries extra columns through the chain and stays inline). */
  private val sessionCtes =
    s"""WITH e AS (SELECT event_id, user_id, $duckSecTs AS sts FROM events),
       |lagged AS (
       |  SELECT user_id, sts, event_id,
       |    lag(sts) OVER (PARTITION BY user_id ORDER BY sts ASC, event_id ASC) AS prev_ts
       |  FROM e),
       |flagged AS (
       |  SELECT user_id, sts, event_id,
       |    CASE WHEN prev_ts IS NULL
       |           OR epoch(sts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session
       |  FROM lagged),
       |sess AS (
       |  SELECT user_id, sts,
       |    sum(new_session) OVER (PARTITION BY user_id ORDER BY sts ASC, event_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM flagged)"""
      .stripMargin

  private val asofOracle =
    s"""WITH e AS (SELECT event_id, user_id, event_type, $duckSecTs AS sts FROM events),
       |j AS (
       |  SELECT e.event_id, e.event_type, e.sts, max(o.o_orderdate) AS last_od
       |  FROM e LEFT JOIN orders o
       |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.sts
       |  GROUP BY e.event_id, e.event_type, e.sts)
       |SELECT event_type, count(last_od) AS n_matched, count(*) AS n_events,
       |  CAST(sum(date_diff('day', last_od, sts)) AS BIGINT) AS sum_days_since
       |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin

  /** d02/d31 shared oracle: explode each event into its 4 overlapping
    * 15-minute slides, aggregate per (window, type) in exact DECIMAL. */
  private val slidingOracle: String =
    s"""WITH e AS (SELECT $duckSecTs AS sts, event_type, value FROM events),
       |slid AS (
       |  SELECT time_bucket(INTERVAL '15 minutes', sts)
       |           - (s.i * INTERVAL '15 minutes') AS wstart, event_type, value
       |  FROM e CROSS JOIN (SELECT unnest([0,1,2,3]) AS i) s)
       |SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS wstart, event_type,
       |  count(*) AS n,
       |  CAST(sum(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS sum_value
       |FROM slid GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin

  val oracles: Map[String, String] = Map(
    // d39: the streamed dead-letter audit ≡ src03's batch audit verbatim
    // (the versioned good/dead sinks are an append-only log; the audit
    // is order- and batching-invariant)
    "d39_stream_deadletter" ->
      graft.sources.Sources.oracles("src03_jsonl_corrupt"),
    // d33: the committed serving table ≡ the batch per-user aggregate
    // (nothing evicted ⇒ last upsert per key carries the full total)
    "d33_stream_upsert" ->
      s"""SELECT user_id, count(*) AS n_events,
         |  CAST(sum(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS sum_value,
         |  CAST(max(epoch($duckSecTs)) AS BIGINT) AS last_sec
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // d27: the streaming window's oracle IS d01's aggregate — identical
    // SQL text, because the decimal sum state makes the streamed result
    // bit-equal to the batch one
    // d29: the surviving key set of streaming dedup ≡ the distinct key
    // set of the input (see streamDedup's determinism contract)
    "d29_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    // d30: the stream-static join's batch twin — same inner join, same
    // hour-aligned window, same DECIMAL sum
    "d30_stream_enrich" ->
      s"""SELECT strftime(date_trunc('hour', $duckSecTs), '%Y-%m-%d %H:%M:%S') AS wstart,
         |  c_mktsegment, count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS sum_value
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY 1, 2 ORDER BY wstart, c_mktsegment""".stripMargin,
    "d35_stream_kmv" ->
      s"""WITH e AS (
         |  SELECT user_id,
         |    ((epoch_ns(ts) // 1000000000) // 604800) * 604800 AS ws
         |  FROM events),
         |cnt AS (SELECT ws, CAST(count(*) AS BIGINT) AS n_events
         |        FROM e GROUP BY ws),
         |dv AS (SELECT DISTINCT ws, CAST(user_id AS VARCHAR) AS t FROM e),
         |fv AS (SELECT ws, (${TextOps.fnvFold(TextOps.FnvOffU)}) AS h0
         |       FROM dv),
         |m1 AS (SELECT ws, ${TextOps.mix64Xs33("h0")} AS h1 FROM fv),
         |m2 AS (SELECT ws, ${TextOps.mix64MulMod("h1",
                  TextOps.Mix64C1._1, TextOps.Mix64C1._2)} AS h2 FROM m1),
         |m3 AS (SELECT ws, ${TextOps.mix64Xs33("h2")} AS h3 FROM m2),
         |m4 AS (SELECT ws, ${TextOps.mix64MulMod("h3",
                  TextOps.Mix64C2._1, TextOps.Mix64C2._2)} AS h4 FROM m3),
         |hv AS (SELECT ws, ${TextOps.mix64Xs33("h4")} AS u FROM m4),
         |du AS (SELECT DISTINCT ws, u FROM hv),
         |rk AS (SELECT ws, u,
         |    row_number() OVER (PARTITION BY ws ORDER BY u) AS rn
         |  FROM du),
         |kth AS (
         |  SELECT ws, CAST(u - ${TextOps.H63} AS BIGINT) AS f
         |  FROM rk WHERE rn = ${graft.streaming.Streams.StreamKmvK})
         |SELECT strftime(make_timestamp(cnt.ws * 1000000),
         |    '%Y-%m-%d %H:%M:%S') AS wstart,
         |  cnt.n_events, kth.f,
         |  round(CAST(${graft.streaming.Streams.StreamKmvK - 1} AS DOUBLE) /
         |    (CAST(f AS DOUBLE) * power(2.0, -64) + 0.5), 6) AS kmv_est
         |FROM cnt LEFT JOIN kth USING (ws)
         |ORDER BY wstart""".stripMargin,
    "d34_stream_topk" ->
      s"""WITH w AS (
         |  SELECT event_id, value,
         |    date_trunc('hour', $duckSecTs) AS ws
         |  FROM events),
         |r AS (
         |  SELECT ws, event_id, value, row_number() OVER (
         |    PARTITION BY ws ORDER BY value DESC, event_id ASC) AS rnk
         |  FROM w)
         |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS wstart,
         |  CAST(rnk AS BIGINT) AS rnk, event_id, value
         |FROM r WHERE rnk <= 5 ORDER BY wstart, rnk""".stripMargin,
    // d34's streamed heap is oracle'd by the batch window-rank twin
    // (value passes through unchanged; the engine negation is an exact
    // IEEE bit flip, so DOUBLE equality holds)
    "d27_stream_tumbling" ->
      s"""SELECT strftime(date_trunc('hour', $duckSecTs), '%Y-%m-%d %H:%M:%S') AS wstart,
         |  event_type, count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS sum_value,
         |  min(value) AS min_value, max(value) AS max_value
         |FROM events
         |GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin,
    // d32: the LEFT OUTER twin. Matched rows = d28's inner join. An
    // UNMATCHED click is only emitted once the engine can prove no
    // purchase can still match: its 1-hour horizon must lie strictly
    // below the FINAL GLOBAL watermark, which under the default
    // multipleWatermarkPolicy=min is the MIN across both sides of
    // (max event time − 10 min). The oracle encodes exactly that rule —
    // the last click of the fixture is correctly HELD, not emitted.
    "d32_stream_join_left" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, $duckSecTs AS sts
         |           FROM events),
         |c AS (SELECT * FROM e WHERE event_type = 'click'),
         |p AS (SELECT * FROM e WHERE event_type = 'purchase'),
         |wm AS (SELECT least((SELECT max(sts) FROM c),
         |                    (SELECT max(sts) FROM p))
         |         - INTERVAL 10 MINUTES AS w),
         |j AS (
         |  SELECT c.event_id AS click_id, p.event_id AS purchase_id,
         |    CAST(epoch(p.sts) - epoch(c.sts) AS BIGINT) AS lag_sec,
         |    c.sts AS cts
         |  FROM c LEFT JOIN p ON c.user_id = p.user_id
         |   AND p.sts >= c.sts AND p.sts <= c.sts + INTERVAL 1 HOUR)
         |SELECT click_id, purchase_id, lag_sec FROM j CROSS JOIN wm
         |WHERE purchase_id IS NOT NULL OR cts + INTERVAL 1 HOUR < wm.w
         |ORDER BY click_id, purchase_id""".stripMargin,
    // d28: the stream-stream join's batch twin — inner interval join on
    // second-floored event times
    "d28_stream_join" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, $duckSecTs AS sts
         |           FROM events)
         |SELECT c.event_id AS click_id, p.event_id AS purchase_id,
         |  CAST(epoch(p.sts) - epoch(c.sts) AS BIGINT) AS lag_sec
         |FROM e c JOIN e p ON c.user_id = p.user_id
         | AND c.event_type = 'click' AND p.event_type = 'purchase'
         | AND p.sts >= c.sts AND p.sts <= c.sts + INTERVAL 1 HOUR
         |ORDER BY click_id, purchase_id""".stripMargin,
    // d26: rebuild d03's sessions, then apply the two streaming closing
    // rules in batch SQL — closed-by-next-event (every session except the
    // user's last) OR closed-by-event-time-timeout (gap horizon STRICTLY
    // below the final watermark = global max second)
    // d37: the grouped-map function IS expressible as gaps-and-islands
    // SQL — which is exactly what makes the imperative form oracle-able
    "d37_grouped_map" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type,
         |    CAST(epoch($duckSecTs) AS BIGINT) AS sec, event_id
         |  FROM events),
         |brk AS (
         |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
         |      OR lag(event_type) OVER w <> event_type
         |    THEN 1 ELSE 0 END AS b
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
         |grp AS (
         |  SELECT *, sum(b) OVER (PARTITION BY user_id
         |    ORDER BY sec, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
         |  FROM brk),
         |runs AS (
         |  SELECT user_id, event_type, gid, count(*) AS run_len,
         |    min(sec) AS start_sec, max(sec) AS end_sec
         |  FROM grp GROUP BY user_id, event_type, gid),
         |best AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY run_len DESC, start_sec ASC, gid ASC) AS brn
         |  FROM runs)
         |SELECT user_id, event_type, run_len, start_sec, end_sec
         |FROM best WHERE brn = 1 ORDER BY user_id""".stripMargin,
    // d38: the cogrouped merge as plain aggregates + a null-aware count
    "d38_cogroup" ->
      s"""WITH e AS (
         |  SELECT user_id, CAST(epoch($duckSecTs) AS BIGINT) AS sec
         |  FROM events),
         |o AS (
         |  SELECT o_custkey AS user_id,
         |    CAST(epoch(o_orderdate) AS BIGINT) AS osec
         |  FROM orders),
         |agg_o AS (
         |  SELECT user_id, count(*) AS n_orders, max(osec) AS last_osec
         |  FROM o GROUP BY user_id),
         |agg_e AS (
         |  SELECT user_id, count(*) AS n_events FROM e GROUP BY user_id),
         |after AS (
         |  SELECT e.user_id, count(*) AS n_after
         |  FROM e LEFT JOIN agg_o a ON e.user_id = a.user_id
         |  WHERE a.user_id IS NULL OR e.sec > a.last_osec
         |  GROUP BY e.user_id),
         |keys AS (
         |  SELECT user_id FROM agg_e UNION SELECT user_id FROM agg_o)
         |SELECT k.user_id,
         |  CAST(coalesce(ao.n_orders, 0) AS BIGINT) AS n_orders,
         |  CAST(coalesce(ae.n_events, 0) AS BIGINT) AS n_events,
         |  CAST(coalesce(af.n_after, 0) AS BIGINT)
         |    AS n_events_after_last_order
         |FROM keys k
         |LEFT JOIN agg_o ao USING (user_id)
         |LEFT JOIN agg_e ae USING (user_id)
         |LEFT JOIN after af USING (user_id)
         |ORDER BY user_id""".stripMargin,
    "d26_stream_sessions" ->
      s"""$sessionCtes,
         |per_sess AS (
         |  SELECT user_id, session_id,
         |    CAST(epoch(min(sts)) AS BIGINT) AS start_sec,
         |    CAST(epoch(max(sts)) AS BIGINT) AS end_sec,
         |    count(*) AS n_events
         |  FROM sess GROUP BY user_id, session_id),
         |ranked AS (
         |  SELECT *, max(session_id) OVER (PARTITION BY user_id) AS last_sid
         |  FROM per_sess),
         |mx AS (SELECT CAST(max(epoch(sts)) AS BIGINT) AS max_sec FROM e)
         |SELECT user_id, start_sec, end_sec, n_events
         |FROM ranked, mx
         |WHERE session_id < last_sid OR end_sec + 1800 < max_sec
         |ORDER BY user_id, start_sec""".stripMargin,
    // d36: the native session_window streaming form — watermark-emitted
    // sessions are those whose gap horizon the final watermark REACHED
    // (INCLUSIVE: SessionWindowStateStoreSaveExec evicts windows with
    // end <= watermark, the opposite convention to d26's strict
    // EventTimeTimeout — StreamingSpec pins both boundaries at ±1 s).
    // Non-last sessions always qualify: their closing event is > gap
    // later, so end + 1800 < closing ts <= max ts.
    "d36_stream_session_window" ->
      s"""$sessionCtes,
         |per_sess AS (
         |  SELECT user_id, session_id,
         |    CAST(epoch(min(sts)) AS BIGINT) AS start_sec,
         |    CAST(epoch(max(sts)) AS BIGINT) AS end_sec,
         |    count(*) AS n_events
         |  FROM sess GROUP BY user_id, session_id),
         |mx AS (SELECT CAST(max(epoch(sts)) AS BIGINT) AS max_sec FROM e)
         |SELECT user_id, start_sec, end_sec, n_events
         |FROM per_sess, mx
         |WHERE end_sec + 1800 <= max_sec
         |ORDER BY user_id, start_sec""".stripMargin,
    // d23: Spark dayofweek() is 1-based Sunday, DuckDB's 0-based —
    // the +1 pins the calendar-API fork explicitly
    "d23_hourly_profile" ->
      s"""WITH e AS (SELECT user_id, value, $duckSecTs AS sts FROM events)
         |SELECT dayofweek(sts) + 1 AS dow, hour(sts) AS hod,
         |  count(*) AS n, count(DISTINCT user_id) AS n_users,
         |  CAST(sum(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS sum_value
         |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // d24: open/close re-derived by rank selection over the identical
    // (ts, event_id) total order — same values Spark's struct min/max picks
    "d24_ohlc" ->
      s"""WITH e AS (SELECT event_id, event_type, value, $duckSecTs AS sts
         |           FROM events),
         |r AS (
         |  SELECT CAST(sts AS DATE) AS day, event_type, value,
         |    row_number() OVER (PARTITION BY CAST(sts AS DATE), event_type
         |                       ORDER BY sts ASC, event_id ASC) AS rna,
         |    row_number() OVER (PARTITION BY CAST(sts AS DATE), event_type
         |                       ORDER BY sts DESC, event_id DESC) AS rnd
         |  FROM e)
         |SELECT strftime(day, '%Y-%m-%d') AS day, event_type,
         |  count(*) AS n,
         |  max(CASE WHEN rna = 1 THEN value END) AS open_v,
         |  max(value) AS high_v, min(value) AS low_v,
         |  max(CASE WHEN rnd = 1 THEN value END) AS close_v
         |FROM r GROUP BY day, event_type ORDER BY day, event_type""".stripMargin,
    // d25: the oracle runs the textbook single-ordered sweep; the engine's
    // two-pass bucketed prefix sum must reproduce it exactly. Ties at one
    // (ts, delta) permute identical rows, so the multiset — and the
    // (max, earliest-ts, smallest-delta) pick — is deterministic.
    "d25_concurrency" ->
      s"""$sessionCtes,
         |iv AS (
         |  SELECT user_id, session_id,
         |    min(sts) AS s_start, max(sts) AS s_end
         |  FROM sess GROUP BY user_id, session_id),
         |deltas AS (
         |  SELECT s_start AS ts, 1 AS delta FROM iv
         |  UNION ALL
         |  SELECT s_end AS ts, -1 AS delta FROM iv),
         |runs AS (
         |  SELECT ts, delta,
         |    sum(delta) OVER (ORDER BY ts ASC, delta ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS concurrency
         |  FROM deltas)
         |SELECT CAST(concurrency AS BIGINT) AS peak_concurrency,
         |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS peak_at
         |FROM runs ORDER BY concurrency DESC, ts ASC, delta ASC
         |LIMIT 1""".stripMargin,
    "d21_attribution" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, value,
         |             $duckSecTs AS ts FROM events),
         |lagged AS (
         |  SELECT user_id, ts, event_id, event_type, value,
         |    lag(ts) OVER (PARTITION BY user_id
         |                  ORDER BY ts ASC, event_id ASC) AS prev_ts
         |  FROM e),
         |flagged AS (
         |  SELECT user_id, ts, event_id, event_type, value,
         |    CASE WHEN prev_ts IS NULL
         |           OR epoch(ts) - epoch(prev_ts) > 1800
         |         THEN 1 ELSE 0 END AS new_s
         |  FROM lagged),
         |sess AS (
         |  SELECT user_id, ts, event_id, event_type, value,
         |    sum(new_s) OVER (PARTITION BY user_id
         |      ORDER BY ts ASC, event_id ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS session_id,
         |    last_value(CASE WHEN new_s = 1 THEN event_type END
         |        IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS channel
         |  FROM flagged)
         |SELECT channel, count(*) AS n_purchases,
         |  count(DISTINCT (user_id, session_id)) AS n_sessions,
         |  CAST(sum(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS revenue
         |FROM sess WHERE event_type = 'purchase'
         |GROUP BY channel ORDER BY channel""".stripMargin,
    "d20_scd2" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, $duckSecTs AS ts
         |           FROM events),
         |ch AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    lag(event_type) OVER (PARTITION BY user_id
         |                          ORDER BY ts ASC, event_id ASC)
         |      AS prev_type
         |  FROM e),
         |c2 AS (SELECT user_id, ts, event_id, event_type FROM ch
         |       WHERE prev_type IS NULL OR prev_type <> event_type),
         |v AS (
         |  SELECT user_id, event_type, ts AS effective_from,
         |    lead(ts) OVER (PARTITION BY user_id
         |                   ORDER BY ts ASC, event_id ASC) AS effective_to,
         |    row_number() OVER (PARTITION BY user_id
         |                       ORDER BY ts ASC, event_id ASC) AS version_no
         |  FROM c2)
         |SELECT user_id, event_type, effective_from, effective_to,
         |  version_no, effective_to IS NULL AS is_current
         |FROM v ORDER BY user_id, version_no""".stripMargin,
    "d19_transitions" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, $duckSecTs AS ts
         |           FROM events),
         |nx AS (
         |  SELECT event_type AS from_type,
         |    lead(event_type) OVER (PARTITION BY user_id
         |                           ORDER BY ts ASC, event_id ASC) AS to_type
         |  FROM e),
         |pairs AS (
         |  SELECT from_type, to_type, count(*) AS n
         |  FROM nx WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |tot AS (SELECT from_type, sum(n) AS row_total
         |        FROM pairs GROUP BY 1)
         |SELECT p.from_type, p.to_type, p.n,
         |  CAST(p.n AS DOUBLE) / t.row_total AS p
         |FROM pairs p JOIN tot t USING (from_type)
         |ORDER BY p.from_type, p.to_type""".stripMargin,
    "d17_window_topk" ->
      s"""WITH e AS (SELECT date_trunc('hour', $duckSecTs) AS hour, user_id
         |           FROM events),
         |c AS (SELECT hour, user_id, count(*) AS n_events
         |      FROM e GROUP BY 1, 2),
         |r AS (SELECT hour, user_id, n_events, row_number() OVER (
         |        PARTITION BY hour ORDER BY n_events DESC, user_id ASC)
         |        AS rk
         |      FROM c)
         |SELECT hour, user_id, CAST(n_events AS BIGINT) AS n_events,
         |  CAST(rk AS INTEGER) AS rk
         |FROM r WHERE rk <= 3 ORDER BY hour, rk""".stripMargin,
    "d18_streaks" ->
      s"""WITH days AS (
         |  SELECT DISTINCT user_id, CAST($duckSecTs AS DATE) AS day
         |  FROM events),
         |g AS (SELECT user_id, day,
         |        day - CAST(row_number() OVER (
         |          PARTITION BY user_id ORDER BY day ASC) AS INTEGER)
         |          AS anchor
         |      FROM days),
         |i AS (SELECT user_id, anchor, count(*) AS len,
         |        min(day) AS streak_start, max(day) AS streak_end
         |      FROM g GROUP BY 1, 2),
         |r AS (SELECT user_id, streak_start, row_number() OVER (
         |        PARTITION BY user_id
         |        ORDER BY len DESC, streak_start DESC) AS rn
         |      FROM i),
         |a AS (SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
         |        CAST(count(*) AS BIGINT) AS n_streaks
         |      FROM i GROUP BY user_id)
         |SELECT a.user_id, a.longest_streak, a.n_streaks,
         |  r.streak_start AS best_start
         |FROM a JOIN r ON a.user_id = r.user_id AND r.rn = 1
         |ORDER BY a.user_id""".stripMargin,
    "e05_datetime_kitchen" ->
      """WITH o AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
        |  FROM orders WHERE o_orderkey <= 1000)
        |SELECT o_orderkey, d,
        |  CAST(date_part('year', d) AS INTEGER) AS y,
        |  CAST(date_part('quarter', d) AS INTEGER) AS q,
        |  CAST(date_part('month', d) AS INTEGER) AS m,
        |  CAST(date_part('day', d) AS INTEGER) AS dom,
        |  CAST(date_part('dow', d) + 1 AS INTEGER) AS dow,
        |  CAST(date_part('doy', d) AS INTEGER) AS doy,
        |  CAST(date_part('week', d) AS INTEGER) AS wk,
        |  last_day(d) AS month_end,
        |  CAST(d + INTERVAL 2 MONTH AS DATE) AS plus2m,
        |  d + 45 AS plus45d,
        |  CAST(date_trunc('month', d) AS DATE) AS month_start,
        |  CAST(date_diff('day', DATE '1995-01-01', d) AS INTEGER)
        |    AS days_since
        |FROM o ORDER BY o_orderkey""".stripMargin,
    "d15_funnel" ->
      s"""WITH e AS (SELECT user_id, event_type, $duckSecTs AS ts
         |           FROM events),
         |v AS (SELECT user_id, min(ts) AS t_view FROM e
         |      WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT e.user_id, min(e.ts) AS t_click
         |      FROM e JOIN v USING (user_id)
         |      WHERE e.event_type = 'click' AND e.ts > v.t_view
         |        AND e.ts <= v.t_view + INTERVAL 24 HOURS
         |      GROUP BY e.user_id),
         |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
         |      FROM e JOIN c USING (user_id)
         |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
         |        AND e.ts <= c.t_click + INTERVAL 24 HOURS
         |      GROUP BY e.user_id)
         |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
         |  1 + CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END
         |    + CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END AS stage
         |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
         |ORDER BY v.user_id""".stripMargin,
    "d16_retention" ->
      s"""WITH e AS (SELECT user_id, CAST($duckSecTs AS DATE) AS day
         |           FROM events),
         |cohort AS (SELECT user_id, min(day) AS cohort_day
         |           FROM e GROUP BY user_id),
         |active AS (SELECT DISTINCT user_id, day FROM e)
         |SELECT c.cohort_day,
         |  CAST(date_diff('day', c.cohort_day, a.day) AS INTEGER)
         |    AS day_offset,
         |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
         |FROM active a JOIN cohort c USING (user_id)
         |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    "d14_rolling_distinct" ->
      s"""WITH e AS (SELECT event_id, event_type, user_id,
         |            $duckSecTs AS sts FROM events)
         |SELECT event_id, event_type,
         |  CAST(count(DISTINCT user_id) OVER (
         |    PARTITION BY event_type ORDER BY sts ASC, event_id ASC
         |    ROWS BETWEEN 99 PRECEDING AND CURRENT ROW) AS INTEGER)
         |    AS d_users_100
         |FROM e ORDER BY event_id""".stripMargin,
    // same frame, same rank-selected element — the median is a data
    // value, never interpolated, so the DOUBLE hash-matches exactly
    "d22_rolling_median" ->
      s"""WITH e AS (SELECT event_id, event_type, value,
         |            $duckSecTs AS sts FROM events),
         |f AS (SELECT event_id, event_type,
         |  list_sort(list(value) OVER (
         |    PARTITION BY event_type ORDER BY sts ASC, event_id ASC
         |    ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)) AS frame
         |  FROM e)
         |SELECT event_id, event_type,
         |  frame[(len(frame) + 1) // 2] AS med_25
         |FROM f ORDER BY event_id""".stripMargin,
    // identical semantics to d06/d06b — the physical operator changed,
    // the answer must not
    "d12_asof_native" -> asofOracle,
    // the recursive frontier advances one event per user per step,
    // applying the identical 0.25·x + 0.75·prev (both constants exact
    // binary fractions, left-to-right IEEE ops) from the same seed
    "d13_ewma" ->
      """WITH RECURSIVE ev AS (
        |  SELECT event_id, user_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events),
        |r AS (
        |  SELECT event_id, user_id, value, rn, value AS ewma
        |  FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.event_id, e.user_id, e.value, e.rn,
        |    0.25 * e.value + 0.75 * r.ewma
        |  FROM ev e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
        |SELECT event_id, user_id, value,
        |  CAST(floor(ewma * 1000000) AS BIGINT) AS ewma_micro
        |FROM r ORDER BY event_id""".stripMargin,
    // the plain range-join form the bucketed equi-join provably equals
    "d11_interval_join" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |    epoch_ns(ts) // 1000000000 AS sec
        |  FROM events)
        |SELECT a.event_id AS event_id, a.event_type AS event_type,
        |  CAST(count(b.event_id) AS BIGINT) AS n_near
        |FROM e a LEFT JOIN e b
        |  ON a.event_type = b.event_type
        | AND b.sec >= a.sec - 60 AND b.sec <= a.sec
        | AND b.event_id <> a.event_id
        |GROUP BY a.event_id, a.event_type
        |ORDER BY a.event_id""".stripMargin,
    "d10_gap_fill" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT event_type, min(hour) AS h0, max(hour) AS h1
        |  FROM hourly GROUP BY 1),
        |timeline AS (
        |  SELECT event_type, unnest(range(h0, h1 + 1)) AS hour FROM bounds),
        |j AS (
        |  SELECT t.event_type, t.hour, h.n
        |  FROM timeline t LEFT JOIN hourly h USING (event_type, hour))
        |SELECT event_type, CAST(hour AS BIGINT) AS hour,
        |  CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_gap,
        |  CAST(last_value(n IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_filled
        |FROM j ORDER BY event_type, hour""".stripMargin,
    "d09_pivot" ->
      s"""SELECT hour($duckSecTs) AS hour_of_day,
         |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
         |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
         |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
         |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
         |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
         |FROM events GROUP BY 1 ORDER BY hour_of_day""".stripMargin,
    "d06_asof_union" -> asofOracle,
    "e02_map_json" ->
      """SELECT event_type, 'k' AS key, count(*) AS n,
        |  min(v) AS min_v, max(v) AS max_v, CAST(sum(v) AS BIGINT) AS sum_v
        |FROM (SELECT event_type,
        |        CAST(json_extract(props, '$.k') AS INTEGER) AS v FROM events) t
        |WHERE v IS NOT NULL
        |GROUP BY event_type ORDER BY event_type, key""".stripMargin,
    "d08_session_window" ->
      s"""WITH e AS (SELECT event_id, user_id, $duckSecTs AS sts FROM events),
         |lagged AS (
         |  SELECT user_id, sts, event_id,
         |    lag(sts) OVER (PARTITION BY user_id ORDER BY sts ASC, event_id ASC) AS prev_ts
         |  FROM e),
         |flagged AS (
         |  SELECT user_id, sts, event_id,
         |    CASE WHEN prev_ts IS NULL
         |           OR epoch(sts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session
         |  FROM lagged),
         |sess AS (
         |  SELECT user_id,
         |    sum(new_session) OVER (PARTITION BY user_id ORDER BY sts ASC, event_id ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM flagged),
         |per_sess AS (
         |  SELECT user_id, session_id, count(*) AS n_events
         |  FROM sess GROUP BY user_id, session_id)
         |SELECT user_id, count(*) AS n_sessions,
         |  max(n_events) AS max_session_events
         |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin,
    "d01_window_tumbling" ->
      s"""SELECT strftime(date_trunc('hour', $duckSecTs), '%Y-%m-%d %H:%M:%S') AS wstart,
         |  event_type, count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS sum_value,
         |  min(value) AS min_value, max(value) AS max_value
         |FROM events
         |GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin,
    "d02_window_sliding" -> slidingOracle,
    // d31: the streaming sliding window's oracle IS d02's — the decimal
    // window state makes the streamed result bit-equal to the batch one
    "d31_stream_sliding" -> slidingOracle,
    "d03_sessionize" ->
      s"""$sessionCtes,
         |per_sess AS (
         |  SELECT user_id, session_id, count(*) AS n_events,
         |    -- epoch() is DOUBLE in DuckDB; sts is second-floored so the
         |    -- BIGINT cast is exact (Spark side is long arithmetic)
         |    CAST(epoch(max(sts)) - epoch(min(sts)) AS BIGINT) AS duration_sec
         |  FROM sess GROUP BY user_id, session_id)
         |SELECT user_id, count(*) AS n_sessions,
         |  max(n_events) AS max_session_events,
         |  max(duration_sec) AS max_session_sec
         |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin,
    "d04_dedup_first" ->
      s"""SELECT user_id, event_type, event_id,
         |  strftime($duckSecTs, '%Y-%m-%d %H:%M:%S') AS first_ts
         |FROM (
         |  SELECT user_id, event_type, event_id, ts,
         |    row_number() OVER (PARTITION BY user_id, event_type
         |                       ORDER BY ts ASC, event_id ASC) AS rn
         |  FROM events) t
         |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "d05_json_extract" ->
      """SELECT event_type, count(k) AS n, min(k) AS min_k, max(k) AS max_k,
        |  CAST(sum(k) AS BIGINT) AS sum_k
        |FROM (SELECT event_type,
        |        CAST(json_extract(props, '$.k') AS INTEGER) AS k FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "d06_asof_join" -> asofOracle,
    "d07_timeseries_diff" ->
      """WITH d AS (
        |  SELECT event_type,
        |    value - lag(value) OVER (PARTITION BY user_id
        |                             ORDER BY ts ASC, event_id ASC) AS dv
        |  FROM events)
        |SELECT event_type, count(*) AS n_diffs,
        |  round(min(dv), 6) AS min_dv, round(max(dv), 6) AS max_dv,
        |  CAST(sum(CAST(dv AS DECIMAL(11,2))) AS DOUBLE) AS sum_dv
        |FROM d WHERE dv IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
