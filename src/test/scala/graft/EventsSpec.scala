package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hand-computed event fixtures (FIXTURES.md "events_tiny"): window
  * bucketing and sessionization verified against known answers, plus the
  * salted two-phase aggregation pattern for skewed keys. */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  // 6 events, one user: 3 in hour 10, 1 in hour 11, then a >30-min gap,
  // then 2 more — i.e. 2 tumbling buckets (10:xx ×3, 11:xx ×3) and 2
  // sessions (4 events, then 2).
  private lazy val tiny = Seq(
    (1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 10:10:00"),
    (3L, "2024-01-01 10:40:00"), (4L, "2024-01-01 11:05:00"),
    (5L, "2024-01-01 11:50:00"), (6L, "2024-01-01 11:55:00"),
  ).toDF("event_id", "ts_s")
    .select($"event_id", to_timestamp($"ts_s").as("ts"), lit(7L).as("user_id"))

  test("tumbling hour buckets match hand computation") {
    val buckets = tiny.groupBy(date_trunc("hour", $"ts").as("h")).count()
      .orderBy($"h").select($"count").as[Long].collect()
    assert(buckets.sameElements(Array(3L, 3L)))
  }

  test("sessionization (gap > 30 min) finds exactly 2 sessions") {
    val byUser = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val sessions = tiny
      .withColumn("prev", lag($"ts", 1).over(byUser))
      .withColumn("new_s",
        when($"prev".isNull || $"ts".cast("long") - $"prev".cast("long") > 1800, 1)
          .otherwise(0))
      .agg(sum($"new_s")).as[Long].head()
    assert(sessions === 2)
    // and the gap event (id 5, 45 min after id 4) starts the second one
    val flags = tiny
      .withColumn("prev", lag($"ts", 1).over(byUser))
      .withColumn("new_s",
        when($"prev".isNull || $"ts".cast("long") - $"prev".cast("long") > 1800, 1)
          .otherwise(0))
      .orderBy($"event_id").select($"new_s").as[Int].collect()
    assert(flags.sameElements(Array(1, 0, 0, 0, 1, 0)))
  }

  test("sliding 1h/15min windows place an event in exactly 4 windows") {
    val windows = tiny.where($"event_id" === 2L)
      .select(window($"ts", "1 hour", "15 minutes"))
      .count()
    assert(windows === 4)
  }

  test("interval join bucket decomposition equals the direct range join") {
    val q = graft.ops.EventOps.intervalJoin(spark, sf0001)
    // the decomposition's point: candidates come from an equi-join on
    // (type, bucket), never a cartesian per-type expansion
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val e = Tables.events(spark, sf0001)
      .select($"event_id", $"event_type", expr("ts_ns div 1000000000").as("sec"))
    val ref = e.toDF("a_id", "a_type", "a_sec")
      .join(e.toDF("b_id", "b_type", "b_sec"),
        $"a_type" === $"b_type" && $"b_sec" >= $"a_sec" - 60 &&
          $"b_sec" <= $"a_sec" && $"b_id" =!= $"a_id", "left")
      .groupBy($"a_id".as("event_id"), $"a_type".as("event_type"))
      .agg(count($"b_id").as("n_near"))
      .orderBy($"event_id")
    assert(q.collect().toSeq === ref.collect().toSeq)
  }

  test("salted two-phase aggregation equals direct aggregation on skewed keys") {
    // skew pattern: one dominant key; salt splits it across partitions,
    // phase 1 aggregates (key, salt), phase 2 merges per key.
    val skewed = (1 to 1000).map(i => (if (i % 10 == 0) "rare" else "hot", 1L))
      .toDF("k", "v")
    val direct = skewed.groupBy($"k").agg(sum($"v").as("s"))
      .orderBy($"k").as[(String, Long)].collect()
    val salted = skewed
      .withColumn("salt", pmod(hash($"v", monotonically_increasing_id()), lit(8)))
      .groupBy($"k", $"salt").agg(sum($"v").as("ps"))
      .groupBy($"k").agg(sum($"ps").as("s"))
      .orderBy($"k").as[(String, Long)].collect()
    assert(salted.sameElements(direct))
  }

  test("d13 EWMA: hand-computed cascade for one user") {
    import spark.implicits._
    val out = ops.EventOps.ewmaSmooth(spark, sf0001)
    // recompute one user's cascade independently from the raw table
    val ev = Tables.events(spark, sf0001)
      .select($"event_id".cast("long"), $"user_id".cast("long"),
        $"ts_ns".cast("long"), $"value".cast("double"))
      .as[(Long, Long, Long, Double)].collect()
    val uid = ev.head._2
    val mine = ev.filter(_._2 == uid).sortBy(r => (r._3, r._1))
    var prev = 0.0
    val expected = mine.zipWithIndex.map { case ((eid, _, _, v), i) =>
      val e = if (i == 0) v else 0.25 * v + 0.75 * prev
      prev = e
      eid -> math.floor(e * 1000000).toLong
    }.toMap
    val got = out.where($"user_id" === uid)
      .select($"event_id", $"ewma_micro").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("rolling distinct users is bounded by the frame and by row rank") {
    val out = ops.EventOps.rollingDistinct(spark, sf0001).cache()
    val ev = Tables.events(spark, sf0001)
    assert(out.count() == ev.count())
    // 1 <= d_users_100 <= min(100, rank within the partition, frame-
    // aligned ordering (ts, event_id) recovered by joining ts back)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"ts".asc, $"event_id".asc)
    val bad = out
      .join(ev.select($"event_id", $"ts"), "event_id")
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(w))
      .where($"d_users_100" < 1 || $"d_users_100" > 100 ||
        $"d_users_100" > $"rk").count()
    assert(bad == 0)
    out.unpersist()
  }

  test("funnel chains are ordered, deadline-bounded, and stage-consistent") {
    val f = ops.EventOps.funnel(spark, sf0001).cache()
    // chain order with the 24h step deadline
    val badChain = f.where(
      (col("t_click").isNotNull && (col("t_click") <= col("t_view") ||
        col("t_click") > col("t_view") + expr("INTERVAL 24 HOURS"))) ||
      (col("t_purchase").isNotNull && (col("t_purchase") <= col("t_click") ||
        col("t_purchase") > col("t_click") + expr("INTERVAL 24 HOURS")))).count()
    assert(badChain == 0)
    // stage = 1 + #later steps present; purchase requires click
    val badStage = f.where(
      col("stage") =!= lit(1) +
        when(col("t_click").isNotNull, 1).otherwise(0) +
        when(col("t_purchase").isNotNull, 1).otherwise(0) ||
      (col("t_purchase").isNotNull && col("t_click").isNull)).count()
    assert(badStage == 0)
    f.unpersist()
  }

  test("retention has an offset-0 cell per cohort bounded by cohort size") {
    val r = ops.EventOps.cohortRetention(spark, sf0001).cache()
    assert(r.where(col("day_offset") < 0).count() == 0)
    // every cohort's day-0 cell exists and equals the cohort's size
    // (every user is active on their own first day by construction)
    val cohortSizes = Tables.events(spark, sf0001)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
      .groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("sz"))
    val day0 = r.where(col("day_offset") === 0)
    val bad = day0.join(cohortSizes, "cohort_day")
      .where(col("n_active") =!= col("sz")).count()
    assert(bad == 0)
    assert(day0.count() == cohortSizes.count())
    r.unpersist()
  }

  test("scd2: adjacent intervals, one open version, no same-value versions") {
    val h = ops.EventOps.scd2History(spark, sf0001).cache()
    // exactly one open (current) version per business key
    val multiOpen = h.where(col("is_current"))
      .groupBy("user_id").count().where(col("count") =!= 1).count()
    assert(multiOpen == 0)
    // versions are contiguous from 1 and intervals are forward-ordered
    val wv = Window.partitionBy(col("user_id")).orderBy(col("version_no"))
    val seq = h.withColumn("rn", row_number().over(wv))
    assert(seq.where(col("rn") =!= col("version_no")).count() == 0)
    assert(h.where(col("effective_to") < col("effective_from")).count() == 0)
    // interval adjacency: each version closes exactly where the next opens
    val gaps = h.withColumn("next_from", lead(col("effective_from"), 1).over(wv))
      .where(col("next_from").isNotNull &&
        col("effective_to") =!= col("next_from")).count()
    assert(gaps == 0)
    // consecutive versions really are changes (collapse law)
    val noops = h.withColumn("prev_type", lag(col("event_type"), 1).over(wv))
      .where(col("prev_type").isNotNull &&
        col("prev_type") === col("event_type")).count()
    assert(noops == 0)
    // INDEPENDENT reconstruction: fold the raw stream on the driver
    // (1000 events at sf0.001) with plain Scala — no window functions,
    // no shared code path — and demand the history's per-user version
    // sequence equals the collapsed event-type sequence
    val expected = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        val seq = rows.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
          .map(_.getString(3)).toList
        u -> seq.foldLeft(List.empty[String]) {
          case (acc, t) if acc.headOption.contains(t) => acc
          case (acc, t) => t :: acc
        }.reverse
      }
    val actual = h.orderBy(col("user_id"), col("version_no"))
      .select(col("user_id"), col("event_type"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) => u -> rows.map(_.getString(1)).toList }
    assert(actual == expected, "history types must equal the independent fold")
    h.unpersist()
  }

  test("transition matrix: conservation and row-stochastic probabilities") {
    val tm = ops.EventOps.transitionMatrix(spark, sf0001).cache()
    // conservation: every event except each user's last contributes
    // exactly one transition, so Σn = |events| − |users|
    val ev = Tables.events(spark, sf0001)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(tm.agg(sum(col("n"))).head().getLong(0) == expected)
    // row-stochastic: each from-state's probabilities sum to 1 (p is an
    // unrounded exact-quotient; the slack only covers float addition of
    // the per-cell quotients in this test's own sum)
    val badRow = tm.groupBy(col("from_type"))
      .agg(sum(col("p")).as("sp"), count(lit(1)).as("cells"))
      .where(abs(col("sp") - 1.0) > col("cells") * 1e-12).count()
    assert(badRow == 0)
    // probabilities are positive and at most 1
    assert(tm.where(col("p") <= 0 || col("p") > 1).count() == 0)
    tm.unpersist()
  }

  test("attribution conserves purchases and revenue across channels") {
    val at = ops.EventOps.attribution(spark, sf0001).cache()
    val ev = Tables.events(spark, sf0001).where(col("event_type") === "purchase")
    // every purchase lands in exactly one channel bucket
    assert(at.agg(sum(col("n_purchases"))).head().getLong(0) == ev.count())
    // revenue conservation: the attributed total equals the exact
    // decimal sum over all purchase rows
    val attributed = at.agg(sum(col("revenue"))).head().getDouble(0)
    val direct = ev
      .agg(expr("CAST(sum(CAST(value AS DECIMAL(9,2))) AS DOUBLE)"))
      .head().getDouble(0)
    assert(math.abs(attributed - direct) < 1e-6,
      s"attributed $attributed != direct $direct")
    // channels are event types (the session opener is an event)
    val types = Tables.events(spark, sf0001)
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(at.select("channel").collect().map(_.getString(0)).toSet.subsetOf(types))
    at.unpersist()
  }

  test("transition matrix plan: row totals broadcast, stream shuffles once") {
    val p = ops.EventOps.transitionMatrix(spark, sf0001)
      .queryExecution.executedPlan.toString
    // the |types|²-sized totals table must broadcast into the pair
    // probe — a sort-merge join here would re-shuffle the pair table
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // one Window pass (the lead successor) — the counts and totals are
    // aggregates over its output, not extra stream passes
    assert("(?s)Window".r.findAllIn(p).size >= 1, p)
  }

  test("d22: rolling median is a frame value and robust to a spike") {
    import org.apache.spark.sql.functions._
    val med = ops.EventOps.rollingMedian(spark, sf0001)
    val vals = Tables.events(spark, sf0001)
      .select(col("value")).distinct().collect().map(_.getDouble(0)).toSet
    val rows = med.collect()
    // rank-selected: every median IS an actual data value
    assert(rows.forall(r => vals.contains(r.getAs[Double]("med_25"))))
    // robustness: medians ignore isolated spikes, so the rolling median
    // never exceeds the global max and never goes below the global min
    val (lo, hi) = (vals.min, vals.max)
    assert(rows.forall { r =>
      val m = r.getAs[Double]("med_25"); m >= lo && m <= hi })
  }

  test("d37 grouped-map plan: one hash exchange on user_id feeding " +
    "MapGroups — the grouped-map contract's physical shape") {
    val p = ops.EventOps.groupedMapRuns(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("MapGroups"), s"expected a MapGroups node:\n$p")
    // groupByKey materializes the key as a `value` column — the group
    // shuffle is ONE hash exchange on it (the final rangepartitioning
    // is the declared orderBy, not a second data pass)
    assert("Exchange hashpartitioning\\(value".r.findFirstIn(p).isDefined,
      s"group shuffle must hash on the extracted key:\n$p")
  }

  test("d37 grouped-map agrees with the gaps-and-islands SQL form") {
    // the imperative per-group function vs the declarative window chain
    // (zero shared code — the double-implementation gate; ScaleCheck
    // re-asserts this at sf1): identical rows
    val a = ops.EventOps.groupedMapRuns(spark, sf0001)
      .collect().map(_.toString)
    val b = ops.EventOps.groupedMapRunsDeclarative(spark, sf0001)
      .collect().map(_.toString)
    assert(a.sameElements(b),
      "flatMapGroups result must equal the window-chain form")
  }

  test("d38 cogroup plan: both inputs co-partitioned into one CoGroup") {
    val p = ops.EventOps.cogroupPostOrder(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("CoGroup"), s"expected a CoGroup node:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size >= 2,
      s"both sides must shuffle to the key:\n$p")
  }
}
