package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams

/** Streaming twins must agree with their batch counterparts when the
  * whole table is replayed through the file stream source. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming tumbling window agrees with batch tumbling window") {
    Streams.runToMemory(Streams.tumbling(spark, sf0001), "stream_tumbling",
      OutputMode.Complete())
    val streamed = spark.table("stream_tumbling")
      .select(date_format($"wstart", "yyyy-MM-dd HH:mm:ss").as("wstart"),
        $"event_type", $"n")
      .orderBy($"wstart", $"event_type")
      .as[(String, String, Long)].collect()
    val batch = ops.EventOps.windowTumbling(spark, sf0001)
      .select($"wstart", $"event_type", $"n")
      .as[(String, String, Long)].collect()
    assert(streamed.sameElements(batch))
  }

  test("streaming session counts agree with batch sessionize") {
    Streams.runToMemory(Streams.sessionCounts(spark, sf0001).toDF(),
      "stream_sessions", OutputMode.Update())
    val streamed = spark.table("stream_sessions")
      .orderBy($"user_id").as[(Long, Int)].collect()
    val batch = ops.EventOps.sessionize(spark, sf0001)
      .select($"user_id", $"n_sessions".cast("int"))
      .as[(Long, Int)].collect()
    assert(streamed.sameElements(batch))
  }

  test("flatMapGroupsWithState closed sessions = batch sessions minus the open one") {
    Streams.runToMemory(Streams.closedSessions(spark, sf0001).toDF(),
      "stream_closed", OutputMode.Append())
    val closedPerUser = spark.table("stream_closed")
      .groupBy($"user_id").count()
      .as[(Long, Long)].collect().toMap
    val batch = ops.EventOps.sessionize(spark, sf0001)
      .select($"user_id", $"n_sessions").as[(Long, Long)].collect()
    // every user's final session is still open, so closed = total - 1
    batch.foreach { case (u, n) =>
      assert(closedPerUser.getOrElse(u, 0L) === n - 1, s"user $u")
    }
  }

  test("stream-stream join (click→purchase ≤1h) agrees with batch join") {
    Streams.runToMemory(Streams.clickToPurchase(spark, sf0001), "stream_ssj",
      OutputMode.Append())
    val streamed = spark.table("stream_ssj")
      .select($"click_id", $"purchase_id").as[(Long, Long)].collect().toSet
    val batch = Streams.clickToPurchaseBatch(spark, sf0001)
      .select($"click_id", $"purchase_id").as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(batch.nonEmpty, "fixture should contain click→purchase pairs")
  }

  test("foreachBatch sink writes windowed aggregates to parquet") {
    val out = "target/test-stream-sink"
    val dir = new java.io.File(out)
    if (dir.exists()) {
      java.nio.file.Files.walk(dir.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val q = Streams.tumbling(spark, sf0001).writeStream
      .outputMode(OutputMode.Complete())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.write.mode("overwrite").parquet(out)
      }
      .start()
    q.processAllAvailable(); q.stop()
    val written = spark.read.parquet(out).count()
    val expected = ops.EventOps.windowTumbling(spark, sf0001).count()
    assert(written === expected)
  }

  test("watermark drops late events: a row older than the watermark " +
    "does not resurrect its closed window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val counts = input.toDF().toDF("sec", "key")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long").as("wstart"), col("key"), col("n"))
    val q = counts.writeStream.format("memory").queryName("wm_late")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two on-time events in window [0,600); one far-future event
      // at t=3600 pushes the watermark to 3000 and finalizes that window
      input.addData((10L, "a"), (20L, "a"), (3600L, "b"))
      q.processAllAvailable()
      val afterClose = spark.table("wm_late")
        .as[(Long, String, Long)].collect().toSet
      assert(afterClose == Set((0L, "a", 2L)),
        s"window [0,600) should emit exactly once: $afterClose")
      // batch 2: a late event inside the closed window — must be dropped,
      // not emitted as a new/updated row
      input.addData((30L, "a"))
      q.processAllAvailable()
      val afterLate = spark.table("wm_late")
        .as[(Long, String, Long)].collect().toSet
      assert(afterLate == afterClose,
        s"late event leaked into output: $afterLate")
      assert(q.lastProgress.stateOperators(0).numRowsDroppedByWatermark
        >= 1L, "expected the late row to be counted as dropped")
    } finally q.stop()
  }

  test("event-time timeout closes an idle session when the watermark passes its gap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val sessions = streaming.Streams.closedSessionsTimeoutFrom(
      input.toDF().toDF("user_id", "sec")
        .withColumn("ts", timestamp_seconds(col("sec")))
        .withWatermark("ts", "0 seconds")
        .select(col("user_id"), col("ts"))
        .as[(Long, java.sql.Timestamp)])
    val q = sessions.toDF().writeStream.format("memory").queryName("to_sess")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 sends two events 100s apart — one open session;
      // nothing closes (watermark = 200)
      input.addData((1L, 100L), (1L, 200L))
      q.processAllAvailable()
      assert(spark.table("to_sess").count() === 0)
      // batch 2: only user 2 speaks, far in the future — the watermark
      // jumps past user 1's gap horizon (200 + 1800), so user 1's session
      // must close via TIMEOUT, with no user-1 event in the batch
      input.addData((2L, 10000L))
      q.processAllAvailable()
      val closed = spark.table("to_sess")
        .as[(Long, Long, Long, Int)].collect().toSet
      assert(closed === Set((1L, 100L, 200L, 2)),
        s"expected user 1's idle session to close by timeout: $closed")
      // batch 3: advance far again — user 2's session times out too
      input.addData((3L, 100000L))
      q.processAllAvailable()
      val all = spark.table("to_sess")
        .as[(Long, Long, Long, Int)].collect().toSet
      assert(all === Set((1L, 100L, 200L, 2), (2L, 10000L, 10000L, 1)), all.toString)
    } finally q.stop()
  }

  test("timeout boundary is STRICT: gap horizon == watermark stays open, +1s closes") {
    // pins the rule the d26 oracle encodes (end_sec + 1800 < max_sec):
    // FlatMapGroupsWithStateExec evicts state with timeoutTimestamp
    // strictly below the event-time watermark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val sessions = streaming.Streams.closedSessionsTimeoutFrom(
      input.toDF().toDF("user_id", "sec")
        .withColumn("ts", timestamp_seconds(col("sec")))
        .withWatermark("ts", "0 seconds")
        .select(col("user_id"), col("ts"))
        .as[(Long, java.sql.Timestamp)])
    val q = sessions.toDF().writeStream.format("memory").queryName("to_strict")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, 100L))
      q.processAllAvailable()
      // watermark lands EXACTLY on the horizon 100 + 1800: must stay open
      input.addData((2L, 1900L))
      q.processAllAvailable()
      assert(spark.table("to_strict").count() === 0,
        "horizon == watermark must NOT time out (strict <)")
      // one second past the horizon: user 1 closes
      input.addData((3L, 1901L))
      q.processAllAvailable()
      val closed = spark.table("to_strict")
        .as[(Long, Long, Long, Int)].collect().toSet
      assert(closed === Set((1L, 100L, 100L, 1)), closed.toString)
    } finally q.stop()
  }

  test("d36 session_window emission boundary is INCLUSIVE, and bridged " +
    "sessions MERGE in state") {
    // pins the rule the d36 oracle encodes (end_sec + 1800 <= max_sec):
    // append-mode session windows are emitted once the event-time
    // watermark REACHES the window end — the opposite convention to
    // d26's strict EventTimeTimeout. A 1000 s watermark delay keeps the
    // bridging event from being late-dropped (delay 0 would drop any
    // event below the batch max, making cross-batch merge untestable).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val agg = input.toDF().toDF("user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "1000 seconds")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").cast("long")
        .as("start_sec"), col("n_events"))
    val q = agg.writeStream.format("memory").queryName("swin_bound")
      .outputMode(OutputMode.Append()).start()
    try {
      // two events 2000 s apart: two distinct sessions for user 1
      // (watermark after this batch: 2100 − 1000 = 1100)
      input.addData((1L, 100L), (1L, 2100L))
      q.processAllAvailable()
      // an event BETWEEN them within gap of both (1200 ≥ watermark, so
      // not late): the two sessions must MERGE into one in state
      input.addData((1L, 1200L))
      q.processAllAvailable()
      // watermark 1 s BELOW the merged horizon 2100+1800: stays open
      input.addData((2L, 4899L))
      q.processAllAvailable()
      assert(spark.table("swin_bound")
        .where(col("user_id") === 1L).count() === 0,
        "watermark below horizon must not emit")
      // watermark exactly ON the horizon: emits (INCLUSIVE) — and as
      // ONE merged 3-event session, not the two batch-1 fragments
      input.addData((3L, 4900L))
      q.processAllAvailable()
      val rows = spark.table("swin_bound")
        .where(col("user_id") === 1L)
        .as[(Long, Long, Long)].collect().toSet
      assert(rows === Set((1L, 100L, 3L)),
        s"expected ONE merged 3-event session from 100s at horizon == " +
          s"watermark: $rows")
    } finally q.stop()
  }

  test("d36 session_window ADJACENCY boundary: events exactly gap " +
    "seconds apart MERGE into one session (pinned vs the oracle's " +
    "diff > 1800 split rule)") {
    // ADVICE r12: the emission-boundary probe above pins when a session
    // EMITS, not where two adjacent events fall. Measured (batch and the
    // streaming state-merge path agree): an event at prev + gap lands
    // INSIDE the previous window — session_window's merge condition is
    // start <= current end — so only diff > gap splits, exactly the
    // oracle's predicate. An event at prev + gap + 1 splits. If a Spark
    // upgrade flips the merge condition to strict, this fails HERE, not
    // as an unexplained d36 hash drift on regenerated fixtures.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val agg = input.toDF().toDF("user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "1000 seconds")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").cast("long")
        .as("start_sec"), col("n_events"))
    val q = agg.writeStream.format("memory").queryName("swin_adj")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: 100 and 1900 — EXACTLY 1800 apart; user 3: 100 and 1901
      input.addData((1L, 100L), (1L, 1900L), (3L, 100L), (3L, 1901L))
      q.processAllAvailable()
      // push the watermark far past both horizons so everything emits
      input.addData((9L, 100000L))
      q.processAllAvailable()
      val rows = spark.table("swin_adj")
        .where(col("user_id").isin(1L, 3L))
        .as[(Long, Long, Long)].collect().toSet
      assert(rows === Set((1L, 100L, 2L), (3L, 100L, 1L), (3L, 1901L, 1L)),
        s"adjacency boundary drifted: $rows")
    } finally q.stop()
  }

  test("d26 declared streaming query agrees with its two batch closing rules") {
    val streamed = ops.EventOps.streamClosedSessions(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // batch twin: every session but each user's last, plus last sessions
    // whose gap horizon is strictly below the global max second
    val ev = Tables.events(spark, sf0001)
      .select($"user_id", $"ts".cast("long").as("sec"), $"event_id")
      .as[(Long, Long, Long)].collect()
    val maxSec = ev.map(_._2).max
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val secs = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var start = secs.head; var last = secs.head; var n = 1L
      secs.tail.foreach { t =>
        if (t - last > 1800) { sessions += ((start, last, n)); start = t; n = 0L }
        last = t; n += 1
      }
      sessions += ((start, last, n))
      sessions.zipWithIndex.collect {
        case ((st, en, ne), i)
            if i < sessions.size - 1 || en + 1800 < maxSec =>
          (u, st, en, ne)
      }
    }.sortBy(t => (t._1, t._2))
    assert(streamed === expected)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup emits one row per (user, event_type)") {
    Streams.runToMemory(Streams.dedup(spark, sf0001), "stream_dedup",
      OutputMode.Append())
    val n = spark.table("stream_dedup")
      .select($"user_id", $"event_type").distinct().count()
    val total = spark.table("stream_dedup").count()
    assert(n === total, "dedup emitted duplicate keys")
    val batch = ops.EventOps.dedupFirst(spark, sf0001).count()
    assert(total === batch)
  }

  test("RocksDB state store produces the identical windowed aggregate " +
    "as the default provider") {
    // The default HDFSBackedStateStoreProvider keeps all streaming state
    // on the JVM heap — a non-starter for 100 TB-scale keyed state. The
    // production backend is RocksDB (spilling, incremental checkpoints);
    // pin that switching providers is a pure conf change with bit-equal
    // results, so the scale deployment needs no query rewrite.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      Streams.runToMemory(Streams.tumbling(spark, sf0001), "rocks_tumbling",
        OutputMode.Complete())
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
    val viaRocks = spark.table("rocks_tumbling")
      .select(date_format($"wstart", "yyyy-MM-dd HH:mm:ss").as("wstart"),
        $"event_type", $"n", $"sum_value")
      .orderBy($"wstart", $"event_type")
      .as[(String, String, Long, Double)].collect()
    val viaBatch = ops.EventOps.windowTumbling(spark, sf0001)
      .select($"wstart", $"event_type", $"n", $"sum_value")
      .as[(String, String, Long, Double)].collect()
    assert(viaRocks.sameElements(viaBatch))
  }

  test("checkpoint restart resumes from the offset log: already-committed " +
    "files are not reprocessed, new files are") {
    // The recovery contract a production ingest leans on: the file
    // source's offset log lives in the checkpoint, so a crashed/stopped
    // query restarted with the SAME checkpointLocation picks up exactly
    // the files it had not yet committed — at-least-once delivery to the
    // sink, no silent re-ingest of yesterday's shards.
    import java.nio.file.{Files, Paths, StandardCopyOption}
    def wipe(p: String): Unit = { val f = new java.io.File(p)
      if (f.exists()) Files.walk(f.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(x => Files.delete(x)) }
    val src = "target/test-ckpt/src"; val ckpt = "target/test-ckpt/ckpt"
    wipe("target/test-ckpt")
    Files.createDirectories(Paths.get(src))
    // file 1: the first half of events, file 2 arrives "later"
    val ev = Tables.events(spark, sf0001).select($"event_id", $"user_id")
    val n = ev.count()
    ev.where($"event_id" % 2 === 0).coalesce(1).write
      .mode("overwrite").parquet(s"$src/batch1")
    val schema = spark.read.parquet(s"$src/batch1").schema
    val counts = scala.collection.mutable.ArrayBuffer.empty[Long]
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet").parquet(s"$src/*")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           id: Long) => counts += b.count(): Unit
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    assert(counts.sum === ev.where($"event_id" % 2 === 0).count())
    ev.where($"event_id" % 2 === 1).coalesce(1).write
      .mode("overwrite").parquet(s"$src/batch2")
    runOnce() // restart from the SAME checkpoint
    // total processed = all rows exactly once: batch1 was committed in
    // run 1 and must not be re-delivered in run 2
    assert(counts.sum === n, s"processed ${counts.sum} of $n")
  }

  test("left-outer stream-stream join: matched = inner join; held rows " +
    "are exactly the tail the min-watermark cannot clear") {
    Streams.runToMemory(Streams.clickToPurchaseLeft(spark, sf0001),
      "ssj_left", OutputMode.Append())
    val out = spark.table("ssj_left")
      .select($"click_id", $"purchase_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString.toLong)))
    val matchedStream = out.collect { case (c, Some(p)) => (c, p) }.toSet
    val matchedBatch = Streams.clickToPurchaseBatch(spark, sf0001)
      .select($"click_id", $"purchase_id").as[(Long, Long)].collect().toSet
    assert(matchedStream === matchedBatch, "matched rows must equal d28")
    // emission rule for NULL rows: horizon strictly below the final
    // global watermark = min over sides of (max side ts - 10 min)
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"user_id", $"event_type", $"ts".cast("long").as("sec"))
      .as[(Long, Long, String, Long)].collect()
    val clicks = ev.filter(_._3 == "click")
    val purchases = ev.filter(_._3 == "purchase")
    val wm = math.min(clicks.map(_._4).max, purchases.map(_._4).max) - 600L
    val unmatchedAll = clicks.filter { case (cid, u, _, cs) =>
      !purchases.exists(p => p._2 == u && p._4 >= cs && p._4 <= cs + 3600)
    }
    val expectedNulls = unmatchedAll
      .filter { case (_, _, _, cs) => cs + 3600 < wm }.map(_._1).toSet
    val streamedNulls = out.collect { case (c, None) => c }.toSet
    assert(streamedNulls === expectedNulls,
      s"held=${unmatchedAll.map(_._1).toSet -- streamedNulls}")
    // at least one click must actually be HELD for the law to bite
    assert((unmatchedAll.map(_._1).toSet -- expectedNulls).nonEmpty)
  }

  test("stream-static enrichment join agrees with the batch join+aggregate") {
    Streams.runToMemory(Streams.enriched(spark, sf0001), "stream_enrich",
      OutputMode.Complete())
    val streamed = spark.table("stream_enrich")
      .select(date_format($"wstart", "yyyy-MM-dd HH:mm:ss").as("wstart"),
        $"c_mktsegment", $"n", $"sum_value")
      .orderBy($"wstart", $"c_mktsegment")
      .as[(String, String, Long, Double)].collect()
    val ev = Tables.events(spark, sf0001)
    val batch = ev
      .join(Tables.customer(spark, sf0001)
        .select($"c_custkey", $"c_mktsegment"),
        ev("user_id") === $"c_custkey")
      .groupBy(date_trunc("hour", $"ts").as("w"), $"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(value AS DECIMAL(9,2))) AS DOUBLE)")
          .as("sum_value"))
      .select(date_format($"w", "yyyy-MM-dd HH:mm:ss").as("wstart"),
        $"c_mktsegment", $"n", $"sum_value")
      .orderBy($"wstart", $"c_mktsegment")
      .as[(String, String, Long, Double)].collect()
    assert(streamed.sameElements(batch))
  }

  test("d33 upsert sink: final table = batch aggregate, and batch 2 " +
    "genuinely REPLACED batch-1 rows") {
    // the keep-root variant: this probe inspects the committed v0
    val (res, root, rootFs) =
      Streams.upsertWarehouseRun(spark, sf0001, bucketed = true)
    val table = res
      .select($"user_id", $"n_events", $"sum_value", $"last_sec")
      .as[(Long, Long, Double, Long)].collect()
    val batch = Tables.events(spark, sf0001)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        expr("CAST(sum(CAST(value AS DECIMAL(9,2))) AS DOUBLE)")
          .as("sum_value"),
        max($"ts".cast("long")).as("last_sec"))
      .orderBy($"user_id")
      .as[(Long, Long, Double, Long)].collect()
    assert(table.sameElements(batch))
    // the merge must have done UPDATE work, not just inserts: some key
    // present in the v0 commit carries a DIFFERENT total in the final
    // version — i.e. batch 2 refreshed (replaced) a batch-1 row
    val v0 = spark.read.parquet(s"$root/table/v0")
      .select($"user_id", $"n_events").as[(Long, Long)].collect().toMap
    val vFinal = table.map(r => r._1 -> r._2).toMap
    assert(v0.nonEmpty)
    val updated = v0.count { case (k, n0) =>
      vFinal.get(k).exists(_ != n0) }
    assert(updated > 0,
      "no batch-1 key was refreshed by batch 2 — the merge never took " +
        "its update path on this fixture")
    // and the final version is a superset of keys ever written
    assert(v0.keySet.subsetOf(vFinal.keySet))
    rootFs.delete(new org.apache.hadoop.fs.Path(root), true)
  }

  test("d33 concurrent invocations: per-run sink roots never interfere") {
    // the r11 carried nit: two concurrent runs against the SAME dataset
    // used to share one root (one's delete-at-start could race the
    // other's live checkpoint). Per-run scoping makes them independent:
    // both must finish and serve the identical table.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // start from a clean base so the leftover check below sees only
    // THIS test's runs (earlier layouts / crashed runs are not its bug)
    val base = new org.apache.hadoop.fs.Path(
      s"spark-warehouse/graft_stream_sink/${Tables.dirTag(sf0001)}")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(base, true)
    val Seq(a, b) = Await.result(
      Future.sequence(Seq(
        Future(Streams.upsertWarehouse(spark, sf0001)
          .select($"user_id", $"n_events", $"sum_value").collect()),
        Future(Streams.upsertWarehouse(spark, sf0001)
          .select($"user_id", $"n_events", $"sum_value").collect()))),
      10.minutes)
    assert(a.map(_.toString).sameElements(b.map(_.toString)),
      "concurrent d33 runs must serve identical tables")
    // and neither left a run directory behind
    val leftover =
      if (!fs.exists(base)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(base)
    assert(leftover.isEmpty,
      s"run dirs left behind: ${leftover.map(_.getPath.getName).toSeq}")
  }

  test("d33 law: bucketed merge ≡ full-table merge") {
    // the r11 bucketed sink (each version holds only touched buckets;
    // read point = newest version per bucket) must serve exactly the
    // table the pre-r11 full rewrite served
    val bucketed = Streams.upsertWarehouse(spark, sf0001)
      .select($"user_id", $"n_events", $"sum_value", $"last_sec")
    val full = Streams.upsertWarehouseAs(spark, sf0001, bucketed = false)
      .select($"user_id", $"n_events", $"sum_value", $"last_sec")
    assert(bucketed.except(full).count() == 0 &&
           full.except(bucketed).count() == 0,
      "bucketed-merge table must equal the full-merge table")
  }

  test("d33 bucketed merge rewrites ONLY the buckets a delta touches") {
    import org.apache.hadoop.fs.Path
    val sink = "spark-warehouse/graft_stream_sink_unit/table"
    val fs = new Path(sink).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path("spark-warehouse/graft_stream_sink_unit"), true)
    def delta(ids: Seq[Long], n: Long): org.apache.spark.sql.DataFrame =
      ids.toDF("user_id").withColumn("n_events", lit(n))
    // v0: a wide delta spanning many buckets
    Streams.mergeVersion(spark, sink, 0L, delta(0L until 200L, 1L))
    val v0Buckets = fs.globStatus(new Path(s"$sink/v0/bucket=*")).length
    assert(v0Buckets == Streams.MergeBuckets,
      s"wide delta should land in all buckets, got $v0Buckets")
    // v1: ONE key — the new version must hold exactly that key's bucket
    Streams.mergeVersion(spark, sink, 1L, delta(Seq(7L), 99L))
    val v1Buckets = fs.globStatus(new Path(s"$sink/v1/bucket=*")).length
    assert(v1Buckets == 1,
      s"narrow delta must rewrite exactly 1 bucket, got $v1Buckets")
    // read point: key 7 from v1, everything else still served from v0
    val table = spark.read.parquet(
      Streams.latestBucketPaths(fs, sink).values.map(_.toString).toSeq: _*)
    assert(table.count() == 200)
    assert(table.where($"user_id" === 7L).head().getAs[Long]("n_events")
      == 99L)
    assert(table.where($"n_events" === 99L).count() == 1)
    fs.delete(new Path("spark-warehouse/graft_stream_sink_unit"), true)
  }

  test("d33 sink GC: only fully-shadowed versions beyond keepN are " +
    "deleted; serving bucket map and read-back are bit-identical") {
    import org.apache.hadoop.fs.Path
    val root = "spark-warehouse/graft_stream_sink_gc"
    val sink = s"$root/table"
    val fs = new Path(sink).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(root), true)
    def delta(ids: Seq[Long], n: Long): org.apache.spark.sql.DataFrame =
      ids.toDF("user_id").withColumn("n_events", lit(n))
    // v0: wide (all buckets); v1: narrow (one key); v2: wide again —
    // v0 and v1 are now fully shadowed by v2, v2 is serving every bucket
    Streams.mergeVersion(spark, sink, 0L, delta(0L until 200L, 1L))
    Streams.mergeVersion(spark, sink, 1L, delta(Seq(7L), 99L))
    Streams.mergeVersion(spark, sink, 2L, delta(0L until 200L, 5L))
    def serving(): Map[Int, String] =
      Streams.latestBucketPaths(fs, sink).map { case (b, p) =>
        b -> p.toString }
    def readBack(): Array[String] = spark.read.parquet(
        Streams.latestBucketPaths(fs, sink).values.map(_.toString).toSeq: _*)
      .select($"user_id", $"n_events")
      .collect().map(_.toString).sorted
    val preServing = serving()
    val preRows = readBack()
    // keepN=2 protects v1 even though shadowed (the replay margin);
    // v0 is shadowed AND beyond keepN → the one deletion
    val del1 = Streams.gcSinkVersions(fs, sink, keepN = 2)
    assert(del1.map(new Path(_).getName) == Seq("v0"), del1.toString)
    assert(serving() == preServing, "GC changed the serving bucket map")
    // keepN=1: v1 (fully shadowed) goes too; v2 is serving AND protected
    val del2 = Streams.gcSinkVersions(fs, sink, keepN = 1)
    assert(del2.map(new Path(_).getName) == Seq("v1"), del2.toString)
    assert(serving() == preServing, "GC changed the serving bucket map")
    assert(readBack().sameElements(preRows),
      "read-back table changed across GC")
    // a serving version is NEVER deleted, even with keepN=0, and the
    // sweep is idempotent
    assert(Streams.gcSinkVersions(fs, sink, keepN = 0).isEmpty)
    assert(serving() == preServing)
    fs.delete(new Path(root), true)
  }

  test("d39 dead-letter ingest: the streamed audit is row-identical to " +
    "src03's batch audit, and the quarantine holds the planted census") {
    // the engine-side twin law (the DuckDB oracle certifies both keys
    // against the fixture; this pins streamed ≡ batch directly): the
    // append-only versioned sinks make the audit batching-invariant
    val streamed = Streams.deadLetterIngest(spark, sf0001)
    val row = streamed.head()
    assert(row.getAs[Long]("n_corrupt") ===
      graft.sources.Sources.CorruptPlanted.toLong)
    val batch = graft.sources.Sources.jsonlCorrupt(spark, sf0001)
    assert(streamed.collect().map(_.toString).sameElements(
      batch.collect().map(_.toString)),
      "streamed dead-letter audit must equal the batch src03 audit")
  }

  test("d34 heap state merges ACROSS micro-batches: a later batch's " +
    "better value displaces an earlier batch's heap member") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)]
    val topk = input.toDF().toDF("sec", "event_id", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.TopKAgg.top_k_by(spark, -col("value"),
        col("event_id"), lit(0), 3).as("topk"))
      .select(col("window.start").cast("long").as("wstart"), col("topk"))
    val q = topk.writeStream.format("memory").queryName("d34_merge")
      .outputMode(OutputMode.Complete()).start()
    try {
      // batch 1: heap for window [0,3600) holds ids 1,2,3 (values 5,4,3)
      input.addData((10L, 1L, 5.0), (20L, 2L, 4.0), (30L, 3L, 3.0))
      q.processAllAvailable()
      def ids(): Seq[Long] = spark.table("d34_merge")
        .selectExpr("explode(topk) AS t").select($"t.id").as[Long]
        .collect().toSeq
      assert(ids() == Seq(1L, 2L, 3L), s"batch-1 heap: ${ids()}")
      // batch 2: id 4 (value 10) arrives in the SAME window through a
      // NEW micro-batch — it must displace id 3 from the restored state
      input.addData((40L, 4L, 10.0))
      q.processAllAvailable()
      assert(ids() == Seq(4L, 1L, 2L),
        s"cross-batch merge failed: ${ids()}")
    } finally q.stop()
  }

  test("d35 kmv state is monotone across micro-batches: growing the " +
    "distinct set can only lower the k-th smallest hash") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val h = graft.functions.HashExpressions.mix64(spark,
      graft.functions.HashExpressions.fnv1a64(
        spark, col("user_id").cast("string")))
    val sketch = input.toDF().toDF("sec", "user_id")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "7 days"))
      .agg(graft.functions.KmvAgg.kmv_kth(spark, h, 8).as("f"))
      .select(col("window.start").cast("long").as("wstart"), col("f"))
    val q = sketch.writeStream.format("memory").queryName("d35_merge")
      .outputMode(OutputMode.Complete()).start()
    try {
      def kth(): Option[Long] = spark.table("d35_merge")
        .select($"f").as[Option[Long]].head()
      // batch 1: exactly k distinct users -> the sketch just fills
      input.addData((1L to 8L).map(u => (u * 10L, u)): _*)
      q.processAllAvailable()
      val f1 = kth()
      assert(f1.isDefined, "sketch should be full at k distinct users")
      // batch 2: 50 NEW users into the restored state; the k-th
      // smallest distinct hash is non-increasing under set growth
      input.addData((9L to 58L).map(u => (u * 10L, u)): _*)
      q.processAllAvailable()
      val f2 = kth()
      assert(f2.isDefined && f2.get <= f1.get,
        s"kth hash rose across batches: $f1 -> $f2")
      assert(f2.get < f1.get,
        "50 new users left the 8-minima untouched - merge likely dropped state")
    } finally q.stop()
  }
}
