package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `events.ts` has already shipped in two different parquet encodings
  * across driver fixture regenerations (TIMESTAMP(NANOS) → read as raw
  * long nanos, and TIMESTAMP(MICROS, NTZ)); this suite pins the contract
  * that Tables.events yields identical `(ts, ts_ns)` for every encoding
  * a regeneration could plausibly pick, so the next change breaks here
  * — a named, local test — instead of in 31 downstream queries.
  */
class EventsEncodingSpec extends SparkSpec {
  import spark.implicits._

  // whole-micro instants so the nanos and micros encodings can agree bit-for-bit
  private val rows = Seq(
    (1L, 1700000000L * 1000000L + 123456L, 7L, "click", 1.5, """{"k":1}"""),
    (2L, 1700000003L * 1000000L + 999999L, 7L, "view", 2.5, """{"k":2}"""),
    (3L, 1700003600L * 1000000L, 8L, "purchase", 3.5, null),
  ) // (event_id, ts_micros, user_id, event_type, value, props)

  private def writeDir(encode: DataFrame => DataFrame, outType: String): String = {
    val dir = Files.createTempDirectory("events_enc").toFile
    dir.deleteOnExit()
    val base = rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
    spark.conf.set("spark.sql.parquet.outputTimestampType", outType)
    encode(base).drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }

  private def read(dir: String): Seq[(Long, String, Long)] =
    Tables.events(spark, dir)
      .select($"event_id", date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("ts"), $"ts_ns")
      .orderBy($"event_id")
      .as[(Long, String, Long)].collect().toSeq

  test("nanos-as-long, micros-ntz and micros-utc encodings normalize identically") {
    // 1. raw int64 nanos column named ts (what nanosAsLong yields for TIMESTAMP(NANOS))
    val nanosDir = writeDir(
      df => df.withColumn("ts", $"ts_us" * lit(1000L)), "TIMESTAMP_MICROS")
    // 2. TIMESTAMP_NTZ micros (isAdjustedToUTC=false — the current fixtures)
    val ntzDir = writeDir(
      df => df.withColumn("ts", timestamp_micros($"ts_us").cast(TimestampNTZType)),
      "TIMESTAMP_MICROS")
    // 3. UTC-adjusted TIMESTAMP micros
    val utcDir = writeDir(
      df => df.withColumn("ts", timestamp_micros($"ts_us")), "TIMESTAMP_MICROS")

    val out = Seq(nanosDir, ntzDir, utcDir).map(read)
    assert(out(0) === out(1), "nanos vs micros-ntz")
    assert(out(0) === out(2), "nanos vs micros-utc")
    // spot-check the normalization itself: second floor + exact nano tie-break
    assert(out(0).head === ((1L, "2023-11-14 22:13:20", 1700000000123456000L)))
    assert(out(0)(1)._3 === 1700000003999999000L, "sub-second precision survives in ts_ns")
  }

  test("the live fixtures read without error and ts is second-floored") {
    val ev = Tables.events(spark, sf0001)
    val bad = ev.where(unix_micros($"ts") % 1000000L =!= 0).count()
    assert(bad === 0, "ts must be floored to whole seconds")
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.schema("ts_ns").dataType === LongType)
    assert(ev.count() > 0)
  }
}
