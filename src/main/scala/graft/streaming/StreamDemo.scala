package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Capability demo: replay the events table through the file stream
  * source and run the three streaming shapes (windowed agg, stateful
  * dedup, session state). Usage: runMain graft.streaming.StreamDemo
  * [sfDir]. Prints row counts + samples; exits non-zero on mismatch
  * with the batch twins. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Streams.runToMemory(Streams.tumbling(spark, sfDir), "demo_tumbling",
      OutputMode.Complete())
    val nWindows = spark.table("demo_tumbling").count()
    println(s"[stream] tumbling windows: $nWindows rows")
    spark.table("demo_tumbling").orderBy(col("wstart"), col("event_type")).show(5)

    Streams.runToMemory(Streams.dedup(spark, sfDir), "demo_dedup",
      OutputMode.Append())
    val nDedup = spark.table("demo_dedup").count()
    println(s"[stream] dedup survivors: $nDedup rows")

    Streams.runToMemory(Streams.sessionCounts(spark, sfDir).toDF(),
      "demo_sessions", OutputMode.Update())
    val nUsers = spark.table("demo_sessions").count()
    println(s"[stream] session users: $nUsers rows")
    spark.table("demo_sessions").orderBy(col("user_id")).show(5)

    val batchWindows = graft.ops.EventOps.windowTumbling(spark, sfDir).count()
    val ok = nWindows == batchWindows
    println(s"[stream] batch-equivalence tumbling: $nWindows vs $batchWindows -> " +
      (if (ok) "OK" else "MISMATCH"))
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
