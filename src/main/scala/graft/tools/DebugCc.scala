package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiler for the c30 fixed-point loop (dev tool). */
object DebugCc {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      val t1 = System.nanoTime()
      println(f"[cc] $tag: ${(t1 - t0) / 1e9}%.2f s")
      t0 = t1
    }
    val out = graft.ops.TextOps.lshComponents(spark, d)
    val n = out.count()
    lap(s"lshComponents total ($n rows)")
    spark.stop()
  }
}
