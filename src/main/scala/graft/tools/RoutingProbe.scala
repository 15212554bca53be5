package graft.tools

import scala.util.chaining._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Ann, Nsw}

/** Pins the seedC-retirement decision (VERDICT r16 item 8) with an
  * archived number: the r16 capacity-rule autopsy measured routing
  * infeasibility only at the 2M tier (a scaladoc anecdote, not a
  * table row), so this tool times THE ROUTING PASS ALONE — the
  * n·seedC scored stream through the bounded-heap top-PAdj cut,
  * exactly `Ann.probesOf` as `Nsw.seedCandidates` calls it — at a
  * given tier for each candidate seedC, so the "4√n minimizes the
  * CPU terms" claim in `retunedSeedC`'s scaladoc is anchored by a
  * measurement beside a command (house doctrine).
  *
  * Usage: runMain graft.tools.RoutingProbe <dir> <seedC>[,<seedC>…]
  * Prints one JSON line per seedC:
  * {"tool":"routing_probe","dir":…,"n":…,"seedC":…,"rows_scored":…,
  *  "probe_rows":…,"sec":…}
  * (min of 2 runs per seedC; session caches cleared between runs so
  * every run re-scores the full n·seedC stream).
  */
object RoutingProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: RoutingProbe <dir> <seedC>[,<seedC>...]")
    val dir = args(0)
    val seedCs = args(1).split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .pipe(b => Nsw.BuildSessionConfs.foldLeft(b) {
        case (bb, (k, v)) => bb.config(k, v) })
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.Tables.embeddings(spark, dir).count()
    seedCs.foreach { c =>
      def once(): (Long, Double) = {
        Ann.clearCache(); Nsw.clearCache()
        val t0 = System.nanoTime()
        val rows = Ann.probesOf(spark, dir,
          Ann.centroidsAt(spark, dir, c), Nsw.PAdj).count()
        (rows, (System.nanoTime() - t0) / 1e9)
      }
      val (rows1, t1) = once()
      val (_, t2) = once()
      println(s"""{"tool":"routing_probe","dir":"$dir","n":$n,""" +
        s""""seedC":$c,"rows_scored":${n * c.toLong},""" +
        s""""probe_rows":$rows1,"sec":${math.min(t1, t2)}}""")
    }
    spark.stop()
  }
}
