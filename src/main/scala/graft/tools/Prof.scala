package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: time one declared query cold (caches cleared) and warm,
  * N reps each, on an arbitrary SF dir — the per-query magnifying glass
  * behind Bench's aggregate view.
  *
  *   sbt "runMain graft.tools.Prof /root/testdata/sf0.1 c17_shingle_jaccard [reps]"
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    def clear(): Unit = {
      graft.ops.Knn.clearCache(); graft.ops.Ann.clearCache(); graft.ops.Nsw.clearCache()
      graft.ops.Graph.clearCache(); graft.ops.TextOps.clearCache()
    }
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    once() // JVM/codegen warm-up, discarded
    val cold = (1 to reps).map { _ => clear(); once() }
    val warm = (1 to reps).map(_ => once())
    println(f"[prof] $name cold=${cold.map(t => f"$t%.2f").mkString(",")} " +
      f"warm=${warm.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
