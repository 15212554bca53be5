package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.Ann

/** Print IVF recall@K (seed and trained) for the current Ann constants —
  * the measurement loop behind (C, P, LloydIters) tuning.
  * Usage: runMain graft.tools.AnnTune [sfDir]
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[anntune] C=${Ann.C} P=${Ann.P} K=${Ann.K} iters=${Ann.LloydIters}")
    val seed = Ann.recallSeed(spark, sfDir).collect()(0)
    println(s"[anntune] seed:    hits=${seed.getAs[Long]("n_hits")} recall=${seed.getAs[Double]("recall")}")
    val tr = Ann.recallTrained(spark, sfDir).collect()(0)
    println(s"[anntune] trained: hits=${tr.getAs[Long]("n_hits")} recall=${tr.getAs[Double]("recall")}")
    spark.stop()
  }
}
