package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dump formatted physical plans for the headline queries — the plan
  * audit the 100 TB design rests on.
  * Usage: runMain graft.tools.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("knn_topk", "knn_topk_agg", "knn_classify", "b07_agg_q1",
        "b03_join_broadcast", "c01_dedup_exact", "c10_minhash_lsh",
        "d01_window_tumbling", "ann_ivf_topk")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
