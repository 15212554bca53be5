package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Nsw

/** Dev profiler: split ann_nsw_topk's cold cost into its phases —
  * adjacency build (seed + NN-descent rounds), far-link augmentation,
  * and the beam search itself — by forcing each session-cached stage in
  * order and timing the deltas. Diagnostic only; touches no declared
  * query.
  *
  *   sbt "runMain graft.tools.NswProf [sfDir] [reps]"
  */
object NswProf {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).filter(_.forall(_.isDigit)).map(_.toInt)
      .getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    if (args.lift(1).contains("explain-hop")) {
      // dump the ONE-hop unbarriered plan (the per-hop shape the
      // checkpoint barrier hides from a whole-query explain)
      s.conf.set(graft.ops.Ann.IterativeCheckpointConf, "false")
      Nsw.nswTopkAt(s, d, hops = 1)
        .explain("formatted")
      s.stop(); return
    }
    (1 to reps).foreach { i =>
      Nsw.clearCache(); graft.ops.Ann.clearCache()
      val tAdj = t(Nsw.adjacency(s, d).count())
      val tFar = t(Nsw.adjacencyWithFar(s, d, Nsw.F).count())
      val tSearch = t(graft.SparkEntry.queries("ann_nsw_topk")(s, d).count())
      println(f"[nswprof] rep $i: adjacency=$tAdj%6.2f s  " +
        f"farAug=$tFar%5.2f s  search=$tSearch%6.2f s")
    }
    s.stop()
  }
}
