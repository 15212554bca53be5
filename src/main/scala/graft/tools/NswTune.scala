package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Ann, Nsw}

/** One-off sampled-recall grid over a big clustered tier's PERSISTED
  * graphs — the diagnostic that separates BUILD quality (which seeded
  * graph) from SEARCH budget (hops × beam) when a tier misses its bar.
  * Reads only committed `_BUILT` artifacts; builds nothing.
  *
  * Usage: runMain graft.tools.NswTune <dir> <seedC>[:<dRounds>] <h1,b1 ...>
  * (`:<dRounds>` selects a committed DIAGNOSTIC build with an overridden
  * descent-round count — the rule-effect A/B of VERDICT r14 item 6.)
  */
object NswTune {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val (seedC, dRounds) = args(1).split(":") match {
      case Array(c) => (c.toInt, None)
      case Array(c, dr) => (c.toInt, Some(dr.toInt))
    }
    val grid = args.drop(2).map { s =>
      val Array(h, b) = s.split(","); (h.toInt, b.toInt)
    }
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Ann.LutBroadcastConf, "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = Ann.recallSampleOf(spark, dir, Ann.RecallSampleCap)
    val c = graft.Tables.repartitioned(
      graft.Tables.embeddings(spark, dir), spark)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dist").asc, col("cid").asc)
    val exact = c.crossJoin(broadcast(qs))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        graft.functions.VectorExpressions.cosine_distance(spark,
          col("qv"), col("cv")).as("dist"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= Ann.K)
      .select(col("qid"), col("cid")).localCheckpoint(true)
    val nq = exact.select(col("qid")).distinct().count()
    println(s"[tune] ground truth: $nq queries")

    // Fail fast when the (dir, seedC) artifact was never built:
    // storedAdjacency would otherwise silently launch a from-scratch
    // build — hours of unintended work on a big tier — for what is
    // almost certainly a typo'd seedC (ADVICE r14). This tool reads
    // only committed artifacts, per its contract above.
    val builtPath = new org.apache.hadoop.fs.Path(
      Nsw.livePath(spark, dir, seedC, dRounds), "_BUILT")
    val fs = builtPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(builtPath),
      s"no committed NSW artifact for (dir=$dir, seedC=$seedC, " +
        s"dRounds=$dRounds) — expected $builtPath; NswTune builds " +
        "nothing (run the build via ScaleCheck/ensureNswIndex first, " +
        "or fix the seedC argument)")
    val adj = Nsw.storedAdjacency(spark, dir, seedC, dRounds)
      .localCheckpoint(true)
    val qids = qs.select(col("qid")).localCheckpoint(true)
    grid.foreach { case (h, b) =>
      val t0 = System.nanoTime()
      val approx = Nsw.nswTopkAt(spark, dir, h, b, far = 0,
          adjOverride = Some(adj), qOnly = Some(qids))
        .select(col("qid"), col("cid"))
      val hits = approx.join(exact, Seq("qid", "cid")).count()
      val r = hits.toDouble / (nq * Ann.K)
      println(f"[tune] seedC=$seedC H=$h B=$b recall=$r%.4f " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    spark.stop()
  }
}
