package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, forked by sbt). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  val sf0001 = "/root/testdata/sf0.001"

  /** Run a plan-shape assertion under BOTH AQE settings (VERDICT r13
    * item 5): AQE re-plans at runtime and is the default in every
    * production deployment — a join hint or broadcast decision AQE
    * overrides would otherwise surface as a perf mystery at sf10, not a
    * red spec. The suite default (Spark 4: AQE on) is restored after. */
  def withAqeBothWays(body: => Unit): Unit = {
    val key = "spark.sql.adaptive.enabled"
    val old = spark.conf.getOption(key)
    try Seq("true", "false").foreach { v =>
      spark.conf.set(key, v)
      withClue(s"[aqe=$v] ")(body)
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
