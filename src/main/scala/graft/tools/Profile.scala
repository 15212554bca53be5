package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev tool: stage-by-stage timing of the heavy queries.
  * Usage: runMain graft.tools.Profile [sfDir]
  */
object Profile {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        array_distinct(split(col("text"), " ")).as("tok"))
    docs.cache()
    time("docs cache")(docs.count())

    val sig = docs.select(col("doc_id"),
      graft.functions.SketchExpressions.minhash_signature(s, col("tok"), lit(32)).as("sig"))
    time("minhash signatures")(sig.count())

    val bands = sig.select(col("doc_id"),
      posexplode(graft.functions.SketchExpressions.lsh_bands(s, col("sig"), lit(4))).as(Seq("band", "bucket")))
    bands.cache()
    time("bands")(bands.count())

    val bucketSizes = bands.groupBy(col("band"), col("bucket")).count()
    println("[profile] largest buckets:")
    bucketSizes.orderBy(col("count").desc).show(5)

    val a = bands.select(col("doc_id").as("a_id"), col("band"), col("bucket"))
    val b = bands.select(col("doc_id").as("b_id"),
      col("band").as("b_band"), col("bucket").as("b_bucket"))
    val cand = a.join(b,
      col("band") === col("b_band") && col("bucket") === col("b_bucket") &&
        col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
    time("band join (pre-distinct)")(println("  pairs=" + cand.count()))
    val dist = cand.distinct()
    time("distinct candidates")(println("  cands=" + dist.count()))

    val aTok = docs.select(col("doc_id").as("a_id"), col("tok").as("a_tok"))
    val bTok = docs.select(col("doc_id").as("b_id"), col("tok").as("b_tok"))
    val checked = dist.join(broadcast(aTok), "a_id").join(broadcast(bTok), "b_id")
      .withColumn("inter", size(array_intersect(col("a_tok"), col("b_tok"))))
      .where(col("inter") > 0)
    time("exact recheck")(checked.count())

    // c02 profile
    val t = docs.withColumn("n_tok", size(col("tok")))
    val pa = t.select(col("doc_id").as("a_id"), col("source"),
      col("tok").as("a_tok"), col("n_tok").as("a_n"))
    val pb = t.select(col("doc_id").as("b_id"), col("source").as("b_source"),
      col("tok").as("b_tok"), col("n_tok").as("b_n"))
    val joined = pa.join(pb, col("source") === col("b_source") &&
      col("a_id") < col("b_id") &&
      col("a_n") >= col("b_n") * 0.9 && col("b_n") >= col("a_n") * 0.9)
    time("c02 pair count")(println("  pairs=" + joined.count()))
    time("c02 with intersect")(
      joined.withColumn("i", size(array_intersect(col("a_tok"), col("b_tok"))))
        .agg(sum("i")).collect())
    s.stop()
  }
}
