package graft

import org.apache.spark.sql.functions._

import graft.ops.Quality

/** Constraint-audit suite (ops.Quality). */
class QualitySpec extends SparkSpec {

  test("constraint suite: consistent counts, live violation path") {
    val rows = Quality.constraintChecks(spark, sf0001).cache()
    // pass flag is derived from the violation count, never independent
    val inconsistent = rows.where(
      (col("passed") === 1 && col("n_violations") =!= 0) ||
      (col("passed") === 0 && col("n_violations") === 0) ||
      col("n_violations") < 0 ||
      col("n_violations") > col("n_checked")).count()
    assert(inconsistent == 0)
    // the referential/range/nonnull rules hold on the clean fixtures
    val coreFailed = rows
      .where(col("rule") =!= "unique_document_bow" && col("passed") === 0)
      .count()
    assert(coreFailed == 0)
    // ... and the deliberately strict uniqueness rule actually fires,
    // proving the suite can report violations, not only green checks
    val bow = rows.where(col("rule") === "unique_document_bow").head()
    assert(bow.getAs[Int]("passed") == 0 && bow.getAs[Long]("n_violations") > 0,
      bow.toString)
    rows.unpersist()
  }

  test("q02: top-20 outliers, monotone |z|, flag consistent with z") {
    val rows = ops.Quality.lengthOutliers(spark, sf0001).collect()
    assert(rows.length == 20)
    val zs = rows.map(r => math.abs(r.getAs[Double]("z")))
    // the report is ordered most-anomalous-first
    assert(zs.zip(zs.tail).forall { case (a, b) => a >= b }, zs.mkString(","))
    // flag agrees with the reported z everywhere except the 6-dp
    // rounding boundary around |z| = 3
    rows.foreach { r =>
      val z = math.abs(r.getAs[Double]("z"))
      val flag = r.getAs[Boolean]("is_outlier")
      if (math.abs(z - 3.0) > 1e-6)
        assert(flag == (z > 3.0), s"z=$z flag=$flag")
    }
  }
}
