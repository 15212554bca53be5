package graft

import org.apache.spark.sql.SparkSession

/** A session built with GraftExtensions must expose the SQL functions
  * and the optimizer rule without any per-call registration. */
class ExtensionsSpec extends SparkSpec {

  test("withExtensions session resolves graft functions and rules") {
    // force the shared session into existence first (shared SparkContext)
    spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      try {
        val d = s2.sql(
          """SELECT round(cosine_distance(CAST(array(1.0,0.0) AS ARRAY<FLOAT>),
            |                             CAST(array(0.0,1.0) AS ARRAY<FLOAT>)), 6) AS d
            |""".stripMargin).collect()(0).getDouble(0)
        assert(d === 1.0)
        val e = s2.sql(
          """SELECT euclidean_distance(CAST(array(3.0,0.0) AS ARRAY<FLOAT>),
            |                          CAST(array(0.0,4.0) AS ARRAY<FLOAT>)) AS d
            |""".stripMargin).collect()(0).getDouble(0)
        assert(e === 5.0)
        val top = s2.sql(
          """SELECT top_k_by(d, i, l, 2) AS nbrs FROM VALUES
            |  (0.3D, 1L, 0), (0.1D, 2L, 1), (0.2D, 3L, 2) AS t(d, i, l)
            |""".stripMargin).collect()(0).getSeq[org.apache.spark.sql.Row](0)
        assert(top.map(_.getLong(1)) === Seq(2L, 3L))
        // optimizer rule is injected: self-distance folds on a real scan
        val folded = Tables.embeddings(s2, sf0001)
          .selectExpr("cosine_distance(embedding, embedding) AS d")
          .queryExecution.optimizedPlan.toString
        assert(!folded.toLowerCase.contains("cosinedistance"), folded)
      } finally {
        // do not stop s2: it shares the JVM-wide SparkContext
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
