package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions
import graft.plans.Rules

/** The custom optimizer rule must fold self-distances to a literal at
  * plan time and leave distinct-argument distances untouched. */
class RulesSpec extends SparkSpec {
  import spark.implicits._

  test("self-distance folds to literal 0.0 in the optimized plan") {
    Rules.install(spark)
    // parquet-backed (a LocalRelation would be eagerly evaluated by
    // ConvertToLocalRelation before the user-rule batch runs)
    val df = Tables.embeddings(spark, sf0001)
      .select(VectorExpressions.cosine_distance(spark, $"embedding", $"embedding").as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("cosinedistance"),
      s"self-distance should be folded:\n$optimized")
    // every row must be the folded exact 0.0, not the ~1e-16 float residue
    assert(df.distinct().as[Double].collect().toSeq === Seq(0.0))
  }

  test("distinct-argument distance is not rewritten") {
    Rules.install(spark)
    val df = Seq((Array(1f, 0f), Array(0f, 1f))).toDF("a", "b")
      .select(VectorExpressions.cosine_distance(spark, $"a", $"b").as("d"))
    assert(df.as[Double].head() === 1.0)
  }

  test("install is idempotent") {
    Rules.install(spark); Rules.install(spark)
    val n = spark.experimental.extraOptimizations
      .count(_ == graft.plans.SelfDistanceElimination)
    assert(n === 1)
  }
}
