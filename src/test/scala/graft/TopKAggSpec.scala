package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKAgg

/** The bounded-heap aggregate must agree exactly with the window-rank
  * formulation — including tie-breaks — and keep map-side partial
  * aggregation in its physical plan. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("top_k_by equals window row_number top-k on the embeddings pipeline") {
    val aggResult = ops.Knn.knnTopkAgg(spark, sf0001)
      .select($"qid", $"rnk".cast("long"), $"cid", $"dist")
      .as[(Long, Long, Long, Double)].collect()
    val winResult = ops.Knn.knnTopk(spark, sf0001)
      .select($"qid", $"rnk".cast("long"), $"cid", $"dist")
      .as[(Long, Long, Long, Double)].collect()
    assert(aggResult.length === winResult.length)
    assert(aggResult.sameElements(winResult))
  }

  test("top_k_by breaks distance ties on the id") {
    val df = Seq(
      (1L, 0.5, 30L, 0), (1L, 0.5, 10L, 1), (1L, 0.5, 20L, 2), (1L, 0.1, 40L, 3),
    ).toDF("qid", "dist", "cid", "clabel")
    val out = df.groupBy($"qid")
      .agg(TopKAgg.top_k_by(spark, $"dist", $"cid", $"clabel", 3).as("nbrs"))
      .select(posexplode($"nbrs").as(Seq("pos", "nbr")))
      .select($"nbr.id").as[Long].collect()
    assert(out.sameElements(Array(40L, 10L, 20L))) // 0.1 first, then ties by id
  }

  test("top_k_by plans partial aggregation before the exchange") {
    val plan = ops.Knn.knnTopkAgg(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_by") || plan.contains("partial_"), plan)
  }

  test("blocked variant plans CartesianProduct with partial top_k_by") {
    val plan = ops.Knn.knnTopkBlocked(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("CartesianProduct"), plan)
    assert(plan.contains("partial_top_k_by"), plan)
    // and must still equal the exact window form
    val blocked = ops.Knn.knnTopkBlocked(spark, sf0001)
      .select($"qid", $"rnk".cast("long"), $"cid", $"dist")
      .as[(Long, Long, Long, Double)].collect()
    val win = ops.Knn.knnTopk(spark, sf0001)
      .select($"qid", $"rnk".cast("long"), $"cid", $"dist")
      .as[(Long, Long, Long, Double)].collect()
    assert(blocked.sameElements(win))
  }

  test("blocked knn: block count follows the byte budget, results don't") {
    // tiny budget → many blocks; huge budget → the 2-block floor (one
    // block would mean the broadcast layout is the right operator)
    spark.conf.set(ops.Knn.BlockBytesConf, "4096")
    val many = ops.Knn.candidateBlocks(spark, sf0001)
    spark.conf.set(ops.Knn.BlockBytesConf, (1L << 30).toString)
    val few = ops.Knn.candidateBlocks(spark, sf0001)
    assert(few == 2 && many > few, s"few=$few many=$many")
    // result invariance across block counts (the partial heaps merge to
    // the same total order no matter how the candidate side is cut)
    val win = ops.Knn.knnTopk(spark, sf0001)
      .select($"qid", $"rnk".cast("long"), $"cid", $"dist")
      .as[(Long, Long, Long, Double)].collect()
    for (budget <- Seq("4096", (1L << 30).toString)) {
      spark.conf.set(ops.Knn.BlockBytesConf, budget)
      val blocked = ops.Knn.knnTopkBlocked(spark, sf0001)
        .select($"qid", $"rnk".cast("long"), $"cid", $"dist")
        .as[(Long, Long, Long, Double)].collect()
      assert(blocked.sameElements(win), s"diverged at blockBytes=$budget")
    }
    spark.conf.unset(ops.Knn.BlockBytesConf)
  }

  test("buffer serialization round-trips through sorted order") {
    val buf = new graft.functions.TopKBuffer(2)
    buf.insert(0.3, 1, 7); buf.insert(0.1, 2, 8); buf.insert(0.2, 3, 9)
    assert(buf.sorted.toSeq === Seq((0.1, 2L, 8), (0.2, 3L, 9)))
  }
}
