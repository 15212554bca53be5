package graft

import graft.ops.{Ann, Knn}

/** IVF ANN quality: recall against the exact brute-force top-k, and
  * cost reduction (candidates actually pruned). */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  test("ivf assignments cover every vector exactly once") {
    val n = Tables.embeddings(spark, sf0001).count()
    val a = Ann.assignments(spark, sf0001)
    assert(a.count() === n)
    assert(a.select($"vec_id").distinct().count() === n)
  }

  test("ivf top-k recall vs exact top-k is materially better than random") {
    val exact = Knn.knnTopk(spark, sf0001)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val approx = Ann.ivfTopk(spark, sf0001)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    // P/C = 16/64 of the lists are probed; random pruning would give
    // recall ≈ 0.25. The index must do substantially better.
    assert(recall >= 0.4, s"IVF recall $recall")
    info(s"IVF recall@10 = $recall (probing ${Ann.P}/${Ann.C} lists)")
  }

  test("ivf probe join shuffles on cent_id instead of broadcasting the lists") {
    val plan = Ann.ivfTopk(spark, sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"expected shuffled hash join:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"inverted lists must not be broadcast:\n$plan")
  }

  test("ivf probes prune the pair space") {
    val n = Tables.embeddings(spark, sf0001).count()
    val probedPairs = Ann.ivfTopk(spark, sf0001).count() // K per query
    assert(probedPairs === n * Ann.K)
  }
}
