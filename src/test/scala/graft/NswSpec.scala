package graft

import org.apache.spark.sql.functions._

import graft.ops.{Knn, Nsw}

/** The deterministic navigable-small-world tier: graph shape, beam
  * monotonicity, recall bar, determinism. */
class NswSpec extends SparkSpec {
  import spark.implicits._

  test("adjacency is exactly M-regular and matches the exact top-M") {
    val n = Tables.embeddings(spark, sf0001).count()
    val adj = Nsw.adjacency(spark, sf0001)
    assert(adj.count() === n * Nsw.M)
    val deg = adj.groupBy($"u").count().select($"count").distinct().collect()
    assert(deg.length === 1 && deg(0).getLong(0) === Nsw.M.toLong)
    // the graph's out-neighbors of a vertex are its exact nearest
    // neighbors: the first K of them must equal the certified exact
    // top-K (M ≥ K, same total order)
    val exact = Knn.knnTopk(spark, sf0001)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val adjSet = adj.select($"u", $"v").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(adjSet),
      "exact top-10 pairs must all be graph edges (M=16 ≥ K=10)")
  }

  test("beam search is monotone in hops (best-so-far beam)") {
    // the old beam is unioned before pruning, so the beam after h+1
    // hops can only contain better-or-equal candidates: recall is
    // non-decreasing in hop count
    val recalls = (0 to Nsw.H).map { h =>
      Nsw.nswRecallAt(spark, sf0001, h).head().getAs[Double]("recall")
    }
    recalls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"recall decreased across a hop: $recalls")
    }
    // and the hops genuinely work: the final beam is materially better
    // than entry-point ranking alone
    assert(recalls.last >= recalls.head + 0.2,
      s"beam search added < 0.2 recall: $recalls")
    info(s"recall by hops: ${recalls.mkString(", ")}")
  }

  test("nsw recall clears the production bar on the hardest (isotropic) input") {
    val r = Nsw.nswRecall(spark, sf0001).head().getAs[Double]("recall")
    assert(r >= 0.9, s"nsw recall@10 = $r")
    info(s"nsw recall@10 = $r (E=${Nsw.E} B=${Nsw.B} H=${Nsw.H} M=${Nsw.M})")
  }

  test("search is deterministic: two runs are row-identical") {
    val a = Nsw.nswTopk(spark, sf0001).collect().map(_.toString)
    Nsw.clearCache()
    val b = Nsw.nswTopk(spark, sf0001).collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
