package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Distances

/** KNN pipeline unit tests on hand-computed fixtures (FIXTURES.md §"knn_tiny"). */
class KnnSpec extends SparkSpec {
  import spark.implicits._

  // 5 hand-placed 2-d points. Distances verified by hand.
  //   p0=(0,0,label 0) p1=(1,0,label 0) p2=(0,1,label 1)
  //   p3=(3,4,label 1) p4=(6,8,label 1)
  private lazy val tiny = Seq(
    (0L, Array(0f, 0f), 0), (1L, Array(1f, 0f), 0), (2L, Array(0f, 1f), 1),
    (3L, Array(3f, 4f), 1), (4L, Array(6f, 8f), 1),
  ).toDF("vec_id", "embedding", "label")

  test("euclidean distance matches hand computation") {
    val d = tiny.as("a").crossJoin(tiny.as("b"))
      .select($"a.vec_id".as("i"), $"b.vec_id".as("j"),
        Distances.euclidean_distance($"a.embedding", $"b.embedding").as("d"))
      .where($"i" === 0L).orderBy($"j")
      .collect().map(_.getDouble(2))
    assert(d.sameElements(Array(0.0, 1.0, 1.0, 5.0, 10.0)))
  }

  test("cosine distance: parallel vectors -> 0, orthogonal -> 1") {
    val d = tiny.where($"vec_id".isin(1L, 2L, 3L, 4L))
      .as("a").crossJoin(tiny.where($"vec_id".isin(1L, 2L, 3L, 4L)).as("b"))
      .select($"a.vec_id".as("i"), $"b.vec_id".as("j"),
        Distances.cosine_distance($"a.embedding", $"b.embedding").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(d((3L, 4L))) < 1e-12)          // colinear (3,4) vs (6,8)
    assert(math.abs(d((1L, 2L)) - 1.0) < 1e-12)    // orthogonal axes
  }

  test("top-k=2 euclidean neighbors of p0, tie broken by cid") {
    // p0's neighbors: p1 d=1, p2 d=1 (tie -> cid order), p3 d=5, p4 d=10
    val pairs = tiny.as("q").crossJoin(tiny.as("c"))
      .where($"q.vec_id" =!= $"c.vec_id")
      .select($"q.vec_id".as("qid"), $"c.vec_id".as("cid"),
        Distances.euclidean_distance($"q.embedding", $"c.embedding").as("dist"))
    val w = Window.partitionBy($"qid").orderBy($"dist".asc, $"cid".asc)
    val top2 = pairs.withColumn("rnk", row_number().over(w)).where($"rnk" <= 2)
      .where($"qid" === 0L).orderBy($"rnk")
      .select($"cid").as[Long].collect()
    assert(top2.sameElements(Array(1L, 2L)))
  }

  test("flagship entry returns rows and sane accuracy on sf0.001") {
    val preds = SparkEntry.entry(spark)
    assert(preds.count() === 500)
    val acc = ops.Knn.knnAccuracy(spark, sf0001).collect()(0).getDouble(0)
    assert(acc > 0.0 && acc <= 1.0)
  }

  test("declared knn queries all have oracle twins and run on sf0.001") {
    ops.Knn.queries.foreach { case (name, fn) =>
      assert(ops.Knn.oracles.contains(name), s"$name missing oracle")
      assert(fn(spark, sf0001).count() >= 0)
    }
  }
}
