package graft

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

/** MLlib interop (SURVEY §2.C4): the engine's array<float> embedding
  * column converts to MLlib vectors and drives
  * BucketedRandomProjectionLSH approximate search — complementing the
  * engine's own deterministic IVF path. */
class MllibLshSpec extends SparkSpec {
  import spark.implicits._

  test("BucketedRandomProjectionLSH finds near neighbors on embeddings") {
    val toVec = udf((a: Seq[Float]) =>
      Vectors.dense(a.map(_.toDouble).toArray))
    val df = Tables.embeddings(spark, sf0001)
      .select($"vec_id", toVec($"embedding").as("features"))
      .cache()

    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(0.5).setNumHashTables(4).setSeed(42)
      .setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(df)

    val key = df.where($"vec_id" === 0L).select($"features").head().getAs[
      org.apache.spark.ml.linalg.Vector](0)
    val nn = model.approxNearestNeighbors(df, key, 5)
    assert(nn.count() === 5)
    // the query point itself must be its own nearest neighbor (distCol=0)
    val self = nn.orderBy($"distCol".asc).select($"vec_id").as[Long].head()
    assert(self === 0L)

    // similarity self-join: pairs within L2 distance 1.0
    val pairs = model.approxSimilarityJoin(df, df, 1.0, "l2")
      .where($"datasetA.vec_id" < $"datasetB.vec_id")
    assert(pairs.count() >= 0) // runs end-to-end; count depends on data
  }
}
