package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{Distances, TextHash}

/** Property-based invariants (SURVEY.md §5.4) — run by sbt's ScalaCheck
  * framework. Kernel properties run on local arrays through the same
  * UDF/Expression arithmetic; pipeline properties run small DataFrames. */
object KnnProperties extends Properties("graft") {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val vecGen: Gen[Array[Float]] =
    Gen.chooseNum(2, 16).flatMap { d =>
      Gen.listOfN(d, Gen.chooseNum(-1.0f, 1.0f)).map(_.toArray)
    }
  private val nonZeroVec = vecGen.suchThat(v => v.exists(x => math.abs(x) > 1e-3))

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    val df = Seq((a, b)).toDF("a", "b")
    df.select(Distances.cosine_distance(col("a"), col("b"))).as[Double].head()
  }

  private def euclid(a: Array[Float], b: Array[Float]): Double = {
    val df = Seq((a, b)).toDF("a", "b")
    df.select(Distances.euclidean_distance(col("a"), col("b"))).as[Double].head()
  }

  property("euclidean is symmetric") = Prop.forAll(vecGen) { a =>
    val b = a.map(x => -x + 0.25f)
    math.abs(euclid(a, b) - euclid(b, a)) < 1e-12
  }

  property("euclidean self-distance is zero") = Prop.forAll(vecGen) { a =>
    euclid(a, a) == 0.0
  }

  property("cosine self-distance ~ 0, range within [0,2]") =
    Prop.forAll(nonZeroVec) { a =>
      val self = cosine(a, a)
      val other = cosine(a, a.map(-_))
      math.abs(self) < 1e-9 && other >= -1e-9 && other <= 2.0 + 1e-9
    }

  property("top-(k+1) contains top-k") = Prop.forAll(
    Gen.chooseNum(1, 5),
    Gen.listOfN(12, Gen.chooseNum(0.0, 10.0))) { (k, ds) =>
      val rows = ds.zipWithIndex.map { case (dist, i) => (1L, i.toLong, dist) }
      val df = rows.toDF("qid", "cid", "dist")
      val w = Window.partitionBy($"qid").orderBy($"dist".asc, $"cid".asc)
      def top(n: Int) = df.withColumn("r", row_number().over(w))
        .where($"r" <= n).select($"cid").as[Long].collect().toSet
      top(k).subsetOf(top(k + 1))
    }

  property("top-k is invariant to input row order") = Prop.forAll(
    Gen.listOfN(10, Gen.chooseNum(0.0, 10.0))) { ds =>
      val rows = ds.zipWithIndex.map { case (dist, i) => (1L, i.toLong, dist) }
      val w = Window.partitionBy($"qid").orderBy($"dist".asc, $"cid".asc)
      def top3(input: Seq[(Long, Long, Double)]) =
        input.toDF("qid", "cid", "dist").withColumn("r", row_number().over(w))
          .where($"r" <= 3).orderBy($"r").select($"cid").as[Long].collect().toSeq
      top3(rows) == top3(scala.util.Random.shuffle(rows))
    }

  property("dedup is idempotent") = Prop.forAll(
    Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d"))) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val w = Window.partitionBy($"text").orderBy($"doc_id".asc)
      def dd(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("r", row_number().over(w)).where($"r" === 1)
          .select($"doc_id", $"text")
      val once = dd(docs.toDF("doc_id", "text"))
      val twice = dd(once)
      once.collect().sortBy(_.getLong(0)).sameElements(
        twice.collect().sortBy(_.getLong(0)))
    }

  property("minhash: equal token sets give equal signatures") = Prop.forAll(
    Gen.listOfN(6, Gen.alphaLowerStr.suchThat(_.nonEmpty))) { tokens =>
      val df = Seq((1L, tokens), (2L, scala.util.Random.shuffle(tokens)))
        .toDF("id", "tok")
        .select($"id",
          TextHash.minhash_signature(array_distinct($"tok"), lit(8)).as("sig"))
      val sigs = df.select($"sig").as[Array[Long]].collect()
      // arrays distinct-ed: same set → same signature regardless of order
      sigs(0).sameElements(sigs(1))
    }
}
