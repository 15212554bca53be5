package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{JaroWinkler, JaroWinklerFunctions}

/** The custom Jaro-Winkler kernel: textbook values (which also pin the
  * exact double bits DuckDB produces), DuckDB's empty-string convention,
  * and the codegen expression path. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook pairs match DuckDB's exact doubles") {
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("dixon", "dicksonx") === 0.8133333333333332)
    assert(jw("jellyfish", "smellyfish") === 0.8962962962962964)
    assert(jw("dwayne", "duane") === 0.8400000000000001)
    assert(jw("crate", "trace") === 0.7333333333333334)
    assert(jw("hello world", "hello wrold") === 0.9818181818181818)
  }

  test("identity, disjoint, and DuckDB's empty-string convention") {
    assert(jw("abc", "abc") === 1.0)
    assert(jw("a", "b") === 0.0)
    assert(jw("ab", "ba") === 0.0) // window 0: no matches
    assert(jw("", "abc") === 0.0)
    assert(jw("", "") === 0.0) // DuckDB: empty ⇒ 0, not the textbook 1
  }

  test("symmetry on a corpus sample") {
    val texts = Tables.documents(spark, sf0001)
      .select(expr("left(text, 40)")).as[String].take(30)
    for (a <- texts.take(10); b <- texts.take(10)) {
      assert(jw(a, b) === jw(b, a), s"asym for ${a.take(12)}/${b.take(12)}")
    }
  }

  test("codegen expression evaluates inside a projection") {
    val out = Seq(("martha", "marhta"), ("abc", "xyz"))
      .toDF("a", "b")
      .select(JaroWinklerFunctions.jaro_winkler(spark, $"a", $"b").as("jw"))
      .as[Double].collect()
    assert(out(0) === 0.9611111111111111)
    assert(out(1) === 0.0)
  }

  test("c25 query: pairs are ordered, scores above the floor") {
    val rows = ops.TextOps.jwNearDup(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (a, b, m) => a < b && m > 800000L })
  }
}
