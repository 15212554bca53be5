package graft

import org.apache.spark.sql.functions._

import graft.functions.{Distances, SketchExpressions, TextHash}

/** The codegen sketch kernels (r15, VERDICT r14 item 2) must be
  * BIT-IDENTICAL to the [[TextHash]] / [[Distances]] UDF forms they
  * replaced in the declared query inputs — the UDFs stay in the repo
  * precisely to serve as the executable reference arithmetic here. Runs
  * over the real sf0.001 documents/embeddings fixtures (which exercise
  * the short-text winnow branch via AsciiFixtureSpec's domain) so the
  * comparison covers the whole-stage-codegen path the queries take, and
  * repeats the core law under codegen fallback (interpreted eval). */
class SketchExpressionsSpec extends SparkSpec {

  private def docs = {
    val t = Tables.documents(spark, sf0001)
    t.select(col("doc_id"), col("text"),
      array_distinct(split(col("text"), " ")).as("tok"))
  }

  test("minhash_signature expression ≡ UDF (32 perms, all docs)") {
    val n = docs.where(
      SketchExpressions.minhash_signature(spark, col("tok"), lit(32)) =!=
        TextHash.minhash_signature(col("tok"), lit(32))).count()
    assert(n === 0)
  }

  test("lsh_bands expression ≡ UDF (4 bands over the 32-perm sig)") {
    val sig = docs.select(col("doc_id"),
      TextHash.minhash_signature(col("tok"), lit(32)).as("sig"))
    val n = sig.where(
      SketchExpressions.lsh_bands(spark, col("sig"), lit(4)) =!=
        TextHash.lsh_bands(col("sig"), lit(4))).count()
    assert(n === 0)
  }

  test("simhash64 expression ≡ UDF") {
    val n = docs.where(
      SketchExpressions.simhash64(spark, col("tok")) =!=
        TextHash.simhash64(col("tok"))).count()
    assert(n === 0)
  }

  test("winnow_fingerprint expression ≡ UDF (incl. the <k short-text " +
    "branch)") {
    // the supplementary-plane rows pin the branch GATE to UTF-16 code
    // UNITS (String.length — the TextHash.winnow contract), not code
    // points: 10 emoji are 10 code points but 20 UTF-16 units, so a
    // numChars()-gated expression forks to the short-text fallback
    // while the UDF winnows — the ADVICE r15 divergence domain
    val tenEmoji = "😀" * 10   // numChars 10 < k=16 ≤ length 20
    val eightEmoji = "😀" * 8  // length 16 = k exactly
    val withShort = docs.select(col("text"))
      .union(spark.createDataFrame(Seq(
        Tuple1(""), Tuple1("short"), Tuple1("exactly sixteen!"),
        Tuple1("seventeen chars!!"), Tuple1(tenEmoji), Tuple1(eightEmoji),
        Tuple1("mixed 😀 ascii and astral 🤖 text")))
        .toDF("text"))
    val n = withShort.where(
      SketchExpressions.winnow_fingerprint(spark, col("text"), lit(16)) =!=
        TextHash.winnow_fingerprint(col("text"), lit(16))).count()
    assert(n === 0)
  }

  test("l2_norm expression ≡ UDF (all fixture embeddings)") {
    val n = Tables.embeddings(spark, sf0001).where(
      SketchExpressions.l2_norm(spark, col("embedding")) =!=
        Distances.l2_norm(col("embedding"))).count()
    assert(n === 0)
  }

  test("laws hold with whole-stage codegen DISABLED (interpreted eval " +
    "path of the same expressions)") {
    val key = "spark.sql.codegen.wholeStage"
    val old = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "false")
      val n1 = docs.where(
        SketchExpressions.minhash_signature(spark, col("tok"), lit(32)) =!=
          TextHash.minhash_signature(col("tok"), lit(32))).count()
      val n2 = docs.where(
        SketchExpressions.simhash64(spark, col("tok")) =!=
          TextHash.simhash64(col("tok"))).count()
      val n3 = docs.where(
        SketchExpressions.winnow_fingerprint(spark, col("text"), lit(16)) =!=
          TextHash.winnow_fingerprint(col("text"), lit(16))).count()
      assert(n1 + n2 + n3 === 0)
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("lsh_bands rejects a non-dividing band count (both engines' " +
    "doctrine: no silent remainder)") {
    val sig = docs.limit(1).select(
      TextHash.minhash_signature(col("tok"), lit(32)).as("sig"))
    val e = intercept[Exception] {
      sig.select(SketchExpressions.lsh_bands(spark, col("sig"), lit(5)))
        .collect()
    }
    assert(e.getMessage != null)
  }
}
