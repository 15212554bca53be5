package graft

import org.apache.spark.sql.functions._

/** Fixture precondition behind the hash-oracle parity proofs.
  *
  * The c08/c10/c11 DuckDB oracles equate Java charAt / UTF-16 length /
  * UTF-8 byte counts with DuckDB ascii()/codepoint arithmetic — exact
  * ONLY for pure-ASCII text. That holds for the current synthetic
  * corpus; if a future fixture tier introduces non-ASCII documents this
  * spec fails loudly instead of the oracles silently diverging. */
class AsciiFixtureSpec extends SparkSpec {

  test("every documents.text (and source/lang) is pure ASCII") {
    for (dir <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val bad = Tables.documents(spark, dir)
        .where(!col("text").rlike("^[\\x00-\\x7F]*$") ||
               !col("source").rlike("^[\\x00-\\x7F]*$") ||
               !col("lang").rlike("^[\\x00-\\x7F]*$"))
        .count()
      assert(bad === 0, s"non-ASCII documents rows in $dir")
    }
  }

  test("no document is shorter than the 16-char winnow window") {
    // TextHash.winnow takes a different branch under 16 chars that the
    // c08 oracle does not model; the fixtures must never hit it.
    for (dir <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val short = Tables.documents(spark, dir)
        .where(length(col("text")) < 16).count()
      assert(short === 0, s"sub-16-char documents rows in $dir")
    }
  }
}
