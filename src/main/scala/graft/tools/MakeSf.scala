package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-factor fixture generator (VERDICT r9 item 1: the
  * sf1.0 dress rehearsal). Reproduces the driver fixture schemas and
  * value shapes (FIXTURES.md — key ranges, category mixes, near-dup
  * structure, unit-norm embeddings) at a chosen multiple of sf0.1, as
  * SINGLE parquet files `<out>/<table>.parquet` so every consumer
  * (batch `Tables`, the streaming file source's pathGlobFilter, DuckDB's
  * `read_parquet`) sees exactly the layout the driver fixtures have.
  *
  * Determinism: every value is a pure function of (table, row id)
  * through xxhash64 — no RNG state, no wall clock — so the fixture is
  * bit-reproducible run-over-run. (The generator itself may use libm
  * via log/cos for shaping; that's generation-time only — both engines
  * under test READ the same stored bytes, so engine/oracle parity never
  * depends on how the fixture was shaped.)
  *
  * region/nation don't scale (5/25 rows) and are copied from the seed
  * fixture byte-for-byte semantics by re-writing their rows.
  *
  * Usage: runMain graft.tools.MakeSf [outDir] [scale vs sf0.1] [clustered]
  *
  * With the third arg `clustered`, ONLY the embeddings table is written,
  * and it carries a deterministic Gaussian-mixture structure (64 planted
  * clusters) instead of the default near-isotropic vectors — the
  * realistic-corpus case every ANN tier's production claim is about. The
  * default fixtures stay isotropic on purpose (ANN's no-free-lunch
  * bounding case); this variant exists to MEASURE the separation
  * (ScaleCheck's clustered rows, SCALE_r11.md).
  */
object MakeSf {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("localdata/sf1")
    val scale = args.lift(1).map(_.toDouble).getOrElse(10.0)
    val clustered = args.lift(2).contains("clustered")
    val seed = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nSupp = (1000 * scale).toLong
    val nCust = (15000 * scale).toLong
    val nPart = (20000 * scale).toLong
    val nOrd = (150000 * scale).toLong
    val nEvents = (100000 * scale).toLong
    val nDocs = (5000 * scale).toLong
    val nVecs = (2000 * scale).toLong

    /** uniform [0,1) as a pure function of (id, salt) */
    def u(salt: String): Column =
      pmod(xxhash64(col("id"), lit(salt)), lit(1000000000L)) / 1e9
    /** uniform long in [0, m) */
    def h(salt: String, m: Long): Column =
      pmod(xxhash64(col("id"), lit(salt)), lit(m))
    def pick(salt: String, vals: Seq[String]): Column =
      element_at(array(vals.map(lit): _*), (h(salt, vals.size) + 1).cast("int"))

    def writeOne(df: DataFrame, table: String): Unit = {
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = s"$out/_tmp_$table"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(tmp, "part-*.parquet"))(0).getPath
      val dst = new org.apache.hadoop.fs.Path(out, s"$table.parquet")
      fs.delete(dst, false)
      fs.rename(part, dst)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      println(s"[makesf] $table: written")
    }

    // clustered mode: embeddings only (the ANN tools read nothing else)
    if (clustered) {
      writeClusteredEmbeddings(spark, writeOne, nVecs)
      println(s"[makesf] done (clustered embeddings only): $out")
      spark.stop()
      return
    }

    // -------- region / nation: copied (they don't scale)
    writeOne(spark.read.parquet(s"$seed/region.parquet"), "region")
    writeOne(spark.read.parquet(s"$seed/nation.parquet"), "nation")

    // -------- supplier
    writeOne(spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      h("snat", 25).cast("int").as("s_nationkey"),
      round(lit(-1000.0) + u("sbal") * 11000.0, 2).as("s_acctbal")),
      "supplier")

    // -------- customer
    val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    writeOne(spark.range(nCust).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      h("cnat", 25).cast("int").as("c_nationkey"),
      round(lit(-1000.0) + u("cbal") * 11000.0, 2).as("c_acctbal"),
      pick("cseg", segments).as("c_mktsegment")), "customer")

    // -------- part
    val adjs = Seq("large", "hot", "small", "cold", "dark", "light",
      "round", "flat")
    val nouns = Seq("ring", "bolt", "gear", "pin", "wheel", "plate",
      "valve", "shaft")
    writeOne(spark.range(nPart).select(
      col("id").as("p_partkey"),
      concat_ws(" ", pick("padj", adjs), pick("pnoun", nouns)).as("p_name"),
      concat(lit("Brand#"), h("pbrand", 25)).as("p_brand"),
      pick("ptype", Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
        "STANDARD")).as("p_type"),
      (h("psize", 50) + 1).cast("int").as("p_size"),
      round(lit(900.0) + col("id") / 10.0, 2).as("p_retailprice")), "part")

    // -------- orders (orderdate: day-granular timestamps over 1995-2001)
    writeOne(spark.range(nOrd).select(
      col("id").as("o_orderkey"),
      h("ocust", nCust).as("o_custkey"),
      pick("ostat", Seq("F", "O", "P")).as("o_orderstatus"),
      round(lit(1000.0) + u("ototal") * 499000.0, 2).as("o_totalprice"),
      timestamp_seconds(lit(788918400L) + h("odate", 2404) * 86400L)
        .as("o_orderdate"),
      pick("oprio", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")).as("o_orderpriority")), "orders")

    // -------- lineitem: 0–7 lines per order (2% of orders have none, so
    // anti-join shapes keep a live result set), ≈3.92 lines/order mean
    val lines = spark.range(nOrd)
      .select(col("id"),
        when(h("lnone", 50) === 0, lit(0))
          .otherwise(h("lcnt", 7) + 1).cast("int").as("n_lines"))
      .select(col("id").as("l_orderkey"),
        explode(expr("CASE WHEN n_lines = 0 THEN array() " +
          "ELSE sequence(1, n_lines) END")).as("l_linenumber"))
      .select((col("l_orderkey") * 100 + col("l_linenumber")).as("id"),
        col("l_orderkey"), col("l_linenumber").cast("int"))
    writeOne(lines.select(
      col("l_orderkey"),
      h("lpart", nPart).as("l_partkey"),
      h("lsupp", nSupp).as("l_suppkey"),
      col("l_linenumber"),
      (h("lqty", 50) + 1).cast("double").as("l_quantity"),
      round(lit(900.0) + u("lprice") * 104100.0, 2).as("l_extendedprice"),
      (h("ldisc", 11).cast("double") / 100.0).as("l_discount"),
      (h("ltax", 9).cast("double") / 100.0).as("l_tax"),
      pick("lrf", Seq("A", "N", "R")).as("l_returnflag"),
      pick("lls", Seq("F", "O")).as("l_linestatus"),
      timestamp_seconds(lit(788918400L) + h("lship", 2500) * 86400L)
        .as("l_shipdate"))
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate")), "lineitem")

    // -------- events: ts non-decreasing in event_id from 2024-01-01,
    // span grows with scale (~26 s mean gap, micros noise); value is
    // exponential-ish dollars-and-cents like the seed fixture
    writeOne(spark.range(nEvents).select(
      col("id").as("event_id"),
      timestamp_micros((lit(1704067200L) + col("id") * 26 + h("tsj", 26))
        * 1000000L + h("tsu", 1000000L)).as("ts"),
      h("euser", nCust / 10).as("user_id"),
      pick("etype", Seq("click", "purchase", "error", "signup", "view"))
        .as("event_type"),
      round(lit(-50.0) * log(lit(1.0) - u("eval")), 2).as("value"),
      format_string("{\"k\": %d}", h("ek", 100)).as("props")), "events")

    // -------- documents: 31-word vocab, 10–100 words/doc, ~0.16% exact
    // dups + ~0.3% near-dups (copy + one appended word) of EARLIER docs —
    // the structure the dedup ladder (c01/c02/c17/c10/c26…) feeds on
    val vocab = Seq("a", "agg", "batch", "big", "column", "customer",
      "data", "dup", "fast", "filter", "group", "hash", "join", "key",
      "line", "merge", "order", "part", "query", "row", "scan", "slow",
      "small", "sort", "spark", "stream", "table", "the", "value",
      "vector", "window")
    val vocabArr = array(vocab.map(lit): _*)
    val base = spark.range(nDocs).select(
      col("id"),
      transform(sequence(lit(1), (h("dlen", 91) + 10).cast("int")),
        i => element_at(vocabArr,
          (pmod(xxhash64(col("id"), i, lit("dword")), lit(31)) + 1)
            .cast("int"))).as("words"))
      .select(col("id"), array_join(col("words"), " ").as("base_text"))
    val dupSrc = spark.range(nDocs).select(
      col("id"),
      when(h("ddup", 625) === 0,
        greatest(lit(0L), col("id") - 1 - h("dsrc", 100)))
        .otherwise(lit(null)).as("dup_of"),
      (h("dnear", 625) === 1).as("near"))
    val texts = dupSrc
      .join(base.select(col("id").as("dup_of"),
        col("base_text").as("src_text")), Seq("dup_of"), "left")
      .join(base, Seq("id"))
      .select(col("id"),
        when(col("dup_of").isNotNull && col("near"),
          concat(col("src_text"), lit(" spark")))
          .when(col("dup_of").isNotNull, col("src_text"))
          .otherwise(col("base_text")).as("text"))
    writeOne(texts.select(
      col("id").as("doc_id"), col("text"),
      when(u("dlang") < 0.41, "en").when(u("dlang") < 0.56, "zh")
        .when(u("dlang") < 0.71, "es").when(u("dlang") < 0.86, "fr")
        .otherwise("de").as("lang"),
      concat(lit("src"), h("dsrcid", 20)).as("source"),
      length(col("text")).as("n_chars")).orderBy("doc_id"), "documents")

    // -------- embeddings: 64-dim exactly-unit-norm float vectors (the
    // PQ squared-L2 ≡ cosine premise), 10 labels; ~1.6% are perturbed
    // copies of an earlier vector (re-normalized) so the semantic-dedup
    // family (c38/c12/m06-analog) has real prey at every scale
    val dim = 64
    def gauss(saltA: String, saltB: String): Column =
      transform(sequence(lit(0), lit(dim - 1)), j =>
        sqrt(lit(-2.0) * log(lit(1.0) -
          pmod(xxhash64(col("id"), j, lit(saltA)), lit(1000000000L)) / 1e9))
          * cos(lit(2.0 * math.Pi) *
            (pmod(xxhash64(col("id"), j, lit(saltB)), lit(1000000000L)) / 1e9)))
    def unit(v: Column): Column = {
      val n = sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x))
      transform(v, x => (x / n).cast("float"))
    }
    val rawVec = spark.range(nVecs).select(col("id"), gauss("va", "vb").as("g"))
    val vdup = spark.range(nVecs).select(col("id"),
      when(h("vdup", 60) === 0,
        greatest(lit(0L), col("id") - 1 - h("vsrc", 50)))
        .otherwise(lit(null)).as("dup_of"))
    val vecs = vdup
      .join(rawVec.select(col("id").as("dup_of"), col("g").as("src_g")),
        Seq("dup_of"), "left")
      .join(rawVec, Seq("id"))
      .select(col("id"),
        when(col("dup_of").isNotNull,
          zip_with(col("src_g"), gauss("vna", "vnb"),
            (a, b) => a + b * 0.05))
          .otherwise(col("g")).as("v"))
    writeOne(vecs.select(
      col("id").as("vec_id"),
      unit(col("v")).as("embedding"),
      h("vlabel", 10).cast("int").as("label")).orderBy("vec_id"),
      "embeddings")

    println(s"[makesf] done: $out at scale=$scale")
    spark.stop()
  }

  /** Deterministic Gaussian-mixture embeddings: 64 hashed cluster
    * centers (standard-normal 64-d), every vector = center(cluster(id))
    * + σ·hashed noise, unit-normalized — pure xxhash64 functions of
    * (cluster, j) and (id, j) like everything else MakeSf emits. With
    * σ = 0.5, within-cluster cosine ≈ 1/√(1+σ²) ≈ 0.89 and the centers
    * are near-orthogonal in 64-d (between-cluster cos ≈ 0): the
    * structure real embedding corpora have and the isotropic default
    * deliberately lacks. label = cluster mod 10 keeps the fixture's
    * 10-label shape. */
  private def writeClusteredEmbeddings(spark: SparkSession,
      writeOne: (DataFrame, String) => Unit, nVecs: Long): Unit = {
    val dim = 64
    val nClusters = 64L
    val sigma = 0.5
    def uu(key: Column, j: Column, salt: String): Column =
      pmod(xxhash64(key, j, lit(salt)), lit(1000000000L)) / 1e9
    def gaussOf(key: Column, saltA: String, saltB: String): Column =
      transform(sequence(lit(0), lit(dim - 1)), j =>
        sqrt(lit(-2.0) * log(lit(1.0) - uu(key, j, saltA)))
          * cos(lit(2.0 * math.Pi) * uu(key, j, saltB)))
    def unit(v: Column): Column = {
      val n = sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x))
      transform(v, x => (x / n).cast("float"))
    }
    val df = spark.range(nVecs)
      .select(col("id"),
        pmod(xxhash64(col("id"), lit("vclu")), lit(nClusters)).as("cl"))
      .select(col("id"), col("cl"),
        zip_with(gaussOf(col("cl"), "cca", "ccb"),
          gaussOf(col("id"), "cva", "cvb"),
          (c, g) => c + g * sigma).as("v"))
    writeOne(df.select(
      col("id").as("vec_id"),
      unit(col("v")).as("embedding"),
      pmod(col("cl"), lit(10L)).cast("int").as("label"))
      .orderBy("vec_id"), "embeddings")
  }
}
