package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Binary-column pipeline: header round-trip through the opaque payload,
  * feature shape, frame sampling, and the resize transform. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode recovers the header fields written into the payload") {
    val decoded = Multimodal.decodeMeta(spark, sf0001)
    assert(decoded.count() === 500)
    assert(decoded.where($"format" =!= "gm").count() === 0)
    // header fields must match the declared metadata query exactly
    val meta = Multimodal.assetMeta(spark, sf0001)
      .select($"asset_id", $"width", $"height", $"fps", $"n_body_bytes")
      .as[(Long, Int, Int, Int, Int)].collect().sortBy(_._1)
    val dec = decoded
      .select($"asset_id", $"width", $"height", $"fps", $"n_body_bytes")
      .as[(Long, Int, Int, Int, Int)].collect().sortBy(_._1)
    assert(dec.sameElements(meta))
  }

  test("byte histogram features are L1-normalized 16-d vectors") {
    val feats = Multimodal.byteHistogramFeatures(spark, sf0001)
      .select($"features").as[Array[Float]].collect()
    assert(feats.length === 500)
    assert(feats.forall(_.length === 16))
    assert(feats.forall(f => math.abs(f.sum - 1.0f) < 1e-3))
  }

  test("declared byte histogram is exploded scalar rows whose freqs sum to 1") {
    val rows = Multimodal.byteHistogram(spark, sf0001)
    // scalar-only output schema (array/map top-level columns crash the
    // driver's pandas canonicalization)
    assert(rows.schema.fields.forall(f =>
      !f.dataType.typeName.matches("array|map|struct")))
    val sums = rows.groupBy($"asset_id")
      .agg(org.apache.spark.sql.functions.sum($"freq").as("s"))
      .select($"s").as[Double].collect()
    assert(sums.length === 500)
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-4))
  }

  test("frame sampling emits every stride-th frame with bounded size") {
    val frames = Multimodal.frameSample(spark, sf0001, frameBytes = 64, stride = 4)
    val perAsset = frames.groupBy($"asset_id").count()
    assert(perAsset.count() === 500)
    val sizes = frames.select($"frame").as[Array[Byte]].collect()
    assert(sizes.forall(_.length <= 64))
    assert(frames.where($"frame_no" % 4 =!= 0).count() === 0)
  }

  test("resize rewrites header dims and shrinks the body") {
    val resized = Multimodal.resize(spark, sf0001, 320, 240)
      .select($"payload").as[Array[Byte]].collect()
    assert(resized.forall { b =>
      val w = ((b(2) & 0xff) << 8) | (b(3) & 0xff)
      val h = ((b(4) & 0xff) << 8) | (b(5) & 0xff)
      w == 320 && h == 240
    })
  }

  test("m06: signature near-dup pairs are ordered, non-empty, and transitive within buckets") {
    import spark.implicits._
    val pairs = Multimodal.assetNearDup(spark, sf0001)
      .as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => a < b })
    // same-signature relation is transitive: a~b and b~c must imply a~c
    val rel = pairs.toSet
    for ((a, b) <- rel; (b2, c) <- rel if b2 == b) assert(rel.contains((a, c)))
  }

  test("m07 phash: every emitted pair is ordered and within the radius, " +
    "and candidates are a vanishing fraction of the pair space") {
    val rows = Multimodal.phashNearDup(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      val h = r.getAs[Long]("hamming")
      assert(h >= 0L && h <= Multimodal.PhashHamTau, s"hamming $h")
    }
    // the tier only works at scale if near-dups are rare — the measured
    // design premise (0.018% of the pair space at sf0.01)
    val n = Tables.documents(spark, sf0001).count()
    assert(rows.length.toLong * 100 < n * (n - 1) / 2,
      s"${rows.length} pairs of ${n * (n - 1) / 2} — not a vanishing fraction")
  }

  test("m07 phash plan: the band self-join is an equi hash/merge join " +
    "keyed on (bno, bval), never a nested loop over all pairs") {
    val plan = Multimodal.phashNearDup(spark, sf0001)
      .queryExecution.executedPlan.toString
    // the candidate join must be keyed on the band columns (the 1-row
    // corpus-totals broadcast upstream is a legitimate cross join)
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[bno".r
      .findFirstIn(plan).isDefined,
      s"banded join degenerated to all-pairs:\n$plan")
  }

  test("m07 phash: the banded LSH is EXACT at the radius — every " +
    "hamming<=tau pair surfaces, none beyond, on adversarial signatures") {
    // handcrafted 64-bit signatures probing every band boundary:
    //  1 vs 2: identical (ham 0)         — must surface
    //  1 vs 3: 3 flips all in ONE band   — must surface (other 3 match)
    //  1 vs 4: 3 flips spread over 3 bands — must surface (band 3 matches)
    //  1 vs 5: 4 flips, one per band     — NO band matches; ham 4 > tau:
    //          correctly outside BOTH the radius and the candidate set
    //  6: far from everything
    val base = 0x0123456789ABCDEFL
    val sigs = Seq(
      1L -> base,
      2L -> base,
      3L -> (base ^ 0x7L),                                  // 3 bits, band 0
      4L -> (base ^ 0x0000100010001L << 3 ^ 0L),            // placeholder
      5L -> (base ^ 0x1000100010001000L),                   // 1 bit per band
      6L -> ~base)
    // 4 = base with one bit flipped in each of bands 0..2 (band 3 intact)
    val fixed = sigs.map { case (id, s) =>
      if (id == 4L) id -> (base ^ 0x0000000100010001L) else id -> s }
    val df = fixed.toDF("asset_id", "sig")
    val got = Multimodal.phashPairs(df).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Long]("hamming")).toMap
    assert(got.get((1L, 2L)).contains(0L), s"identical pair missing: $got")
    assert(got.get((1L, 3L)).contains(3L), s"one-band pair missing: $got")
    assert(got.get((1L, 4L)).contains(3L), s"spread pair missing: $got")
    assert(!got.contains((1L, 5L)), s"ham-4 pair leaked: $got")
    assert(got.get((2L, 3L)).contains(3L))
    assert(!got.keys.exists { case (a, b) => b == 6L || a == 6L },
      s"far signature matched something: $got")
  }

  test("byte-bin kernels equal the per-byte builtin chains they replaced " +
    "(the double-implementation law)") {
    // r13 swapped the per-byte explode for one codegen histogram pass;
    // the counts must be BIT-identical or every m03/m07 hash moves.
    // Declarative twin: the r12 conv(hex(substring)) chains, zero shared
    // code with the kernels.
    val a = graft.ops.Multimodal.assets(spark, sf0001)
    val viaKernel = a.where(octet_length(col("payload")) >= 10)
      .select(col("asset_id"),
        graft.functions.ByteBinsExpressions.bigram_bins(spark,
          col("payload")).as("bins"))
      .select(col("asset_id"), posexplode(col("bins")).as(Seq("bin", "cnt")))
      .where(col("cnt") > 0)
    val viaExplode = a.where(octet_length(col("payload")) >= 10)
      .select(col("asset_id"), col("payload"),
        explode(sequence(lit(9), octet_length(col("payload")) - 1)).as("i"))
      .select(col("asset_id"),
        expr("CAST(conv(hex(substring(payload, i, 2)), 16, 10) AS BIGINT)" +
          " * 2654435761 DIV 1024 % 64").cast("int").as("bin"))
      .groupBy(col("asset_id"), col("bin")).agg(count(lit(1)).as("cnt"))
    assert(viaKernel.except(viaExplode).count() === 0L &&
           viaExplode.except(viaKernel).count() === 0L,
      "bigram_bins must equal the conv(hex(substring)) chain")
    val nibKernel = a.where(octet_length(col("payload")) >= 9)
      .select(col("asset_id"),
        graft.functions.ByteBinsExpressions.nibble_bins(spark,
          col("payload")).as("bins"))
      .select(col("asset_id"), posexplode(col("bins")).as(Seq("bin", "cnt")))
      .where(col("cnt") > 0)
    val nibExplode = a.where(octet_length(col("payload")) >= 9)
      .select(col("asset_id"), col("payload"),
        explode(sequence(lit(9), octet_length(col("payload")))).as("i"))
      .select(col("asset_id"),
        expr("CAST(CAST(conv(hex(substring(payload, i, 1)), 16, 10) " +
          "AS BIGINT) DIV 16 AS INT)").as("bin"))
      .groupBy(col("asset_id"), col("bin")).agg(count(lit(1)).as("cnt"))
    assert(nibKernel.except(nibExplode).count() === 0L &&
           nibExplode.except(nibKernel).count() === 0L,
      "nibble_bins must equal the conv(hex(substring)) chain")
  }

  test("m03/m07 plans run the histogram kernels — the per-byte " +
    "substring/conv chain must be gone from the declared paths") {
    val p3 = graft.ops.Multimodal.byteHistogram(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p3.contains("nibble_bins"),
      s"m03 must bin through the codegen kernel:\n$p3")
    assert(!p3.contains("substring"),
      s"m03 still carries the per-byte slice chain:\n$p3")
    val p7 = graft.ops.Multimodal.phashNearDup(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p7.contains("bigram_bins"),
      s"m07 must bin through the codegen kernel:\n$p7")
    assert(!p7.contains("substring"),
      s"m07 still carries the per-byte slice chain:\n$p7")
  }
}
