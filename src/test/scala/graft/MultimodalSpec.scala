package graft

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
}
