package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2 driver-mandated scope):
  * image/audio/video treated as opaque `binary` payloads with typed
  * metadata, plus decode / feature-extract / resize / frame-sample
  * operators.
  *
  * The container has no media codecs, so the *decode* step is a
  * clearly-marked deterministic fake (parse of our own synthetic header)
  * — but everything Spark-cares-about is real and tested: the
  * binary+struct schema, the mapPartitions batch shape (one decoder
  * instance per partition, streaming rows through it — exactly how a
  * JNI/FFmpeg decoder would be mounted), partitioning, and the byte-level
  * feature extractor (a genuine computation feeding the similarity ops).
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no driver
  * collect); per-partition decoder setup amortizes model/codec init;
  * frame-sample explodes rows map-side without shuffle; features are
  * fixed-width float arrays ready for the Ann/Knn operators.
  */
object Multimodal {

  // Header-field derivations shared by assets() (what gets ENCODED into
  // payloads) and assetMeta() (the oracle-checked description of them) —
  // one definition so they cannot drift apart.
  private def widthExpr  = (col("n_chars") % 640 + 16).cast("int")
  private def heightExpr = (col("n_chars") % 480 + 9).cast("int")
  private def fpsExpr    = when(col("lang") === "en", 24).otherwise(30).cast("int")

  /** Synthesize a deterministic binary corpus from `documents`: payload =
    * 8-byte header (2-byte magic, 2-byte width, 2-byte height, 2-byte
    * fps) + UTF-8 body. Stand-in for reading real image/audio blobs. */
  def assets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("asset_id"),
      widthExpr.as("width"),
      heightExpr.as("height"),
      fpsExpr.as("fps"),
      encode(col("text"), "UTF-8").as("body"))
      .select(col("asset_id"), col("width"), col("height"), col("fps"),
        concat(
          lit(Array[Byte](0x47.toByte, 0x4d.toByte)), // "GM" magic
          headerBytes(col("width")), headerBytes(col("height")),
          headerBytes(col("fps")), col("body")).as("payload"))

  // 2 big-endian bytes of a 16-bit value, as builtins (codegen'd; no UDF
  // in a declared query's input): hex → zero-pad to 4 nibbles → bytes.
  private def headerBytes(v: org.apache.spark.sql.Column) =
    unhex(lpad(hex(v), 4, "0"))

  case class AssetMeta(asset_id: Long, format: String, width: Int,
      height: Int, fps: Int, n_body_bytes: Int)

  /** Decode stub: parse the synthetic header out of the binary payload.
    * A real deployment replaces `parseHeader` with the codec call; the
    * mapPartitions mounting (per-partition decoder lifecycle) is the
    * production shape and is what this operator actually exercises. */
  def decodeMeta(s: SparkSession, d: String): DataFrame =
    decodePayloads(s, assets(s, d).select(col("asset_id"), col("payload")))

  /** The ONE decode path — (asset_id, payload) → AssetMeta rows via a
    * mapPartitions decoder (per-partition init, once, not per row) —
    * shared by decodeMeta and resizeMeta so a header-format change can
    * never leave one of them decoding stale offsets. */
  private def decodePayloads(s: SparkSession, df: DataFrame): DataFrame = {
    import s.implicits._
    df.as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (fmt, w, h, fps) = parseHeader(bytes)
          AssetMeta(id, fmt, w, h, fps, bytes.length - 8)
        }
      }
      .toDF()
  }

  private def parseHeader(bytes: Array[Byte]): (String, Int, Int, Int) = {
    val fmt = if (bytes.length >= 2 && bytes(0) == 0x47 && bytes(1) == 0x4d) "gm"
      else "unknown" // a real decoder would sniff magic numbers the same way
    def u16(i: Int): Int = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    if (bytes.length >= 8) (fmt, u16(2), u16(4), u16(6)) else (fmt, 0, 0, 0)
  }

  /** Feature extraction: 16-bin byte histogram of the body, L1-normalized
    * to float — a real (if simple) content feature, shaped exactly like
    * an image/audio embedding and consumable by the Ann/Knn operators.
    * (Not declared: top-level array columns crash the harness's pandas
    * canonicalization — the declared twin is the exploded byteHistogram.) */
  def byteHistogramFeatures(s: SparkSession, d: String): DataFrame = {
    val hist = udf { (bytes: Array[Byte]) =>
      val h = new Array[Float](16)
      var i = 8 // skip header
      while (i < bytes.length) { h((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
      val n = (bytes.length - 8).max(1).toFloat
      h.map(_ / n)
    }
    assets(s, d).select(col("asset_id"), hist(col("payload")).as("features"))
  }

  /** Declared (oracle-checked) histogram: one scalar row per non-empty
    * bin — exact long counts, one double division. The body is the UTF-8
    * encoding of ASCII text, so the oracle recovers each byte as
    * ascii(char) and bins by integer-division 16. */
  def byteHistogram(s: SparkSession, d: String): DataFrame =
    // one codegen pass per asset (r13, VERDICT r12 item 4): the r12
    // builtin rebuild kept the no-JVM-udf doctrine but exploded one row
    // per BODY BYTE; NibbleBinsExpr computes the whole 16-bin histogram
    // inside whole-stage codegen and only the ≤16 non-empty bins explode
    // — same counts bit-for-bit (the kernel bins the identical unsigned
    // byte values), so the declared hash is unchanged. Guard len ≥ 9:
    // an empty body has no histogram row.
    assets(s, d)
      .where(octet_length(col("payload")) >= 9)
      .select(col("asset_id"),
        (octet_length(col("payload")) - 8).cast("long").as("n"),
        graft.functions.ByteBinsExpressions.nibble_bins(s, col("payload"))
          .as("bins"))
      .select(col("asset_id"), col("n"),
        posexplode(col("bins")).as(Seq("bin", "cnt")))
      .where(col("cnt") > 0)
      .select(col("asset_id"), col("bin"), col("cnt"),
        round(col("cnt").cast("double") / col("n"), 6).as("freq"))
      .orderBy(col("asset_id"), col("bin"))

  /** "Resize" stub: a payload→payload transform that rewrites the header
    * (new dimensions) and passes the body through ??? -- here a
    * deterministic truncation stands in for the pixel resample. */
  def resize(s: SparkSession, d: String, newW: Int, newH: Int): DataFrame = {
    import s.implicits._
    assets(s, d).select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val body = bytes.drop(8)
          // REAL resample would go here; deterministic stand-in keeps a
          // proportional prefix of the body.
          val scaled = body.take(math.max(1, body.length / 2))
          val hdr = Array[Byte](0x47, 0x4d,
            ((newW >> 8) & 0xff).toByte, (newW & 0xff).toByte,
            ((newH >> 8) & 0xff).toByte, (newH & 0xff).toByte,
            bytes(6), bytes(7))
          (id, hdr ++ scaled)
        }
      }
      .toDF("asset_id", "payload")
  }

  /** Frame sampling: split the body into fixed-size "frames" and emit one
    * row per sampled frame (every `stride`-th) — the map-side explode
    * shape of video-frame extraction. */
  def frameSample(s: SparkSession, d: String, frameBytes: Int = 64,
      stride: Int = 4): DataFrame = {
    import s.implicits._
    assets(s, d).select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val body = bytes.drop(8)
        val nFrames = (body.length + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).map { f =>
          (id, f, body.slice(f * frameBytes, (f + 1) * frameBytes))
        }
      }
      .toDF("asset_id", "frame_no", "frame")
  }

  /** m04: declared frame-sampling surface — the sampled frames' ordinals
    * and byte counts. The frames themselves stay binary (top-level binary
    * columns can't go through the harness's canonicalization), but frame
    * boundaries and sizes are exactly the oracle-checkable contract of
    * the sampler: stride-4 over ceil(body/64) frames, last frame ragged. */
  def frameMeta(s: SparkSession, d: String): DataFrame =
    frameSample(s, d, frameBytes = 64, stride = 4)
      .select(col("asset_id"),
        col("frame_no").cast("int").as("frame_no"),
        octet_length(col("frame")).cast("int").as("n_frame_bytes"))
      .orderBy(col("asset_id"), col("frame_no"))

  /** m05: resize round-trip — run the payload→payload resize, then decode
    * the result's header back out through the same mapPartitions decoder
    * as m02. Value-checks the whole rewrite: new dimensions land in the
    * header, fps survives, and the body shrinks to the documented
    * max(1, n/2) prefix. */
  def resizeMeta(s: SparkSession, d: String): DataFrame =
    decodePayloads(s, resize(s, d, 320, 240))
      .orderBy(col("asset_id"))

  /** Declared metadata query — the oracle-checkable slice of the binary
    * pipeline (byte lengths and header-derived fields are pure SQL on
    * both engines; the docs are ASCII so octet_length(text) = body bytes). */
  def assetMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("asset_id"),
      widthExpr.as("width"),
      heightExpr.as("height"),
      fpsExpr.as("fps"),
      octet_length(col("text")).as("n_body_bytes"))
      .orderBy(col("asset_id"))

  /** m06: content-signature near-dup over the BINARY corpus — assets
    * whose bodies have the same HALF-RESOLUTION byte histogram (the
    * bag-of-bytes key at count granularity 2: catches exact copies,
    * content permutations, and single-byte-per-bin edits — the cheap
    * first tier of binary dedup). The signature is a canonical string of
    * the non-empty (bin, count div 2) pairs, so candidate generation is ONE
    * equi-join on a computed key — the same bucketed shape as the text
    * sketches, never O(n²). Pairs are emitted a<b within each signature
    * bucket; at 100 TB the signature would be hashed and the join
    * bucket-partitioned, with the (rare) giant bucket handled by the
    * same salting as any skewed key. */
  def assetNearDup(s: SparkSession, d: String): DataFrame = {
    val hist = udf { (bytes: Array[Byte]) =>
      val h = new Array[Long](16)
      var i = 8 // skip header
      while (i < bytes.length) { h((bytes(i) & 0xff) >> 4) += 1L; i += 1 }
      h
    }
    val sig = assets(s, d)
      .select(col("asset_id"), posexplode(hist(col("payload"))).as(Seq("bin", "cnt0")))
      // half-resolution counts: docs differing by one byte per bin still
      // collide, so the key catches near-identical bodies, not only copies
      .select(col("asset_id"), col("bin"), expr("cnt0 div 2").as("cnt"))
      .where(col("cnt") > 0)
      .groupBy(col("asset_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("bin"), col("cnt")))),
          x => concat(x.getField("bin").cast("string"), lit(":"),
            x.getField("cnt").cast("string"))), ",").as("sig"))
    sig.as("a").join(sig.as("b"),
        col("a.sig") === col("b.sig") && col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("a_id"), col("b.asset_id").as("b_id"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** m07 Hamming radius (≤3 bit flips counts as a near-dup) and the band
    * count. 4 bands of 16 bits make the LSH EXACT at this radius: a pair
    * differing in ≤3 bits can dirty at most 3 of the 4 bands, so some
    * band always matches (pigeonhole) — candidates are a superset of
    * every true pair and the verify step loses nothing. */
  val PhashHamTau = 3
  val PhashBands = 4

  /** m07: perceptual-hash near-dup over the binary corpus — the aHash
    * shape every image-dedup pipeline runs (pHash/aHash over pixels;
    * here over the codec-free byte distribution, same machinery): each
    * asset compresses to a 64-BIT SIGNATURE, and near-duplicates are
    * signature pairs within Hamming distance [[PhashHamTau]]. Beside
    * m06's exact-signature tier this is the TOLERANT tier: m06 needs the
    * whole histogram equal at count granularity 2; m07 allows any
    * [[PhashHamTau]] bins to drift across their threshold line.
    *
    * Feature and bit rule: body-byte BIGRAMS hash into 64 bins
    * (bin = ((b₁·256+b₂)·2654435761) ÷ 1024 mod 64 — Knuth's
    * multiplicative mix, exact BIGINTs on both engines), and
    * bit i = cnt_i·Ntot > n·Ctot_i — above the CORPUS's average share
    * of that bin, a pure integer cross-multiply. Both choices are
    * measured necessities, not style: single-byte bins against the
    * UNIFORM mean left every ASCII document with the same
    * common-letter bits (all C(n,2) pairs within τ — zero
    * information); corpus centering alone still left 37% of pairs
    * within τ; bigram bins + corpus centering cut that to 0.018% at
    * sf0.01 — the same reason SimHash features are n-grams weighted
    * against corpus frequency. The corpus profile is a 64-row
    * broadcast.
    *
    * Scale shape: candidate generation is the banded-signature equi-join
    * (the c10 MinHash band trick on Hamming space): 4×16-bit bands,
    * candidates = pairs sharing any band — one computed-key self-join,
    * never O(n²) — then one codegen bit_count(xor) verify per candidate.
    * At 100 TB signatures are 8 bytes/asset, the band join is
    * bucket-partitionable like every other sketch join here, and the
    * cross-multiply rides DECIMAL(38,0) once cnt·Ntot nears 2⁶³. */
  def phashNearDup(s: SparkSession, d: String): DataFrame = {
    // one codegen pass per asset (r13, VERDICT r12 item 4 — the reclaim
    // of the r12 udf→builtin trade): BigramBinsExpr computes the whole
    // 64-bin Knuth-mixed bigram histogram inside whole-stage codegen, so
    // the exploded row volume drops from corpus BYTES to ≤64 bins per
    // asset while the counts stay bit-identical to the old
    // conv(hex(substring)) chain (same unsigned pair values, same exact
    // long arithmetic) — declared hash unchanged, oracle untouched.
    // Absent (cnt=0) bins produce no row; downstream the bit rule treats
    // absent and 0 identically. Guard len ≥ 10: one bigram needs 2 body
    // bytes.
    val binned = assets(s, d)
      .where(octet_length(col("payload")) >= 10)
      .select(col("asset_id"),
        (octet_length(col("payload")) - 9).cast("long").as("n"),
        graft.functions.ByteBinsExpressions.bigram_bins(s, col("payload"))
          .as("bins"))
      .select(col("asset_id"), col("n"),
        posexplode(col("bins")).as(Seq("bin", "cnt")))
      .where(col("cnt") > 0)
    // ntot derives from the 64-row per-bin table — NOT a second scan of
    // the asset table (sum of sums is the same exact integer)
    val perBin = binned.groupBy(col("bin")).agg(sum(col("cnt")).as("ctot"))
    val corpus = perBin.crossJoin(broadcast(
      perBin.agg(sum(col("ctot")).as("ntot"))))
    val sig = binned.join(broadcast(corpus), Seq("bin"))
      .groupBy(col("asset_id"))
      .agg(expr("bit_or(CASE WHEN cnt * ntot > n * ctot" +
        " THEN shiftleft(CAST(1 AS BIGINT), bin) ELSE CAST(0 AS BIGINT)" +
        " END)").as("sig"))
    phashPairs(sig)
  }

  /** The banded-LSH + verify stage over a (asset_id, sig) signature
    * table — factored out of [[phashNearDup]] so the radius-exactness
    * law (every Hamming-≤τ pair is emitted, none beyond) is testable on
    * handcrafted signatures. */
  private[graft] def phashPairs(sig: DataFrame): DataFrame = {
    val bands = sig.select(col("asset_id"), col("sig"),
        explode(sequence(lit(0), lit(PhashBands - 1))).as("bno"))
      .select(col("asset_id"), col("sig"), col("bno"),
        expr("(sig >> (16 * bno)) & 65535").as("bval"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bno") === col("b.bno") && col("a.bval") === col("b.bval") &&
          col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("a_id"), col("b.asset_id").as("b_id"),
        col("a.sig").as("asig"), col("b.sig").as("bsig"))
      .distinct()
    cand
      .select(col("a_id"), col("b_id"),
        expr("CAST(bit_count(asig ^ bsig) AS BIGINT)").as("hamming"))
      .where(col("hamming") <= PhashHamTau)
      .orderBy(col("a_id"), col("b_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m07_phash_neardup" -> (phashNearDup _),
    "m06_asset_neardup" -> (assetNearDup _),
    "m01_asset_meta" -> (assetMeta _),
    "m02_decode_meta" -> (decodeMeta _),
    "m03_byte_histogram" -> (byteHistogram _),
    "m04_frame_sample" -> (frameMeta _),
    "m05_resize_meta" -> (resizeMeta _),
  )

  val oracles: Map[String, String] = Map(
    // m07: same bigram-bin histogram rebuilt from the ASCII text (the
    // body is its UTF-8), same Knuth-mix bin formula in exact BIGINTs,
    // same corpus-mean-centered bit rule (cnt*Ntot > n*Ctot), same
    // 4x16-bit bands, same bit_count verify. A doc missing a bin
    // contributes no row, matching the engine's cnt=0 -> bit 0.
    "m07_phash_neardup" ->
      s"""WITH pos AS (
         |  SELECT doc_id, text, unnest(range(1, length(text))) AS i
         |  FROM documents),
         |c AS (
         |  SELECT doc_id,
         |    ((ascii(substr(text, CAST(i AS INTEGER), 1)) * 256
         |      + ascii(substr(text, CAST(i AS INTEGER) + 1, 1)))
         |     * 2654435761) // 1024 % 64 AS bin
         |  FROM pos),
         |h AS (SELECT doc_id, bin, CAST(count(*) AS BIGINT) AS cnt
         |      FROM c GROUP BY doc_id, bin),
         |tot AS (SELECT doc_id, CAST(length(text) - 1 AS BIGINT) AS n
         |        FROM documents),
         |corp AS (SELECT bin, CAST(sum(cnt) AS BIGINT) AS ctot
         |         FROM h GROUP BY bin),
         |ntot AS (SELECT CAST(sum(cnt) AS BIGINT) AS ntot FROM h),
         |sig AS (
         |  SELECT h.doc_id,
         |    bit_or(CASE WHEN cnt * ntot > n * ctot
         |      -- bit 63: DuckDB checks 1<<63 overflow; Spark's shiftleft
         |      -- wraps to min-long — spell that value out explicitly
         |      THEN (CASE WHEN h.bin = 63 THEN -9223372036854775807 - 1
         |            ELSE (CAST(1 AS BIGINT) << h.bin) END)
         |      ELSE CAST(0 AS BIGINT) END) AS sig
         |  FROM h JOIN tot ON h.doc_id = tot.doc_id
         |  JOIN corp ON h.bin = corp.bin CROSS JOIN ntot
         |  GROUP BY h.doc_id),
         |bands AS (
         |  SELECT doc_id, sig, unnest(range(0, $PhashBands)) AS bno
         |  FROM sig),
         |bv AS (SELECT doc_id, sig, bno,
         |         (sig >> CAST(16 * bno AS INTEGER)) & 65535 AS bval
         |       FROM bands),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         |    a.sig AS asig, b.sig AS bsig
         |  FROM bv a JOIN bv b ON a.bno = b.bno AND a.bval = b.bval
         |    AND a.doc_id < b.doc_id)
         |SELECT a_id, b_id,
         |  CAST(bit_count(xor(asig, bsig)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(asig, bsig)) <= $PhashHamTau
         |ORDER BY a_id, b_id""".stripMargin,
    // m06: the body is the UTF-8 of ASCII text, so the oracle rebuilds
    // each byte histogram from characters and joins on the same
    // canonical "bin:cnt,..." signature string
    "m06_asset_neardup" ->
      """WITH pos AS (
        |  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    ascii(substr(text, CAST(i AS INTEGER), 1)) // 16 AS bin
        |  FROM pos),
        |h AS (SELECT doc_id, bin, count(*) // 2 AS cnt
        |      FROM c GROUP BY doc_id, bin),
        |h2 AS (SELECT * FROM h WHERE cnt > 0),
        |sig AS (
        |  SELECT doc_id, string_agg(bin || ':' || cnt, ',' ORDER BY bin) AS sig
        |  FROM h2 GROUP BY doc_id)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |FROM sig a JOIN sig b ON a.sig = b.sig AND a.doc_id < b.doc_id
        |ORDER BY a_id, b_id""".stripMargin,
    // m02 = m01's header fields recovered THROUGH the binary payload (the
    // mapPartitions decode path); the oracle describes the same surface
    // from the source table plus the constant magic-derived format tag,
    // so the decode round-trip is value-checked, not just row-counted.
    "m02_decode_meta" ->
      """SELECT doc_id AS asset_id, 'gm' AS format,
        |  CAST(n_chars % 640 + 16 AS INTEGER) AS width,
        |  CAST(n_chars % 480 + 9 AS INTEGER) AS height,
        |  CAST(CASE WHEN lang = 'en' THEN 24 ELSE 30 END AS INTEGER) AS fps,
        |  octet_length(CAST(text AS BLOB)) AS n_body_bytes
        |FROM documents ORDER BY asset_id""".stripMargin,
    "m01_asset_meta" ->
      """SELECT doc_id AS asset_id,
        |  CAST(n_chars % 640 + 16 AS INTEGER) AS width,
        |  CAST(n_chars % 480 + 9 AS INTEGER) AS height,
        |  CAST(CASE WHEN lang = 'en' THEN 24 ELSE 30 END AS INTEGER) AS fps,
        |  octet_length(CAST(text AS BLOB)) AS n_body_bytes
        |FROM documents ORDER BY asset_id""".stripMargin,
    // m04: the docs are ASCII, so body bytes = length(text); frames are
    // 64-byte windows sampled every 4th, with a ragged final frame.
    "m04_frame_sample" ->
      """WITH b AS (
        |  SELECT doc_id, octet_length(CAST(text AS BLOB)) AS L
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, L,
        |    unnest(range(0, CAST((L + 63) // 64 AS BIGINT), 4)) AS frame_no
        |  FROM b)
        |SELECT doc_id AS asset_id, CAST(frame_no AS INTEGER) AS frame_no,
        |  CAST(least(64, L - frame_no * 64) AS INTEGER) AS n_frame_bytes
        |FROM f ORDER BY asset_id, frame_no""".stripMargin,
    // m05: resized header carries the new 320x240 dims and the original
    // fps; the stand-in "resample" keeps a max(1, n/2)-byte body prefix.
    "m05_resize_meta" ->
      """SELECT doc_id AS asset_id, 'gm' AS format,
        |  CAST(320 AS INTEGER) AS width,
        |  CAST(240 AS INTEGER) AS height,
        |  CAST(CASE WHEN lang = 'en' THEN 24 ELSE 30 END AS INTEGER) AS fps,
        |  CAST(greatest(1, octet_length(CAST(text AS BLOB)) // 2) AS INTEGER)
        |    AS n_body_bytes
        |FROM documents ORDER BY asset_id""".stripMargin,
    "m03_byte_histogram" ->
      """WITH pos AS (
        |  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    ascii(substr(text, CAST(i AS INTEGER), 1)) // 16 AS bin
        |  FROM pos),
        |h AS (SELECT doc_id, bin, count(*) AS cnt FROM c GROUP BY doc_id, bin),
        |tot AS (SELECT doc_id, length(text) AS n FROM documents)
        |SELECT h.doc_id AS asset_id, CAST(bin AS INTEGER) AS bin,
        |  CAST(cnt AS BIGINT) AS cnt,
        |  round(CAST(cnt AS DOUBLE) / n, 6) AS freq
        |FROM h JOIN tot ON h.doc_id = tot.doc_id
        |ORDER BY asset_id, bin""".stripMargin,
  )
}
