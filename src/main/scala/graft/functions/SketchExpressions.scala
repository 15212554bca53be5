package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst forms of the document-sketch kernels (VERDICT r14
  * item 2 — the last `udf()` tier standing): MinHash signatures, LSH
  * band collapse, SimHash, the winnowing rolling-hash fingerprint, and
  * the L2 vector norm. Arithmetic is IDENTICAL to the [[TextHash]] /
  * [[Distances]] UDFs these replace (same FNV-1a constants, same
  * accumulation order), so every declared golden hash is unchanged —
  * the win is executional: each kernel now participates in whole-stage
  * codegen, reading tokens straight out of Tungsten `ArrayData` with no
  * Seq conversion, no boxing, and no ScalaUDF serialization barrier in
  * queries (c08, c10, c11, c13, c30, c31) that otherwise pipeline
  * end-to-end. These are per-doc O(tokens) map-side projections — the
  * shape that makes sketch dedup linear at 100 TB — so the constant
  * factor IS the cost model.
  */

/** n-permutation MinHash signature of a token set → array<bigint>.
  * Each token is UTF-8-read once from the row (the map-side hot loop),
  * hashed under n seeds; output slot i is the min of hash_i. */
case class MinhashSigExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"minhash_signature requires (array<string>, int), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(toks: Any, nAny: Any): Any = {
    val arr = toks.asInstanceOf[ArrayData]
    val n = nAny.asInstanceOf[Int]
    val sig = Array.fill(n)(Long.MaxValue)
    var t = 0
    while (t < arr.numElements()) {
      val bytes = arr.getUTF8String(t).getBytes
      var i = 0
      while (i < n) {
        // fnv1aBytes(bytes, seed = i + 1)
        var h = 0xcbf29ce484222325L ^ ((i + 1) * 0x100000001b3L)
        var j = 0
        while (j < bytes.length) {
          h ^= (bytes(j) & 0xffL); h *= 0x100000001b3L; j += 1
        }
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) => {
      val sig = ctx.freshName("sig")
      val t = ctx.freshName("t")
      val b = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      s"""
         |final long[] $sig = new long[$n];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $t = 0; $t < $a.numElements(); $t++) {
         |  final byte[] $b = $a.getUTF8String($t).getBytes();
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = 0xcbf29ce484222325L ^ (($i + 1) * 0x100000001b3L);
         |    for (int $j = 0; $j < $b.length; $j++) {
         |      $h ^= ($b[$j] & 0xffL);
         |      $h *= 0x100000001b3L;
         |    }
         |    if ($h < $sig[$i]) $sig[$i] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** Collapse a MinHash signature into nBands band-bucket hashes
  * (rows-per-band = sig.length / nBands) → array<bigint>. nBands must
  * divide the signature length — a silent remainder would weaken the
  * sketch. */
case class LshBandsExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_bands"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lsh_bands requires (array<bigint>, int), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(sigAny: Any, nAny: Any): Any = {
    val sig = sigAny.asInstanceOf[ArrayData]
    val nBands = nAny.asInstanceOf[Int]
    if (nBands <= 0 || sig.numElements() % nBands != 0)
      throw new IllegalArgumentException(
        s"lsh_bands: nBands=$nBands must divide signature length " +
          s"${sig.numElements()}")
    val rows = sig.numElements() / nBands
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < rows) {
        h ^= sig.getLong(b * rows + i); h *= 0x100000001b3L; i += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sig, n) => {
      val rows = ctx.freshName("rows")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |if ($n <= 0 || $sig.numElements() % $n != 0)
         |  throw new IllegalArgumentException("lsh_bands: nBands=" + $n +
         |    " must divide signature length " + $sig.numElements());
         |final int $rows = $sig.numElements() / $n;
         |final long[] $out = new long[$n];
         |for (int $b = 0; $b < $n; $b++) {
         |  long $h = 0xcbf29ce484222325L;
         |  for (int $i = 0; $i < $rows; $i++) {
         |    $h ^= $sig.getLong($b * $rows + $i);
         |    $h *= 0x100000001b3L;
         |  }
         |  $out[$b] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** 64-bit SimHash over a token set: sign of per-bit weighted sums of
  * each token's unseeded FNV-1a hash. */
case class SimHash64Expr(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(toks: Any): Any = {
    val arr = toks.asInstanceOf[ArrayData]
    val acc = new Array[Int](64)
    var t = 0
    while (t < arr.numElements()) {
      val bytes = arr.getUTF8String(t).getBytes
      // fnv1a(token, seed = 0): offset ^ (0 * prime) == offset
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < bytes.length) { h ^= (bytes(j) & 0xffL); h *= 0x100000001b3L; j += 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val acc = ctx.freshName("acc")
      val t = ctx.freshName("t")
      val by = ctx.freshName("bytes")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val out = ctx.freshName("out")
      s"""
         |final int[] $acc = new int[64];
         |for (int $t = 0; $t < $a.numElements(); $t++) {
         |  final byte[] $by = $a.getUTF8String($t).getBytes();
         |  long $h = 0xcbf29ce484222325L;
         |  for (int $j = 0; $j < $by.length; $j++) {
         |    $h ^= ($by[$j] & 0xffL);
         |    $h *= 0x100000001b3L;
         |  }
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $acc[$b]++; else $acc[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($acc[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Winnowing-style fingerprint: min over all k-gram character shingles
  * of a Rabin-Karp rolling hash (base = the FNV prime) — O(chars), zero
  * per-position allocation. Shingles run over UTF-16 code units of the
  * document string (the [[TextHash]] contract this must hash-match);
  * texts shorter than k fall back to seed-7 FNV-1a over UTF-8 bytes. */
case class WinnowFingerprintExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprint"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprint requires (string, int), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(textAny: Any, kAny: Any): Any = {
    val u8 = textAny.asInstanceOf[UTF8String]
    val k = kAny.asInstanceOf[Int]
    // Gate on UTF-16 length (String.length, code UNITS), not numChars
    // (code points): the TextHash.winnow contract branches on the
    // former, and for supplementary characters numChars < length — the
    // two gates disagree exactly when numChars < k <= length.
    val s16 = u8.toString
    if (s16.length < k) {
      // fnv1a(text, seed = 7) over the UTF-8 bytes
      val bytes = u8.getBytes
      var h = 0xcbf29ce484222325L ^ (7L * 0x100000001b3L)
      var j = 0
      while (j < bytes.length) { h ^= (bytes(j) & 0xffL); h *= 0x100000001b3L; j += 1 }
      h
    } else {
      val s = s16
      val B = 0x100000001b3L
      var bk = 1L
      var i = 0
      while (i < k) { bk *= B; i += 1 }
      var h = 0L
      i = 0
      while (i < k) { h = h * B + s.charAt(i); i += 1 }
      var best = h
      i = k
      while (i < s.length) {
        h = h * B + s.charAt(i) - bk * s.charAt(i - k)
        if (h < best) best = h
        i += 1
      }
      best
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, k) => {
      val s = ctx.freshName("str")
      val by = ctx.freshName("bytes")
      val bk = ctx.freshName("bk")
      val h = ctx.freshName("h")
      val best = ctx.freshName("best")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |final String $s = $c.toString();
         |if ($s.length() < $k) {
         |  final byte[] $by = $c.getBytes();
         |  long $h = 0xcbf29ce484222325L ^ (7L * 0x100000001b3L);
         |  for (int $j = 0; $j < $by.length; $j++) {
         |    $h ^= ($by[$j] & 0xffL);
         |    $h *= 0x100000001b3L;
         |  }
         |  ${ev.value} = $h;
         |} else {
         |  long $bk = 1L;
         |  for (int $i = 0; $i < $k; $i++) $bk *= 0x100000001b3L;
         |  long $h = 0L;
         |  for (int $i = 0; $i < $k; $i++) $h = $h * 0x100000001b3L + $s.charAt($i);
         |  long $best = $h;
         |  for (int $i = $k; $i < $s.length(); $i++) {
         |    $h = $h * 0x100000001b3L + $s.charAt($i) - $bk * $s.charAt($i - $k);
         |    if ($h < $best) $best = $h;
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** L2 norm of one float vector: sqrt(Σ aᵢ²), double accumulation in
  * array order (the [[Distances.l2_norm]] arithmetic). */
case class L2NormExpr(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_norm"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"l2_norm requires array<float>, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < x.numElements()) {
      val v = x.getFloat(i).toDouble
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  final double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SketchExpressions {
  def register(spark: SparkSession): Unit = {
    Registry.ensure(spark, "minhash_signature")(
      exprs => MinhashSigExpr(exprs(0), exprs(1)))
    Registry.ensure(spark, "lsh_bands")(
      exprs => LshBandsExpr(exprs(0), exprs(1)))
    Registry.ensure(spark, "simhash64")(exprs => SimHash64Expr(exprs(0)))
    Registry.ensure(spark, "winnow_fingerprint")(
      exprs => WinnowFingerprintExpr(exprs(0), exprs(1)))
    Registry.ensure(spark, "l2_norm")(exprs => L2NormExpr(exprs(0)))
  }

  import org.apache.spark.sql.functions.call_function

  def minhash_signature(spark: SparkSession, tokens: Column, n: Column): Column = {
    register(spark); call_function("minhash_signature", tokens, n)
  }
  def lsh_bands(spark: SparkSession, sig: Column, nBands: Column): Column = {
    register(spark); call_function("lsh_bands", sig, nBands)
  }
  def simhash64(spark: SparkSession, tokens: Column): Column = {
    register(spark); call_function("simhash64", tokens)
  }
  def winnow_fingerprint(spark: SparkSession, text: Column, k: Column): Column = {
    register(spark); call_function("winnow_fingerprint", text, k)
  }
  def l2_norm(spark: SparkSession, a: Column): Column = {
    register(spark); call_function("l2_norm", a)
  }
}
