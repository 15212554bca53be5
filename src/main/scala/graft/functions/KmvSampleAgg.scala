package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded bottom-k-by-hash sample buffer: keeps the k (hash, value)
  * pairs with the smallest hashes in UNSIGNED hash order. The hash is
  * stored sign-flipped (s = h ^ Long.MinValue) so signed comparisons on
  * s realise unsigned order on h — the same trick DuckDB's HUGEINT twin
  * applies arithmetically. Ties on the hash break by value, so the kept
  * multiset is a pure function of the input multiset: insertion order,
  * partitioning, and merge order all cancel out.
  */
final class KmvSampleBuffer(val k: Int) extends Serializable {
  // max-heap on (s, value): the current worst (largest) pair at the root
  val heap = new java.util.PriorityQueue[(Long, Double)](
    k.max(1),
    (a: (Long, Double), b: (Long, Double)) => {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Double.compare(b._2, a._2)
    })

  def insert(s: Long, v: Double): Unit = {
    if (k <= 0) return
    if (heap.size < k) heap.add((s, v))
    else {
      val w = heap.peek()
      if (s < w._1 || (s == w._1 && v < w._2)) { heap.poll(); heap.add((s, v)) }
    }
  }

  def mergeFrom(other: KmvSampleBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) { val p = it.next(); insert(p._1, p._2) }
  }

  /** pairs in ascending (s, value) order */
  def sortedPairs: Array[(Long, Double)] = {
    val arr = new Array[(Long, Double)](heap.size)
    val copy = new java.util.PriorityQueue[(Long, Double)](heap)
    var i = arr.length - 1
    while (i >= 0) { arr(i) = copy.poll(); i -= 1 }
    arr
  }

  /** the sampled VALUES in ascending value order — the order quantile
    * interpolation consumes */
  def valuesSorted: Array[Double] = {
    val vs = sortedPairs.map(_._2)
    java.util.Arrays.sort(vs)
    vs
  }
}

/** `kmv_sample(hash, value, k)` — the KMV trick (b09b) extended from
  * distinct-counting to RANK estimation: keeping the k rows whose
  * (unique-key) hashes are smallest in unsigned order is a uniform
  * deterministic sample of the group, so any sample quantile estimates
  * the population quantile with rank error O(1/√k) — and unlike
  * t-digest/KLL the sketch is a pure function of the data (no buffer
  * order, no compression schedule), so a DuckDB twin reproduces the
  * exact sampled multiset by ranking the same hashes and the estimate
  * hash-matches bit-for-bit.
  *
  * Scale: fixed k longs+doubles of state per group, partial-aggregated
  * map-side, O(log k) per row — the mergeable quantile sketch b21/b27's
  * exact forms cannot be at 100 TB. Returns the sampled values as
  * array<double> sorted ascending (the form interpolation wants);
  * groups smaller than k degrade to the exact value set.
  */
case class KmvSampleAggregate(
    hashExpr: Expression,
    valueExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSampleBuffer] {

  override def children: Seq[Expression] = Seq(hashExpr, valueExpr)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (k < 1) TypeCheckFailure(s"kmv_sample k must be >= 1, got $k")
    else if (hashExpr.dataType != LongType)
      TypeCheckFailure(
        s"kmv_sample hash must be BIGINT, got ${hashExpr.dataType.catalogString}")
    else if (valueExpr.dataType != DoubleType)
      TypeCheckFailure(
        s"kmv_sample value must be DOUBLE, got ${valueExpr.dataType.catalogString}")
    else TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): KmvSampleBuffer = new KmvSampleBuffer(k)

  override def update(buf: KmvSampleBuffer, input: InternalRow): KmvSampleBuffer = {
    val h = hashExpr.eval(input)
    val v = valueExpr.eval(input)
    // a null in either field skips the row: a null hash has no rank, and
    // sampling a null value would poison the interpolation downstream
    if (h != null && v != null)
      buf.insert(h.asInstanceOf[Long] ^ Long.MinValue, v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KmvSampleBuffer, other: KmvSampleBuffer): KmvSampleBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: KmvSampleBuffer): Any =
    new GenericArrayData(buf.valuesSorted.map(v => v: Any))

  override def serialize(buf: KmvSampleBuffer): Array[Byte] = {
    val arr = buf.sortedPairs
    val bb = ByteBuffer.allocate(8 + arr.length * 16)
    bb.putInt(buf.k)
    bb.putInt(arr.length)
    arr.foreach { case (s, v) => bb.putLong(s); bb.putDouble(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvSampleBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val kk = bb.getInt
    val n = bb.getInt
    val buf = new KmvSampleBuffer(kk)
    var i = 0
    while (i < n) { buf.insert(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSampleAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSampleAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(hashExpr = c(0), valueExpr = c(1))
  override def prettyName: String = "kmv_sample"
}

object KmvSampleAgg {
  /** Register `kmv_sample(hash, value, k)` in the session's function
    * registry (idempotent). */
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "kmv_sample")(
      exprs => {
        val k = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: java.lang.Integer, _) =>
            v.intValue
          case org.apache.spark.sql.catalyst.expressions.Literal(v: java.lang.Long, _) =>
            java.lang.Math.toIntExact(v.longValue)
          case other => throw new IllegalArgumentException(
            s"kmv_sample k must be an integer literal, got $other")
        }
        KmvSampleAggregate(exprs(0), exprs(1), k).toAggregateExpression()
      })

  def kmv_sample(spark: SparkSession, hash: Column, value: Column, k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("kmv_sample", hash, value,
      org.apache.spark.sql.functions.lit(k))
  }
}
