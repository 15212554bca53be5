package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Bounded ordered set of the k smallest distinct longs. Values are
  * stored sign-flipped (h XOR Long.MinValue) so the natural signed order
  * of the stored values equals the UNSIGNED order of the raw hashes —
  * the order a KMV sketch is defined over. */
final class KmvBuffer(val k: Int) extends Serializable {
  val set = new java.util.TreeSet[java.lang.Long]()

  /** Insert a raw (signed) 64-bit hash; duplicates are no-ops. */
  def insert(h: Long): Unit = {
    if (k <= 0) return
    val f = h ^ Long.MinValue
    if (set.size < k) { set.add(f); () }
    else if (f < set.last && set.add(f)) { set.pollLast(); () }
  }

  def mergeFrom(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) insert(it.next() ^ Long.MinValue)
  }
}

/** `kmv_kth(hash, k)` — the k-minimum-values distinct-count sketch as a
  * TypedImperativeAggregate (SURVEY.md §2.B9/§2.F). Per group it keeps
  * the k smallest DISTINCT hash values in unsigned order and returns the
  * k-th smallest, sign-flipped (`u − 2^63` as a signed BIGINT), or NULL
  * when the group has fewer than k distinct hashes. The caller turns the
  * returned value f into the estimate `(k−1) / (f·2⁻⁶⁴ + 0.5)` — one
  * double conversion, one multiply by a power of two, one add: every
  * step is a single IEEE operation, so the estimate is bit-identical on
  * any engine that selects the same k-th hash. That is what makes this —
  * unlike HLL (b09), whose sketch layout is engine-private — an
  * approx-distinct with an exact cross-engine oracle.
  *
  * Scale shape: state is ≤ k longs per group, updates are O(log k),
  * merges are associative and commutative — map-side partial aggregation
  * does the heavy lifting and only (groups × k) longs ever shuffle,
  * exactly like a production KMV/theta sketch. The order-insensitivity
  * of "k smallest distinct" is also what makes the result deterministic
  * under any partitioning.
  */
case class KmvKthAggregate(
    hashExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(hashExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (k < 2) TypeCheckFailure(s"kmv_kth k must be >= 2, got $k")
    else if (hashExpr.dataType != LongType)
      TypeCheckFailure(
        s"kmv_kth hash must be BIGINT, got ${hashExpr.dataType.catalogString}")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = hashExpr.eval(input)
    if (h != null) buf.insert(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.mergeFrom(other); buf
  }

  /** The k-th smallest distinct hash (unsigned order), sign-flipped. */
  override def eval(buf: KmvBuffer): Any =
    if (buf.set.size < k) null else buf.set.last.longValue()

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.set.size * 8)
    bb.putInt(buf.k)
    bb.putInt(buf.set.size)
    buf.set.forEach(f => bb.putLong(f))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val kk = bb.getInt
    val n = bb.getInt
    val buf = new KmvBuffer(kk)
    var i = 0
    while (i < n) { buf.insert(bb.getLong ^ Long.MinValue); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvKthAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvKthAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(hashExpr = c(0))
  override def prettyName: String = "kmv_kth"
}

object KmvAgg {
  /** Register `kmv_kth(hash, k)` in the session's function registry
    * (idempotent). */
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "kmv_kth")(
      exprs => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: java.lang.Integer, _) =>
            v.intValue
          case org.apache.spark.sql.catalyst.expressions.Literal(v: java.lang.Long, _) =>
            java.lang.Math.toIntExact(v.longValue)
          case other => throw new IllegalArgumentException(
            s"kmv_kth k must be an integer literal, got $other")
        }
        KmvKthAggregate(exprs(0), k).toAggregateExpression()
      })

  def kmv_kth(spark: SparkSession, hash: Column, k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("kmv_kth", hash,
      org.apache.spark.sql.functions.lit(k))
  }
}
