package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded-heap neighbor buffer: keeps the k smallest (dist, id, label)
  * triples, ordered by (dist, id). With `distinctIds = true` the buffer
  * additionally keeps AT MOST ONE entry per id (the one with the
  * smallest (dist, label)) — so feeding it a multiset of candidate rows
  * computes exactly `distinct-then-top-k` without the upstream
  * `distinct()` exchange (VERDICT r15 item 5: the NSW descent fed its
  * ~n·(2M)²-row 2-hop expansion through a full hash exchange just to
  * dedup (u, v) pairs whose (dist, id) is a pure function of the pair
  * anyway; the heap now absorbs duplicates map-side and the one
  * exchange carries ≤ k rows per group per partition). */
final class TopKBuffer(val k: Int, val distinctIds: Boolean = false)
    extends Serializable {
  // max-heap on (dist, id) so the current worst neighbor is at the root
  val heap = new java.util.PriorityQueue[(Double, Long, Int)](
    k.max(1),
    (a: (Double, Long, Int), b: (Double, Long, Int)) => {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    })

  // id → live heap entry; allocated only in distinct mode
  private val byId: java.util.HashMap[java.lang.Long, (Double, Long, Int)] =
    if (distinctIds) new java.util.HashMap[java.lang.Long, (Double, Long, Int)]()
    else null

  def insert(dist: Double, id: Long, label: Int): Unit = {
    if (k <= 0) return
    if (distinctIds) {
      val prev = byId.get(id)
      if (prev != null) {
        // one entry per id: keep the smaller (dist, label). Order-
        // independent — equivalent to "min per id, then top-k".
        if (dist < prev._1 || (dist == prev._1 && label < prev._3)) {
          heap.remove(prev) // O(k); k is small by construction
          byId.remove(id)
          insertBounded(dist, id, label)
        }
        return
      }
    }
    insertBounded(dist, id, label)
  }

  private def insertBounded(dist: Double, id: Long, label: Int): Unit = {
    if (heap.size < k) {
      heap.add((dist, id, label))
      if (distinctIds) byId.put(id, (dist, id, label))
    } else {
      val worst = heap.peek()
      if (dist < worst._1 || (dist == worst._1 && id < worst._2)) {
        val evicted = heap.poll()
        heap.add((dist, id, label))
        if (distinctIds) {
          byId.remove(evicted._2)
          byId.put(id, (dist, id, label))
        }
      }
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) { val t = it.next(); insert(t._1, t._2, t._3) }
  }

  /** ascending (dist, id) */
  def sorted: Array[(Double, Long, Int)] = {
    val arr = new Array[(Double, Long, Int)](heap.size)
    var i = arr.length - 1
    val copy = new java.util.PriorityQueue[(Double, Long, Int)](heap)
    while (i >= 0) { arr(i) = copy.poll(); i -= 1 }
    arr
  }
}

/** `top_k_by(dist, id, label, k)` — a TypedImperativeAggregate that keeps
  * a bounded priority queue per group with map-side partial aggregation:
  * the Spark-native form of the reference's MapReduce combiner→reducer
  * top-k (SURVEY.md §2.F). Returns array<struct<dist,id,label>> sorted by
  * (dist, id) ascending.
  *
  * Scale rationale: both this aggregate and the window form shuffle only
  * O(m·k) rows — Spark 4 pushes a WindowGroupLimit below the exchange for
  * `row_number() <= k` (verified in the knn_topk plan). The aggregate
  * still earns its place: it replaces per-partition sort+limit with an
  * O(k) heap, merges partial states without re-sorting, and composes
  * with block-partitioned (non-broadcast) join layouts where each
  * query's candidates arrive in several independent blocks that a
  * rank-limit window cannot pre-combine.
  */
case class TopKByAggregate(
    distExpr: Expression,
    idExpr: Expression,
    labelExpr: Expression,
    k: Int,
    distinctIds: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(distExpr, idExpr, labelExpr)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (k < 1) TypeCheckFailure(s"top_k_by k must be >= 1, got $k")
    else if (distExpr.dataType != DoubleType)
      TypeCheckFailure(s"top_k_by dist must be DOUBLE, got ${distExpr.dataType.catalogString}")
    else if (idExpr.dataType != LongType)
      TypeCheckFailure(s"top_k_by id must be BIGINT, got ${idExpr.dataType.catalogString}")
    else if (labelExpr.dataType != IntegerType)
      TypeCheckFailure(s"top_k_by label must be INT, got ${labelExpr.dataType.catalogString}")
    else TypeCheckSuccess
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dist", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("label", IntegerType, nullable = false))))

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, distinctIds)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val d = distExpr.eval(input)
    val id = idExpr.eval(input)
    val lb = labelExpr.eval(input)
    // a null in ANY field skips the row (coercing a null label to a real
    // class id would fabricate votes downstream)
    if (d != null && id != null && lb != null) {
      buf.insert(d.asInstanceOf[Double], id.asInstanceOf[Long],
        lb.asInstanceOf[Int])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows: Array[Any] = buf.sorted.map { case (d, id, lb) =>
      InternalRow(d, id, lb)
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val arr = buf.sorted
    val bb = ByteBuffer.allocate(8 + arr.length * 20)
    bb.putInt(buf.k)
    bb.putInt(arr.length)
    arr.foreach { case (d, id, lb) => bb.putDouble(d); bb.putLong(id); bb.putInt(lb) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val kk = bb.getInt
    val n = bb.getInt
    val buf = new TopKBuffer(kk, distinctIds)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong, bb.getInt); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(distExpr = c(0), idExpr = c(1), labelExpr = c(2))
  override def prettyName: String =
    if (distinctIds) "top_k_distinct_by" else "top_k_by"
}

object TopKAgg {
  /** Register `top_k_by(dist, id, label, k)` in the session's function
    * registry (idempotent). */
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "top_k_by")(
      exprs => {
        // match the boxed integer types explicitly: a NULL literal or a
        // non-integer literal falls through to the helpful error instead
        // of an NPE / raw NumberFormatException
        val k = exprs(3) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: java.lang.Integer, _) =>
            v.intValue
          case org.apache.spark.sql.catalyst.expressions.Literal(v: java.lang.Long, _) =>
            java.lang.Math.toIntExact(v.longValue)
          case other => throw new IllegalArgumentException(
            s"top_k_by k must be an integer literal, got $other")
        }
        TopKByAggregate(exprs(0), exprs(1), exprs(2), k).toAggregateExpression()
      })

  def top_k_by(spark: SparkSession, dist: Column, id: Column, label: Column,
      k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("top_k_by", dist, id, label,
      org.apache.spark.sql.functions.lit(k))
  }

  /** Register `top_k_distinct_by(dist, id, label, k)` — the
    * [[TopKBuffer]] distinct-ids mode: at most one heap entry per id
    * (min (dist, label) wins), so a caller may feed a raw candidate
    * MULTISET and still get exactly `distinct-then-top-k`, with no
    * upstream `distinct()` exchange of the full candidate volume. */
  def registerDistinct(spark: SparkSession): Unit =
    Registry.ensure(spark, "top_k_distinct_by")(
      exprs => {
        val k = exprs(3) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: java.lang.Integer, _) =>
            v.intValue
          case org.apache.spark.sql.catalyst.expressions.Literal(v: java.lang.Long, _) =>
            java.lang.Math.toIntExact(v.longValue)
          case other => throw new IllegalArgumentException(
            s"top_k_distinct_by k must be an integer literal, got $other")
        }
        TopKByAggregate(exprs(0), exprs(1), exprs(2), k, distinctIds = true)
          .toAggregateExpression()
      })

  def top_k_distinct_by(spark: SparkSession, dist: Column, id: Column,
      label: Column, k: Int): Column = {
    registerDistinct(spark)
    org.apache.spark.sql.functions.call_function("top_k_distinct_by",
      dist, id, label, org.apache.spark.sql.functions.lit(k))
  }
}
