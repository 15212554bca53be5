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
  // Parallel-PRIMITIVE-array binary max-heap on (dist, id): the root is
  // the worst kept entry. ~20 B per slot + three array headers, vs the
  // ~200 B/slot a PriorityQueue of boxed tuples costs — the footprint
  // matters because ObjectHashAggregate's partial phase holds ONE
  // buffer per group in its hash map, and the group count before the
  // sort-based fallback (Nsw.BuildSessionConfs) is bounded by
  // buffer-size × threshold ≤ heap. Measured consequence of the boxed
  // form (r16, 2M-tier build attempt 1): ~500k distinct groups per
  // partition blew past the fallback threshold and the "sort-free"
  // build locally sorted its whole expansion into 74 GB of spill.
  private var n = 0
  private val hd = new Array[Double](math.max(k, 1))
  private val hi = new Array[Long](math.max(k, 1))
  private val hl = new Array[Int](math.max(k, 1))

  def size: Int = n

  // entry a is WORSE than entry b under the (dist, id) total order.
  // java.lang.Double.compare — NOT primitive `>` — so NaN sorts
  // greater-than-everything, exactly Spark's DoubleType ordering
  // (min_by / ORDER BY / row_number). Under primitive compares a NaN
  // dist (cosine_distance of a zero-norm embedding) is unordered: once
  // inside a non-full heap it can never be evicted and never bubbles,
  // making results arrival-order-dependent (ADVICE r16, medium).
  @inline private def worse(da: Double, ia: Long, db: Double, ib: Long)
      : Boolean = {
    val c = java.lang.Double.compare(da, db)
    c > 0 || (c == 0 && ia > ib)
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val d = hd(a); hd(a) = hd(b); hd(b) = d
    val i = hi(a); hi(a) = hi(b); hi(b) = i
    val l = hl(a); hl(a) = hl(b); hl(b) = l
  }

  private def siftUp(s0: Int): Unit = {
    var s = s0
    while (s > 0) {
      val p = (s - 1) >> 1
      if (worse(hd(s), hi(s), hd(p), hi(p))) { swap(s, p); s = p }
      else return
    }
  }

  private def siftDown(s0: Int): Unit = {
    var s = s0
    while (true) {
      val l = 2 * s + 1
      val r = l + 1
      var w = s
      if (l < n && worse(hd(l), hi(l), hd(w), hi(w))) w = l
      if (r < n && worse(hd(r), hi(r), hd(w), hi(w))) w = r
      if (w == s) return
      swap(s, w); s = w
    }
  }

  def insert(dist: Double, id: Long, label: Int): Unit = {
    if (k <= 0) return
    if (distinctIds) {
      // Fast path (r17): when the heap is FULL and the candidate is
      // STRICTLY worse than the root under (dist, id), it provably is
      // not in the heap — dist is a pure function of id within a group
      // (the registered precondition), so a kept copy of this id would
      // carry the identical (dist, id) pair, which cannot be both ≤ the
      // root (kept) and > the root (this candidate). Dropping without
      // the scan is therefore exact. This bounds the per-insert cost:
      // only candidates that BEAT the current root pay the O(k) scan —
      // without it, beam-width heaps (k = NSW's B, up to 1536 at the
      // 6.3M tier) would pay k/2 compares on every one of the
      // B·(M+F) candidate rows per query per hop.
      if (n == k && worse(dist, id, hd(0), hi(0))) return
      // one entry per id: keep the smaller (dist, label) — order-
      // independent, ≡ "min per id, then top-k". Linear scan only for
      // candidates at-or-better than the root (ties included: an equal
      // (dist, id) may still need its label reconciled).
      var s = 0
      while (s < n) {
        if (hi(s) == id) {
          val c = java.lang.Double.compare(dist, hd(s))
          if (c < 0 || (c == 0 && label < hl(s))) {
            // remove slot s, then re-insert the better copy
            n -= 1
            if (s != n) {
              hd(s) = hd(n); hi(s) = hi(n); hl(s) = hl(n)
              siftDown(s); siftUp(s)
            }
            insertBounded(dist, id, label)
          }
          return
        }
        s += 1
      }
    }
    insertBounded(dist, id, label)
  }

  private def insertBounded(dist: Double, id: Long, label: Int): Unit = {
    if (n < k) {
      hd(n) = dist; hi(n) = id; hl(n) = label
      n += 1
      siftUp(n - 1)
    } else if (worse(hd(0), hi(0), dist, id)) {
      hd(0) = dist; hi(0) = id; hl(0) = label
      siftDown(0)
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var s = 0
    while (s < other.n) {
      insert(other.hd(s), other.hi(s), other.hl(s))
      s += 1
    }
  }

  /** ascending (dist, id), NaN greater-than-all (Spark's DoubleType order) */
  def sorted: Array[(Double, Long, Int)] = {
    val idx = Array.range(0, n).sortWith { (a, b) =>
      val c = java.lang.Double.compare(hd(a), hd(b))
      c < 0 || (c == 0 && hi(a) < hi(b))
    }
    idx.map(s => (hd(s), hi(s), hl(s)))
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
    * upstream `distinct()` exchange of the full candidate volume.
    *
    * PRECONDITION (ADVICE r16): the `distinct ≡` equivalence above holds
    * only when (dist, label) is a pure function of id within each group —
    * the NSW shape, where dist is a deterministic distance between the
    * group key's embedding and id's embedding. Fed VARYING dists per id,
    * the aggregate computes "min-(dist,label)-per-id, then top-k" — a
    * well-defined, order-independent semantics, but NOT the same as
    * `distinct()` + `top_k_by` (which would keep each (dist,id,label)
    * variant as its own candidate). Callers with non-functional dists
    * should use `top_k_by` over a pre-deduplicated input instead. */
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
