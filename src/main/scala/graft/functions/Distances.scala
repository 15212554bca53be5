package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Vector-distance kernels — the Spark-native slot for the reference's
  * CUDA distance kernel / MapReduce mapper inner loop (SURVEY.md §2.F).
  *
  * Implementation notes:
  *  - Compiled Scala closures with `while` loops over the float arrays:
  *    several× faster than SQL higher-order-function chains
  *    (`aggregate(zip_with(...))`), which were the measured bottleneck in
  *    BASELINE.md. Stays inside Tungsten rows; one virtual call per pair.
  *  - All arithmetic in `double`, accumulated sequentially in array
  *    order. This matches DuckDB's list kernels on `DOUBLE[]` inputs
  *    bit-for-bit in practice, which is what makes the
  *    oracle hash-compare (round to 6 dp) stable.
  *  - At 100 TB scale these are embarrassingly parallel per-row kernels;
  *    the scale lever is the *join shape* around them (see ops.Knn), not
  *    the kernel itself.
  */
object Distances extends Serializable {

  @inline private def cosineDist(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0; val n = a.length
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  @inline private def euclidean(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0
    var i = 0; val n = a.length
    while (i < n) {
      val d = a(i).toDouble - b(i).toDouble
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  @inline private def dot(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0; var i = 0; val n = a.length
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  @inline private def norm(a: Seq[Float]): Double = math.sqrt(dot(a, a))

  private val cosineDistUdf = udf(cosineDist _)
  private val euclideanUdf  = udf(euclidean _)
  private val dotUdf        = udf(dot _)
  private val normUdf       = udf(norm _)

  /** Cosine distance = 1 - dot(a,b)/(|a|·|b|). DuckDB twin:
    * `1.0 - list_cosine_similarity(CAST(a AS DOUBLE[]), CAST(b AS DOUBLE[]))`. */
  def cosine_distance(a: Column, b: Column): Column = cosineDistUdf(a, b)

  /** Euclidean (L2) distance. DuckDB twin:
    * `list_distance(CAST(a AS DOUBLE[]), CAST(b AS DOUBLE[]))`. */
  def euclidean_distance(a: Column, b: Column): Column = euclideanUdf(a, b)

  /** Dot product. DuckDB twin: `list_inner_product(...)`. */
  def dot_product(a: Column, b: Column): Column = dotUdf(a, b)

  /** L2 norm of one vector. */
  def l2_norm(a: Column): Column = normUdf(a)
}
