package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Nearest-centroid assignment against a DRIVER-SIDE centroid table —
  * the narrow form of the coarse-quantizer assignment for k past the
  * literal-inlining bound (r16, the scaled-k rung): the k ≤ 16 path
  * inlines one struct per centroid and reduces with array_max, but at
  * k ≈ √n (hundreds at decade scale) that expression tree is exactly
  * the ~3000-node codegen collapse the PQ assignment already measured
  * and reverted (SimilarityQueries pqAssign's r9 note). This expression
  * holds the centroid matrix as ordinary data — ONE plan node at any k
  * — and its eval is a tight compiled loop: per row, k sequential
  * dot-products over the shared vector-norm, argmax by
  * (6-dp-rounded cosine DESC, centroid_id ASC).
  *
  * Numerics contract (the oracle pin): dot and both norms accumulate
  * sequentially left-to-right exactly as [[CosineSimilarity]] does, the
  * rounding is the shared floor(x·10⁶ + 0.5)/10⁶, and the comparison
  * uses java.lang.Double.compare — NaN greater than everything, NaN =
  * NaN — which is both Spark's and DuckDB's ordering of NaN in a DESC
  * sort, so a zero-norm row (all-NaN cosines) deterministically lands
  * on the lowest centroid id in all three implementations.
  *
  * CodegenFallback: the per-row work is the k·d fused loop itself —
  * already compiled Scala — so generated-code fusion would save only
  * the virtual call, and the surrounding projection stays narrow (no
  * shuffle at ANY k; the join+window form this replaces moves n·k
  * vector-carrying rows through an exchange).
  */
case class NearestCentroid(cents: Array[(Long, Array[Double])],
    child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.simpleString}")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)

  // centroid L2 norms, precomputed once per executor — the same
  // sequential left-to-right Σv² + sqrt the cosine kernel runs, so
  // cos = dot / (cnorm · vnorm) is bit-identical to CosineSimilarity
  @transient private lazy val cnorms: Array[Double] = cents.map { c =>
    val v = c._2
    var na = 0.0
    var i = 0
    while (i < v.length) { na += v(i) * v(i); i += 1 }
    math.sqrt(na)
  }

  override def nullSafeEval(a: Any): Any = {
    if (cents.isEmpty) return null
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val xs = new Array[Double](n)
    var nb = 0.0
    var i = 0
    while (i < n) {
      val v = x.getDouble(i); xs(i) = v; nb += v * v; i += 1
    }
    val vnorm = math.sqrt(nb)
    var bestId = cents(0)._1
    var best = java.lang.Double.NEGATIVE_INFINITY
    var first = true
    var k = 0
    while (k < cents.length) {
      val cv = cents(k)._2
      val m = math.min(n, cv.length)
      var dot = 0.0
      var j = 0
      while (j < m) { dot += cv(j) * xs(j); j += 1 }
      val cos = dot / (cnorms(k) * vnorm)
      val rounded = math.floor(cos * 1e6 + 0.5) / 1e6
      // strict >: ascending-id iteration keeps the LOWEST id on ties;
      // Double.compare puts NaN above +inf (the Spark/DuckDB ordering)
      if (first || java.lang.Double.compare(rounded, best) > 0) {
        best = rounded; bestId = cents(k)._1; first = false
      }
      k += 1
    }
    bestId
  }
}

object NearestCentroid {
  /** registry-free `Column` form (the [[CosineSimilarity]] companion's
    * pattern). `cents` must be sorted ascending by centroid id — the
    * tie-break contract rides the iteration order.
    */
  def apply(cents: Array[(Long, Array[Double])],
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    require(cents.sliding(2).forall(w => w.length < 2 || w(0)._1 < w(1)._1),
      "nearest_centroid needs centroids sorted ascending by id")
    import org.apache.spark.sql.graftbridge.NativeColumn
    NativeColumn(NearestCentroid(cents, NativeColumn.expressionOf(v)))
  }
}
