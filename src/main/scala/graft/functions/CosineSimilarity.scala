package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen cosine similarity over two `array<double>` columns.
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function pipeline
  * (interpreted lambdas, per-row closure dispatch) with one fused loop in
  * whole-stage codegen — the hot inner op of the ANN/near-dup queries
  * (SURVEY §7.3: custom Catalyst work is reserved for exactly this).
  *
  * Numerics contract: sequential left-to-right double accumulation for
  * dot and both norms, result = dot / (√na · √nb) — bit-identical to the
  * HOF formulation and to the DuckDB oracle's list_reduce folds, so
  * oracle hash-matching is preserved.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  // Spark 4 dropped the NullIntolerant marker trait for this flag
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  // ExpectsInputTypes is private[sql] in Spark 4, so type-check manually;
  // callers cast float embeddings to array<double> (exact widening) first.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
}

object CosineSimilarity {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getName, "cosine_similarity")

  /** registry-free `Column` form: usable on a vanilla SparkSession (no
    * `spark.sql.extensions=graft.GraftExtensions` required), unlike
    * `expr("cosine_similarity(...)")` which needs the SQL registry.
    */
  def apply(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.NativeColumn
    NativeColumn(CosineSimilarity(NativeColumn.expressionOf(a), NativeColumn.expressionOf(b)))
  }
}
