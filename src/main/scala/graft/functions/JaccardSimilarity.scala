package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen Jaccard set similarity over two `array<string>` columns:
  * |A∩B| / |A∪B| over the DISTINCT elements of each side.
  *
  * Replaces the `array_intersect` + two `size` calls of the dedup verify
  * stage (three array passes, one materialized intermediate array) with a
  * single fused hash-set loop in whole-stage codegen — the hot inner op
  * of the LSH verify (SURVEY §7.3: custom Catalyst work is reserved for
  * exactly this).
  *
  * Numerics contract: intersection and union are exact ints; the result
  * is one double division — identical to the
  * `size(array_intersect(a,b)) / (size(a)+size(b)-common)` formulation on
  * distinct inputs and to the DuckDB oracle's list arithmetic. Both sides
  * empty → null (matching Spark's null-on-÷0 non-ANSI division).
  */
case class JaccardSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // empty∪empty → null
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_similarity"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<string>, array<string>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimilarity =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xs = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < x.numElements()) { xs.add(x.getUTF8String(i)); i += 1 }
    val ys = new java.util.HashSet[UTF8String]()
    var inter = 0
    var j = 0
    while (j < y.numElements()) {
      val v = y.getUTF8String(j)
      if (ys.add(v) && xs.contains(v)) inter += 1
      j += 1
    }
    val union = xs.size + ys.size - inter
    if (union == 0) null else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val v = ctx.freshName("v")
      val inter = ctx.freshName("inter")
      val union = ctx.freshName("union")
      val u8 = classOf[UTF8String].getName
      s"""
         |java.util.HashSet<$u8> $xs = new java.util.HashSet<$u8>();
         |for (int $i = 0; $i < $a.numElements(); $i++) $xs.add($a.getUTF8String($i));
         |java.util.HashSet<$u8> $ys = new java.util.HashSet<$u8>();
         |int $inter = 0;
         |for (int $j = 0; $j < $b.numElements(); $j++) {
         |  $u8 $v = $b.getUTF8String($j);
         |  if ($ys.add($v) && $xs.contains($v)) $inter++;
         |}
         |int $union = $xs.size() + $ys.size() - $inter;
         |if ($union == 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = (double) $inter / $union; }
       """.stripMargin
    })
}

object JaccardSimilarity {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[JaccardSimilarity].getName, "jaccard_similarity")

  /** registry-free `Column` form: usable on a vanilla SparkSession (no
    * `spark.sql.extensions=graft.GraftExtensions` required), unlike
    * `expr("jaccard_similarity(...)")` which needs the SQL registry.
    */
  def apply(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.NativeColumn
    NativeColumn(JaccardSimilarity(NativeColumn.expressionOf(a), NativeColumn.expressionOf(b)))
  }
}
