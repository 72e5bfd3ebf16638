package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen rolling-hash windows: every length-`width` character
  * window of `child` hashed with the polynomial rolling hash
  * `h = (h·31 + c) mod 1_000_000_007` (the t4 fingerprint chain, applied
  * per window). Returns `array<long>` of the `n − width + 1` window
  * hashes (empty when the text is shorter than the window).
  *
  * The point of going native: the HOF formulation
  * (`transform(sequence(...), i -> aggregate(...))`) is O(n·W) char
  * loads per row and materializes a lambda-boxed struct per window; this
  * expression keeps the true O(n) rolling update — drop the leading
  * char's `c·31^{W−1}` term, shift, add the trailing char — in one fused
  * whole-stage-codegen loop writing a primitive long array. At corpus
  * scale the window stream feeds the exact substring-dedup pass (t14),
  * where it is the per-row hot loop.
  *
  * Numerics contract: chars are ASCII-range code units read identically
  * by both engines (`ascii(substr(...))` in DuckDB); all arithmetic is
  * exact long mod-arithmetic — no floats anywhere — so window hashes are
  * bit-identical across engines, micro-batching, and row order. The
  * rolling subtraction re-normalizes with `((x mod P) + P) mod P`, which
  * equals the per-window Horner fold exactly.
  */
case class RollingHashWindows(child: Expression, width: Int)
  extends UnaryExpression {

  require(width >= 1, s"rolling_hash_windows width must be >= 1, got $width")

  private val P = 1000000007L

  /** 31^(width−1) mod P — the leading-char weight, precomputed once. */
  private val powW: Long = {
    var p = 1L
    var i = 1
    while (i < width) { p = p * 31 % P; i += 1 }
    p
  }

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hash_windows"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashWindows =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < width) UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    else {
      val out = new Array[Long](n - width + 1)
      var h = 0L
      var j = 0
      while (j < width) { h = (h * 31 + s.charAt(j)) % P; j += 1 }
      out(0) = h
      var i = 1
      while (i <= n - width) {
        h = ((h - s.charAt(i - 1) * powW) % P + P) % P
        h = (h * 31 + s.charAt(i + width - 1)) % P
        out(i) = h
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val uad = classOf[UnsafeArrayData].getName
      s"""
         |String $s = $c.toString();
         |int $n = $s.length();
         |if ($n < $width) {
         |  ${ev.value} = $uad.fromPrimitiveArray(new long[0]);
         |} else {
         |  long[] $out = new long[$n - $width + 1];
         |  long $h = 0L;
         |  for (int $j = 0; $j < $width; $j++) $h = ($h * 31 + $s.charAt($j)) % ${P}L;
         |  $out[0] = $h;
         |  for (int $i = 1; $i <= $n - $width; $i++) {
         |    $h = (($h - $s.charAt($i - 1) * ${powW}L) % ${P}L + ${P}L) % ${P}L;
         |    $h = ($h * 31 + $s.charAt($i + $width - 1)) % ${P}L;
         |    $out[$i] = $h;
         |  }
         |  ${ev.value} = $uad.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
}

object RollingHashWindows {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[RollingHashWindows].getName, "rolling_hash_windows")

  /** registry-free `Column` form (see [[JaccardSimilarity.apply]]). */
  def apply(text: org.apache.spark.sql.Column, width: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.NativeColumn
    NativeColumn(RollingHashWindows(NativeColumn.expressionOf(text), width))
  }
}
