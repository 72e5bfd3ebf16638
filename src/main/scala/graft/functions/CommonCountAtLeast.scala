package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen common-element COUNT over two `array<string>` SETS,
  * with a reach-threshold early exit: returns |A∩B| when it is ≥
  * `minRequired`, and −1 as soon as the remaining scan provably cannot
  * reach it.
  *
  * The dedup verify stage funnels millions of prefix-filtered candidate
  * pairs down to a few hundred survivors (sf0.1: x20 2.31M → 831, x4
  * 1.47M → 79 — ≥ 99.96% of pairs FAIL the threshold), and
  * `size(array_intersect(a, b))` pays for each of them: a hash set
  * build, a full scan, and a materialized intersection array that is
  * immediately reduced to its length. This expression is the
  * count-only twin (no result array, one fused loop in whole-stage
  * codegen, hash set built from the SMALLER side — containment pairs
  * are size-asymmetric by nature) plus the f20-banded-levenshtein idea
  * applied to set overlap: while scanning side s, once
  * `matched + remaining(s) < minRequired` no suffix of the scan can
  * reach the threshold, so the loop bails with −1. Callers filter on
  * the exact score afterwards; −1 yields a negative score that fails
  * any positive threshold, and for every SURVIVING row the returned
  * count is exact, so query output is unchanged (oracle + the
  * lossless-vs-unpruned pins in DedupSaltSpec are the proof).
  *
  * CONTRACT: both arrays are treated as SETS — a duplicated element in
  * the scanned side would be counted once per occurrence (the per-side
  * dedup set that `array_intersect` maintains is deliberately dropped;
  * it costs a second hash structure per pair). Every caller passes
  * `array_distinct`-built shingle sets (Corpus.withShingles), and the
  * parity spec pins equality against `size(array_intersect)` on exactly
  * such inputs. Pass `minRequired ≤ 0` for a plain unbailable count.
  */
case class CommonCountAtLeast(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable
  override def dataType: DataType = IntegerType
  override def prettyName: String = "common_count_at_least"

  override def checkInputDataTypes(): TypeCheckResult = {
    val arraysOk = Seq(first, second).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (arraysOk && third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<string>, array<string>, int), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CommonCountAtLeast =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def nullSafeEval(a: Any, b: Any, m: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val minReq = m.asInstanceOf[Int]
    val (small, big) =
      if (x.numElements() <= y.numElements()) (x, y) else (y, x)
    val n = big.numElements()
    if (small.numElements() < minReq || n < minReq) return -1
    val set = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < small.numElements()) { set.add(small.getUTF8String(i)); i += 1 }
    var matched = 0
    var j = 0
    while (j < n) {
      if (matched + (n - j) < minReq) return -1
      if (set.contains(big.getUTF8String(j))) matched += 1
      j += 1
    }
    if (matched < minReq) -1 else matched
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, m) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val set = ctx.freshName("set")
      val small = ctx.freshName("small")
      val big = ctx.freshName("big")
      val n = ctx.freshName("n")
      val matched = ctx.freshName("matched")
      val bailed = ctx.freshName("bailed")
      val u8 = classOf[UTF8String].getName
      val ad = classOf[ArrayData].getName
      s"""
         |$ad $small = $a.numElements() <= $b.numElements() ? $a : $b;
         |$ad $big = $a.numElements() <= $b.numElements() ? $b : $a;
         |int $n = $big.numElements();
         |boolean $bailed = $small.numElements() < $m || $n < $m;
         |int $matched = 0;
         |if (!$bailed) {
         |  java.util.HashSet<$u8> $set = new java.util.HashSet<$u8>();
         |  for (int $i = 0; $i < $small.numElements(); $i++)
         |    $set.add($small.getUTF8String($i));
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($matched + ($n - $j) < $m) { $bailed = true; break; }
         |    if ($set.contains($big.getUTF8String($j))) $matched++;
         |  }
         |}
         |${ev.value} = ($bailed || $matched < $m) ? -1 : $matched;
       """.stripMargin
    })
}

object CommonCountAtLeast {
  // usage/extended surface through DESCRIBE FUNCTION — the SET-input
  // precondition must be visible to external SQL users, not only in the
  // scaladoc internal callers read (ADVICE r8)
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CommonCountAtLeast].getName, null, "common_count_at_least",
    "common_count_at_least(a, b, min_required) - Returns the number of " +
      "common elements of the two array<string> inputs when it is >= " +
      "min_required, and -1 as soon as the remaining scan provably " +
      "cannot reach min_required (pass min_required <= 0 for a plain " +
      "count).",
    "PRECONDITION: both arrays must be DISTINCT-element sets (e.g. " +
      "built with array_distinct). A duplicated element on the scanned " +
      "(larger) side is counted once per occurrence, so on multiset " +
      "inputs the result diverges from size(array_intersect(a, b)) and " +
      "can depend on which input is larger. NULL if any input is NULL.")

  /** registry-free `Column` form (see [[JaccardSimilarity.apply]]). */
  def apply(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      minRequired: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.NativeColumn
    NativeColumn(CommonCountAtLeast(NativeColumn.expressionOf(a),
      NativeColumn.expressionOf(b), NativeColumn.expressionOf(minRequired)))
  }
}
