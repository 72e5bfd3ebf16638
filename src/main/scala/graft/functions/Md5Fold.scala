package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel behind the native `md5_fold(str, start, digits)` scalar.
  *
  * The repo's content-addressed machinery (split/sample gates, bloom
  * positions, CMS bases, DSIR buckets) is built on ONE primitive: fold
  * hex digits [start, start+digits) of md5(str) big-endian into a
  * BIGINT — `Σ digit_i · 16^(digits−1−i)`, i.e. bits
  * [(start−1)·4, (start−1+digits)·4) of the digest read MSB-first. The
  * SQL formulation (`aggregate(transform(sequence(start, start+digits−1),
  * i -> instr('0123456789abcdef', substring(md5(s), i, 1)) - 1), ...)`)
  * pays an interpreted lambda per hex digit plus the 32-char hex-string
  * materialization — ~20µs per value (the r7 shingle-native
  * measurement), which is the hot scalar stage wherever the fold runs
  * per token/event rather than per doc. This kernel reads the digest
  * nibbles directly in one fused pass, invoked from whole-stage codegen.
  *
  * Numerics contract (oracle-pinned): BIT-IDENTICAL to the SQL twin for
  * every (start, digits) in range — `Md5FoldParitySpec` sweeps offsets
  * and widths against the HOF formulation; every DuckDB oracle keeps
  * the relational form, so each affected query re-proves the kernel
  * cross-engine. Callers keep their own `% modulus` on top, exactly as
  * the SQL did.
  */
object Md5FoldOps {
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** fold of hex digits [start, start+digits) (1-based) of md5(s). */
  def md5Fold(s: UTF8String, start: Int, digits: Int): Long = {
    val d = digest.get()
    d.reset()
    val h = d.digest(s.getBytes)
    var v = 0L
    var i = start - 1
    val end = start - 1 + digits
    while (i < end) {
      val b = h(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }
}

/** `md5_fold(str)` over a fixed hex-digit window: the content-addressed
  * hash fold as one codegen'd scalar. `digits` ≤ 15 keeps the fold a
  * positive BIGINT; `digits` = 16 is allowed as a RAW 64-bit read (may
  * be negative — intended for bit-slicing two 32-bit windows out of one
  * digest, z6's bloom positions). `start+digits−1` ≤ 32 stays inside
  * the md5 digest.
  */
case class Md5Fold(child: Expression, start: Int, digits: Int)
    extends UnaryExpression {
  require(start >= 1 && digits >= 1 && digits <= 16 && start + digits - 1 <= 32,
    s"md5_fold window must satisfy 1 <= start, 1 <= digits <= 16, " +
      s"start+digits-1 <= 32; got (start=$start, digits=$digits)")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_fold"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override protected def withNewChildInternal(newChild: Expression): Md5Fold =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    Md5FoldOps.md5Fold(input.asInstanceOf[UTF8String], start, digits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5FoldOps.md5Fold($c, $start, $digits)")
}

object Md5Fold {
  val info: ExpressionInfo = new ExpressionInfo(classOf[Md5Fold].getName, "md5_fold")
  def apply(str: org.apache.spark.sql.Column, start: Int, digits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.NativeColumn
    NativeColumn(Md5Fold(NativeColumn.expressionOf(str), start, digits))
  }
}
