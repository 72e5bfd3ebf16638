package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel behind the native `simhash(text, bits)` expression.
  *
  * Why native: the SQL formulation of SimHash (Charikar 2002; Manku et
  * al. 2007 — the construction in `DedupQueries.simhash`, reference
  * behavior cited there) is structurally a per-doc reduction, but
  * expressed relationally it costs an `array_distinct` + explode to
  * (doc, word), a `transform(sequence(0, bits-1))` HOF + posexplode to
  * (doc, j) — bits× the word volume — and TWO shuffled aggregations
  * ((doc, j) vote sums, then (doc) bit packing). The hash of a document
  * never needs to leave its row: this kernel folds distinct words →
  * md5 bit votes → sign → packed long in one fused pass invoked from
  * whole-stage codegen, so the SimHash build stage of x3/x31 becomes a
  * narrow projection with NO shuffle and NO row multiplication — the
  * shape that survives a 100 TB corpus.
  *
  * Numerics contract (oracle-pinned): bit j of md5(w) is read MSB-first
  * from the digest (identical to bit `3 − j%4` of hex digit `j/4 + 1`
  * in the SQL/DuckDB twins); vote sum ≥ 0 → bit 1; bit j lands at
  * position `bits−1−j`. `SimHashParitySpec` pins bit-equality against
  * the explode/HOF formulation on real testdata in both codegen and
  * interpreted modes, and the x3/x31 DuckDB oracles pin it cross-engine.
  */
object SimHashOps {
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** `bits`-wide SimHash over the DISTINCT word set of `text` (split on
    * single spaces, trailing empties kept — exactly Spark's two-arg
    * `split`). Each distinct word votes once per bit position: +1 when
    * the corresponding md5 digest bit is 1, −1 otherwise.
    */
  def simhash(text: UTF8String, bits: Int): Long = {
    val words = text.toString.split(" ", -1)
    val seen = new java.util.HashSet[String](words.length * 2)
    val votes = new Array[Int](bits)
    val d = digest.get()
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (seen.add(w)) {
        d.reset()
        val h = d.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var j = 0
        while (j < bits) {
          if (((h(j >> 3) >> (7 - (j & 7))) & 1) == 1) votes(j) += 1
          else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var v = 0L
    var j = 0
    while (j < bits) {
      v = (v << 1) | (if (votes(j) >= 0) 1L else 0L)
      j += 1
    }
    v
  }
}

/** `simhash(text)` at a fixed width: per-doc SimHash as a narrow
  * codegen'd projection — the native twin of the explode/vote-sum
  * chain in `DedupQueries.simhash`. `bits` ≤ 63 so the packed hash
  * stays a positive BIGINT in both engines (the x31 rationale).
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
  require(bits > 0 && bits <= 63, s"simhash bits must be in 1..63, got $bits")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    SimHashOps.simhash(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashOps.simhash($c, $bits)")
}

object SimHash {
  val info: ExpressionInfo = new ExpressionInfo(classOf[SimHash].getName, "simhash")
  def apply(text: org.apache.spark.sql.Column, bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.NativeColumn
    NativeColumn(SimHash(NativeColumn.expressionOf(text), bits))
  }
}
