package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the native shingling/MinHash expressions.
  *
  * Why native: the SQL formulations are higher-order-function chains
  * (`transform(sequence(...))`, `aggregate(...)`) that evaluate one
  * interpreted lambda call per element — measured ~20µs per shingle for
  * the md5-fold alone, which makes shingle hashing the hot scalar stage
  * of every dedup/sketch query. These kernels do the identical math in
  * one fused pass per row and are invoked from whole-stage codegen via
  * static forwarders, so the surrounding operators stay in one codegen
  * span.
  *
  * Numerics contract (oracle-pinned): every value is BIT-IDENTICAL to
  * the SQL twins in [[MinHashFamily]] and to the DuckDB oracle CTEs —
  * `NativeShingleParitySpec` compares element-by-element against the HOF
  * formulations on real testdata plus adversarial edge rows.
  */
object ShingleOps {
  val P: Long = MinHashFamily.P
  val H: Int = MinHashFamily.H

  private val A: Array[Long] = Array.tabulate(H)(MinHashFamily.a)
  private val B: Array[Long] = Array.tabulate(H)(MinHashFamily.b)

  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** fold of the first 12 md5 hex digits mod P. The hex fold
    * `Σ digit_i · 16^(11−i)` IS the first 6 digest bytes read as a
    * big-endian 48-bit integer — same number, no hex string needed.
    */
  def md5Base(bytes: Array[Byte]): Long = {
    val d = digest.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v % P
  }

  /** distinct adjacent word-bigrams in first-occurrence order — exactly
    * `array_distinct(transform(sequence(0, size(w)-2), i ->
    * concat_ws(' ', w[i], w[i+1])))` over `w = split(text, ' ')` with
    * the <2-words empty-array guard.
    */
  def shingles(text: UTF8String): ArrayData = {
    val w = text.toString.split(" ", -1)
    if (w.length < 2) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String](w.length * 2)
      var i = 0
      while (i < w.length - 1) { seen.add(w(i) + " " + w(i + 1)); i += 1 }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
  }

  /** per-element md5 base — exactly
    * [[MinHashFamily.basesFromShinglesExprSql]]. */
  def bases(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = md5Base(arr.getUTF8String(i).getBytes); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** H-wide MinHash signature (min over the universal-hash family per
    * position) in ONE pass over the bases — exactly the H separate
    * `array_min(transform(bases, x -> (a_i·x + b_i) % P))` columns.
    * Returns null for an empty base set (array_min of empty is null;
    * null signatures fall out of band equi-joins downstream).
    */
  def minhashSignature(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val out = new Array[Long](H)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var k = 0
      while (k < H) {
        val h = (A(k) * x + B(k)) % P
        if (h < out(k)) out(k) = h
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `shingles(text)`: distinct word-bigram shingles, native twin of the
  * HOF chain in [[graft.corpus.Corpus.withShingles]]. */
case class Shingles(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    ShingleOps.shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.shingles($c)")
}

object Shingles {
  val info: ExpressionInfo = new ExpressionInfo(classOf[Shingles].getName, "shingles")
  def apply(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.NativeColumn
    NativeColumn(Shingles(NativeColumn.expressionOf(text)))
  }
}

/** `minhash_bases(arr)`: md5-derived 48-bit base per element, native twin
  * of [[MinHashFamily.basesFromShinglesExprSql]]. */
case class MinHashBases(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bases"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashBases =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    ShingleOps.bases(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.bases($c)")
}

object MinHashBases {
  val info: ExpressionInfo = new ExpressionInfo(classOf[MinHashBases].getName, "minhash_bases")
  def apply(arr: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.NativeColumn
    NativeColumn(MinHashBases(NativeColumn.expressionOf(arr)))
  }
}

/** `minhash_signature(bases)`: the H-wide signature in one pass; null on
  * an empty base set (mirrors array_min's null on empty). */
case class MinHashSignature(child: Expression) extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.simpleString}")
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    ShingleOps.minhashSignature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.ShingleOps.minhashSignature($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
}

object MinHashSignature {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashSignature].getName, "minhash_signature")
  def apply(bases: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.NativeColumn
    NativeColumn(MinHashSignature(NativeColumn.expressionOf(bases)))
  }
}
