package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, JaccardSimilarity, MinHashBases, MinHashSignature, RollingHashWindows, Shingles}

/** Session extension point: registers this library's native Catalyst
  * functions so they're available as SQL (`cosine_similarity(a, b)`,
  * `jaccard_similarity(a, b)`) and through `expr(...)` in every session
  * configured with `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension (SURVEY §7.3 tier c): native top-k-per-key
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      CosineSimilarity.info,
      children => {
        require(children.length == 2,
          s"cosine_similarity expects 2 arguments, got ${children.length}")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("jaccard_similarity"),
      JaccardSimilarity.info,
      children => {
        require(children.length == 2,
          s"jaccard_similarity expects 2 arguments, got ${children.length}")
        JaccardSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("common_count_at_least"),
      graft.functions.CommonCountAtLeast.info,
      children => {
        require(children.length == 3,
          s"common_count_at_least expects 3 arguments, got ${children.length}")
        graft.functions.CommonCountAtLeast(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("two_smallest"),
      graft.functions.TwoSmallest.info,
      children => {
        require(children.length == 1,
          s"two_smallest expects 1 argument, got ${children.length}")
        graft.functions.TwoSmallest(children.head).toAggregateExpression()
      }))
    Seq[(String, ExpressionInfo, Expression => Expression)](
      ("shingles", Shingles.info, Shingles(_)),
      ("minhash_bases", MinHashBases.info, MinHashBases(_)),
      ("minhash_signature", MinHashSignature.info, MinHashSignature(_))
    ).foreach { case (name, info, build) =>
      ext.injectFunction((
        FunctionIdentifier(name), info,
        children => {
          require(children.length == 1,
            s"$name expects 1 argument, got ${children.length}")
          build(children.head)
        }))
    }
    ext.injectFunction((
      FunctionIdentifier("rolling_hash_windows"),
      RollingHashWindows.info,
      children => {
        require(children.length == 2,
          s"rolling_hash_windows expects 2 arguments, got ${children.length}")
        import org.apache.spark.sql.types.{IntegerType, LongType, ShortType, ByteType}
        val width = children(1) match {
          case e if e.foldable &&
              Seq(IntegerType, LongType, ShortType, ByteType).contains(e.dataType) =>
            e.eval() match {
              case null => throw new IllegalArgumentException(
                "rolling_hash_windows width must be a non-null integer literal")
              case n: Number =>
                val v = n.longValue()
                // reject out-of-Int widths instead of silently truncating
                // (a LongType literal like 2^32+32 would intValue() to 32)
                if (v < 1 || v > Int.MaxValue) throw new IllegalArgumentException(
                  s"rolling_hash_windows width must be in [1, ${Int.MaxValue}], got $v")
                v.toInt
            }
          case other => throw new IllegalArgumentException(
            s"rolling_hash_windows width must be an integer literal, got $other")
        }
        RollingHashWindows(children.head, width)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash"),
      graft.functions.SimHash.info,
      children => {
        require(children.length == 2,
          s"simhash expects 2 arguments (text, bits), got ${children.length}")
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
        val bits = children(1) match {
          case e if e.foldable &&
              Seq(IntegerType, LongType, ShortType, ByteType).contains(e.dataType) =>
            e.eval() match {
              case null => throw new IllegalArgumentException(
                "simhash bits must be a non-null integer literal")
              case n: Number =>
                val v = n.longValue()
                // ≤ 63 keeps the packed hash a positive BIGINT (x31 note)
                if (v < 1 || v > 63) throw new IllegalArgumentException(
                  s"simhash bits must be in [1, 63], got $v")
                v.toInt
            }
          case other => throw new IllegalArgumentException(
            s"simhash bits must be an integer literal, got $other")
        }
        graft.functions.SimHash(children.head, bits)
      }))
    ext.injectFunction((
      FunctionIdentifier("md5_fold"),
      graft.functions.Md5Fold.info,
      children => {
        require(children.length == 3,
          s"md5_fold expects 3 arguments (str, start, digits), got ${children.length}")
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
        def intLit(e: Expression, what: String): Int = e match {
          case l if l.foldable &&
              Seq(IntegerType, LongType, ShortType, ByteType).contains(l.dataType) =>
            l.eval() match {
              case null => throw new IllegalArgumentException(
                s"md5_fold $what must be a non-null integer literal")
              case n: Number =>
                val v = n.longValue()
                // bound BEFORE toInt — a LongType literal like 2^32+8
                // would otherwise intValue() to 8 and silently pass
                if (v < 1 || v > 32) throw new IllegalArgumentException(
                  s"md5_fold $what must be in [1, 32], got $v")
                v.toInt
            }
          case other => throw new IllegalArgumentException(
            s"md5_fold $what must be an integer literal, got $other")
        }
        // window bounds re-checked by the case class require
        graft.functions.Md5Fold(children.head,
          intLit(children(1), "start"), intLit(children(2), "digits"))
      }))
  }
}
