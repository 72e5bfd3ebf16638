package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bit-parity pins for the native shingling/MinHash expressions against
  * the HOF SQL formulations they replaced (r7). The SQL chains remain in
  * [[MinHashFamily]] / here precisely so this spec can prove the native
  * kernels compute the identical values — on the real testdata AND on
  * adversarial edge rows (empty text, one word, consecutive/leading/
  * trailing spaces producing empty "words", duplicate bigrams, non-ASCII
  * multi-byte text).
  */
class NativeShingleParitySpec extends SparkSpec {

  private def edgeDocs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, ""),
      (2L, "one"),
      (3L, "a b"),
      (4L, "a  b"),           // double space → empty middle word
      (5L, " leading space"),
      (6L, "trailing space "),
      (7L, "a b a b a"),      // duplicate bigrams, order matters
      (8L, "é ü ñ 漢字 b"),    // multi-byte UTF-8 through md5
      (9L, "x y z w v u t s r q p"),
      (10L, "  ")             // only empty words
    ).toDF("doc_id", "text")
  }

  private def withSqlShingles(df: DataFrame): DataFrame =
    df.withColumn("w", split(col("text"), " "))
      .withColumn("sh_sql", when(size(col("w")) < 2, array().cast("array<string>"))
        .otherwise(array_distinct(expr(
          "transform(sequence(0, size(w)-2), i -> concat_ws(' ', w[i], w[i+1]))"))))

  private def docsUnion: DataFrame =
    graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").unionByName(edgeDocs)

  test("native Shingles == HOF chain, element order included, testdata + edges") {
    val got = withSqlShingles(docsUnion)
      .withColumn("sh_native", Shingles(col("text")))
      .filter(not(col("sh_sql") <=> col("sh_native")))
      .select("doc_id", "text", "sh_sql", "sh_native")
      .collect()
    assert(got.isEmpty, s"shingle divergence: ${got.take(3).mkString("; ")}")
  }

  test("native MinHashBases == SQL md5 hex fold, testdata + edges") {
    val got = withSqlShingles(docsUnion)
      .withColumn("b_sql",
        expr(MinHashFamily.basesFromShinglesExprSql("sh_sql")))
      .withColumn("b_native", MinHashBases(col("sh_sql")))
      .filter(not(col("b_sql") <=> col("b_native")))
      .collect()
    assert(got.isEmpty, s"base divergence: ${got.take(3).mkString("; ")}")
  }

  test("native MinHashSignature == H array_min(transform(...)) columns, null on empty") {
    val withBases = withSqlShingles(docsUnion)
      .withColumn("bases", MinHashBases(col("sh_sql")))
    val sqlMins = (0 until MinHashFamily.H).map(i =>
      expr(s"array_min(transform(bases, x -> (${MinHashFamily.a(i)} * x + " +
        s"${MinHashFamily.b(i)}) % ${MinHashFamily.P}))").as(s"sql_mh$i"))
    val got = withBases
      .withColumn("sig", MinHashSignature(col("bases")))
      .select(col("doc_id") +: col("sig") +: sqlMins: _*)
      .collect()
    got.foreach { r =>
      val sig = Option(r.getSeq[Long](1))
      (0 until MinHashFamily.H).foreach { i =>
        val sqlV = if (r.isNullAt(2 + i)) None else Some(r.getLong(2 + i))
        val natV = sig.map(_(i))
        assert(sqlV == natV,
          s"doc ${r.getLong(0)} mh$i: sql=$sqlV native=$natV")
      }
    }
    assert(got.exists(_.isNullAt(1)), "no empty-shingle row exercised the null path")
  }

  test("JVM streaming-side base() matches the native column kernel") {
    // MinHashFamily.base feeds the streaming sketch updater; it must stay
    // digit-for-digit equal to the batch column path.
    import spark.implicits._
    val shingleStrings = Seq("a b", "é ü", "x 漢字", "num 42", "")
    val fromCol = shingleStrings.toDF("t")
      .select(MinHashBases(array(col("t"))).as("b"))
      .as[Seq[Long]].collect().map(_.head)
    val fromJvm = shingleStrings.map(MinHashFamily.base)
    assert(fromCol.toSeq == fromJvm)
  }

  test("SQL registry surface: shingles/minhash_bases/minhash_signature callable via expr") {
    val n = docsUnion
      .withColumn("sig", expr("minhash_signature(minhash_bases(shingles(text)))"))
      .filter(col("sig").isNotNull).count()
    assert(n > 0)
  }
}
