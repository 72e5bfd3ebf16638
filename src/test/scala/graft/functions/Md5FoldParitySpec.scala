package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bit-parity pins for the native `md5_fold(str, start, digits)` kernel
  * against the interpreted hex fold it replaced — swept over offsets and
  * widths (including the exact windows the queries use: (1,6) DSIR
  * buckets/sample gates, (1,8)/(9,8) bloom halves, (1,8) split buckets,
  * (1,12) CMS/KMV bases), on real testdata ids/words plus edge strings,
  * in codegen AND interpreted modes. The DuckDB oracles keep the
  * relational fold, so every affected query (y1/y2/y6/y11/z6/z7 + the
  * Corpus split/sample surface) re-proves the kernel cross-engine.
  */
class Md5FoldParitySpec extends SparkSpec {

  private def inputs: DataFrame = {
    import spark.implicits._
    val edges = Seq("", " ", "0", "é漢字", "a b c", "-1", "9999999999")
    graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").cast("string").as("s"))
      .unionByName(edges.toDF("s"))
  }

  private def sqlFold(start: Int, digits: Int): org.apache.spark.sql.Column =
    expr(s"""aggregate(transform(sequence($start, ${start + digits - 1}),
            |  i -> instr('0123456789abcdef', substring(md5(s), i, 1)) - 1),
            |  cast(0 as bigint), (b, c) -> b * 16 + c)""".stripMargin)

  test("native md5_fold == interpreted hex fold across windows, codegen and interpreted") {
    val windows = Seq((1, 6), (1, 8), (9, 8), (1, 12), (3, 5), (18, 15), (32, 1))
    for (wholeStage <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
      try {
        windows.foreach { case (start, digits) =>
          val diff = inputs
            .withColumn("f_sql", sqlFold(start, digits))
            .withColumn("f_native", Md5Fold(col("s"), start, digits))
            .filter(col("f_sql") =!= col("f_native"))
            .collect()
          assert(diff.isEmpty,
            s"md5_fold divergence at ($start, $digits) codegen=$wholeStage: ${diff.take(3).mkString("; ")}")
        }
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("md5_fold is registered for SQL; window contract enforced") {
    import spark.implicits._
    val v = Seq("abc").toDF("s").selectExpr("md5_fold(s, 1, 8) AS f").head.getLong(0)
    assert(v >= 0L && v < (1L << 32))
    val err = intercept[Exception] {
      Seq("abc").toDF("s").selectExpr("md5_fold(s, 30, 8)").collect()
    }
    assert(err.getMessage.contains("32"),
      s"expected the digest-window contract, got: ${err.getMessage}")
    val err2 = intercept[Exception] {
      Seq("abc").toDF("s").selectExpr("md5_fold(s, 1, 17)").collect()
    }
    assert(err2.getMessage.contains("16"),
      s"expected the digits<=16 contract, got: ${err2.getMessage}")
  }

  test("raw 16-digit fold bit-slices to the two 8-digit window folds (z6's halves)") {
    val diff = inputs
      .withColumn("f16", Md5Fold(col("s"), 1, 16))
      .withColumn("hi", shiftrightunsigned(col("f16"), 32))
      .withColumn("lo", col("f16").bitwiseAND(lit(0xFFFFFFFFL)))
      .filter(col("hi") =!= Md5Fold(col("s"), 1, 8) ||
        col("lo") =!= Md5Fold(col("s"), 9, 8))
      .collect()
    assert(diff.isEmpty, s"bit-slice divergence: ${diff.take(3).mkString("; ")}")
  }
}
