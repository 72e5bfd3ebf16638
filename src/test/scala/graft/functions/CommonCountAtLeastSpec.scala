package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class CommonCountAtLeastSpec extends SparkSpec {

  private def shingled = Tables.documents(spark, "/root/testdata/sf0.001")
    .withColumn("sh", Shingles(col("text")))
    .select("doc_id", "sh")

  test("equals size(array_intersect) whenever that count reaches the threshold; -1 strictly below it — codegen and interpreted") {
    // real shingle sets (distinct by construction — the expression's
    // documented set contract), swept over thresholds that exercise
    // both the pass and the bail path, under both execution modes
    val pairs = shingled.as("a").join(shingled.as("b"),
      col("a.doc_id") < col("b.doc_id") && col("a.doc_id") < 40 && col("b.doc_id") < 40)
    Seq("true", "false").foreach { wholeStage =>
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
      try {
        Seq(0, 1, 5, 50).foreach { minReq =>
          val diff = pairs
            .withColumn("exact", size(array_intersect(col("a.sh"), col("b.sh"))))
            .withColumn("native", expr(
              s"common_count_at_least(a.sh, b.sh, $minReq)"))
            .filter(!(col("native") <=>
              when(col("exact") >= minReq, col("exact")).otherwise(-1)))
          assert(diff.isEmpty, s"wholeStage=$wholeStage minReq=$minReq")
        }
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("threshold edge cases: empty arrays, nulls, non-positive threshold") {
    val r = spark.sql(
      """SELECT common_count_at_least(array('a','b','c'), array('b','c','d'), 2) hit,
        |       common_count_at_least(array('a','b','c'), array('b','c','d'), 3) miss,
        |       common_count_at_least(cast(array() as array<string>), array('x'), 0) empt,
        |       common_count_at_least(array('x'), array('x'), -5) neg,
        |       common_count_at_least(array('x'), cast(null as array<string>), 1) n
        |""".stripMargin).head()
    assert(r.getInt(0) == 2)   // reaches 2 → exact count
    assert(r.getInt(1) == -1)  // can't reach 3 → bail
    assert(r.getInt(2) == 0)   // unbailable plain count
    assert(r.getInt(3) == 1)   // negative threshold = plain count
    assert(r.isNullAt(4))      // null propagates
  }

  // the end-to-end soundness pin (early-exit verify ≡ count-everything
  // engine at the rounded threshold) lives in DedupSaltSpec, which has
  // package access to the private[queries] engines.
}
