package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class JaccardSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def shingled = Tables.documents(spark, "/root/testdata/sf0.001")
    .withColumn("w", split(col("text"), " "))
    .withColumn("sh", array_distinct(expr(
      "transform(sequence(0, greatest(size(w) - 2, 0)), i -> concat_ws(' ', w[i], w[i+1]))")))
    .select("doc_id", "sh")

  private val arrayFormSql =
    """cast(size(array_intersect(a.sh, b.sh)) as double)
      | / (size(a.sh) + size(b.sh) - size(array_intersect(a.sh, b.sh)))""".stripMargin

  test("native expression equals the array_intersect form, codegen and interpreted") {
    val pairs = shingled.as("a").join(shingled.as("b"),
      col("a.doc_id") < col("b.doc_id") && col("a.doc_id") < 40 && col("b.doc_id") < 40)
    Seq("true", "false").foreach { wholeStage =>
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
      try {
        val diff = pairs
          .withColumn("native", expr("jaccard_similarity(a.sh, b.sh)"))
          .withColumn("arr", expr(arrayFormSql))
          .filter(!(col("native") <=> col("arr")))
        assert(diff.isEmpty, s"wholeStage=$wholeStage")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("set semantics: duplicates in the input arrays don't change the result") {
    val r = spark.sql(
      """SELECT jaccard_similarity(array('a','a','b'), array('b','b','c')) j""").head().getDouble(0)
    assert(r == 1.0 / 3.0) // {a,b} vs {b,c}: inter 1, union 3
  }

  test("empty arrays yield null; identical sets yield 1.0; null propagates") {
    val rows = spark.sql(
      """SELECT jaccard_similarity(cast(array() as array<string>), cast(array() as array<string>)) e,
        |       jaccard_similarity(array('x','y'), array('y','x')) s,
        |       jaccard_similarity(array('x'), cast(null as array<string>)) n""".stripMargin).head()
    assert(rows.isNullAt(0))
    assert(rows.getDouble(1) == 1.0)
    assert(rows.isNullAt(2))
  }
}
