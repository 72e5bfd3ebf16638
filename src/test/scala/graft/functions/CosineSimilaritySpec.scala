package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))

  private val hofCosine =
    """aggregate(zip_with(a.v, b.v, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)
      | / (sqrt(aggregate(transform(a.v, x -> x * x), cast(0 as double), (acc, x) -> acc + x))
      |    * sqrt(aggregate(transform(b.v, x -> x * x), cast(0 as double), (acc, x) -> acc + x)))"""
      .stripMargin

  test("native expression is bit-identical to the HOF fold, codegen and interpreted") {
    val pairs = vecs.as("a").join(vecs.as("b"),
      col("a.vec_id") < col("b.vec_id") && col("a.vec_id") < 30 && col("b.vec_id") < 30)
    Seq("true", "false").foreach { wholeStage =>
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
      try {
        val diff = pairs
          .withColumn("native", expr("cosine_similarity(a.v, b.v)"))
          .withColumn("hof", expr(hofCosine))
          .filter(col("native") =!= col("hof")) // bitwise: any ulp difference fails
        assert(diff.isEmpty, s"wholeStage=$wholeStage")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("null array yields null, self-similarity is 1.0") {
    val one = vecs.filter(col("vec_id") === 0)
    assert(math.abs(one.select(expr("cosine_similarity(v, v)")).head().getDouble(0) - 1.0) < 1e-12)
    val n = one.select(expr("cosine_similarity(v, cast(null as array<double>))")).head()
    assert(n.isNullAt(0))
  }

  test("sql registration is visible via spark.sql") {
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0.0d), array(0.0d, 1.0d)) c").head().getDouble(0)
    assert(r == 0.0)
    val r2 = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 2.0d), array(2.0d, 4.0d)) c").head().getDouble(0)
    assert(math.abs(r2 - 1.0) < 1e-12)
  }
}
