package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class RollingHashWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), col("text"))

  /** per-window Horner fold — the O(n·W) reference the rolling update
    * must equal exactly (same chain as t4's whole-text roll_hash).
    */
  private def hofWindows(w: Int) =
    s"""transform(sequence(1, greatest(length(text) - ${w - 1}, 0)),
       |  i -> aggregate(transform(sequence(i, i + ${w - 1}),
       |         j -> cast(ascii(substring(text, j, 1)) as bigint)),
       |       cast(0 as bigint), (acc, c) -> (acc * 31 + c) % 1000000007))""".stripMargin

  test("rolling update is bit-identical to the per-window Horner fold, codegen and interpreted") {
    Seq("true", "false").foreach { wholeStage =>
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
      try {
        val diff = docs
          .withColumn("native", expr("rolling_hash_windows(text, 32)"))
          .withColumn("hof", expr(hofWindows(32)))
          .filter(col("native") =!= col("hof"))
        assert(diff.isEmpty, s"wholeStage=$wholeStage")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("short and empty texts yield empty arrays; null yields null") {
    val df = Seq((1L, "abc"), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "exactly-8")).toDF("id", "text")
    val r = df.select(col("id"), expr("rolling_hash_windows(text, 9)").as("h"))
      .orderBy("id").collect()
    assert(r(0).getSeq[Long](1).isEmpty)
    assert(r(1).getSeq[Long](1).isEmpty)
    assert(r(2).isNullAt(1))
    assert(r(3).getSeq[Long](1).length == 1) // length 9 text, one window
  }

  test("window count and determinism on real text") {
    val r = docs.limit(50)
      .select(length(col("text")).as("n"),
        size(expr("rolling_hash_windows(text, 32)")).as("k"))
      .collect()
    r.foreach { row =>
      val (n, k) = (row.getInt(0), row.getInt(1))
      assert(k == math.max(n - 31, 0), s"n=$n k=$k")
    }
  }

  test("sql registration and the registry-free Column form agree") {
    val viaSql = docs.limit(20).select(expr("rolling_hash_windows(text, 16)").as("h"))
    val viaCol = docs.limit(20).select(RollingHashWindows(col("text"), 16).as("h"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }
}
