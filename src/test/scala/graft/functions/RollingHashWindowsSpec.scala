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
    // the short-text guard matters: sequence(1, 0) is DESCENDING [1, 0]
    // in Spark (default step −1), so an unguarded upper bound of
    // greatest(len − w + 1, 0) would fabricate two bogus windows for
    // texts shorter than w instead of the empty array the native
    // expression correctly returns
    s"""CASE WHEN text IS NULL THEN NULL
       |  WHEN length(text) < $w THEN cast(array() as array<bigint>)
       |  ELSE transform(sequence(1, length(text) - ${w - 1}),
       |    i -> aggregate(transform(sequence(i, i + ${w - 1}),
       |           j -> cast(ascii(substring(text, j, 1)) as bigint)),
       |         cast(0 as bigint), (acc, c) -> (acc * 31 + c) % 1000000007))
       |END""".stripMargin

  test("rolling update is bit-identical to the per-window Horner fold, codegen and interpreted") {
    // corpus docs plus literal shorts so the parity check exercises the
    // sub-width branch too (every sf0.001 doc happens to exceed 31 chars)
    val shorts = Seq((-1L, "tiny"), (-2L, ""), (-3L, "exactly-31-chars-goes-here-yes!"))
      .toDF("doc_id", "text")
    Seq("true", "false").foreach { wholeStage =>
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
      try {
        val diff = docs.unionByName(shorts)
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
