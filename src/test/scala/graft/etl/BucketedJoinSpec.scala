package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Storage-level co-location proof for the 100 TB join posture: two
  * tables bucketed by the join key into the same bucket count satisfy
  * the join's required distribution at SCAN time, so the fact⨝fact join
  * plans with ZERO shuffle exchanges — the bucketing claim SURVEY §4
  * makes, asserted on the physical plan rather than in prose. At
  * cluster scale this is what turns the nightly orders⨝lineitem from
  * two full-table shuffles into a local per-bucket merge.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key tables join with zero shuffle exchanges below the join") {
    val dir = tmpDir("bucketed")
    val sf = "/root/testdata/sf0.01"
    val orders = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = graft.core.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.format("parquet").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").option("path", s"$dir/orders").saveAsTable("b_orders")
    lineitem.write.format("parquet").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").option("path", s"$dir/lineitem").saveAsTable("b_lineitem")
    // force the merge join path (broadcast would hide the distribution)
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
      .getOrElse("10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy("o_custkey").agg(sum("l_quantity").as("q"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected a merge join:\n$p")
      // tree prints parents first: everything from the join down is its
      // subtree — the only exchange allowed in the whole plan is the
      // post-join groupBy's, which prints above the join
      val subtree = p.substring(p.indexOf("SortMergeJoin"))
      assert(!subtree.contains("Exchange"),
        s"bucketed join still shuffles its inputs:\n$p")
      assert(p.contains("Bucketed: true"), s"scan did not use buckets:\n$p")
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
