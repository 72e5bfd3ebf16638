package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime partition pruning, asserted on the physical plan — the third
  * leg of the §4 runtime-re-plan story next to AQE skew splitting
  * (AqeSkewSpec) and storage co-location (BucketedJoinSpec).
  *
  * The 100 TB shape: a fact laid out by a partition column (S9's Hive
  * `month=` layout) joined to a dimension whose FILTER — not the
  * fact's — decides which months matter. Static pruning can't help (the
  * fact query has no literal predicate on the partition column);
  * dynamic partition pruning turns the dim-side filter into a runtime
  * subquery on the fact scan, so the scan reads 3 month directories
  * instead of ~80. Without it, the join reads the whole lake and
  * discards 96% of it after IO.
  */
class DynamicPruningSpec extends SparkSpec {
  import spark.implicits._

  test("dim-side filter prunes the partitioned fact scan at runtime (DPP)") {
    val dir = tmpDir("dpp")
    val sf = "/root/testdata/sf0.01"
    val li = graft.core.Tables.lineitem(spark, sf)
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .select("ship_month", "l_orderkey", "l_quantity")
    li.write.partitionBy("ship_month").parquet(s"$dir/fact")

    // an INDEPENDENT calendar dim (not derived from the fact, so Catalyst
    // cannot infer a static partition predicate — only the runtime
    // subquery can prune), parquet-backed like a real lake dim (a local
    // relation would constant-fold its filter away and give the DPP rule
    // no Filter node to lift)
    (1992 to 1998).flatMap(y => (1 to 12).map(m =>
        (f"$y-$m%02d", s"${y}Q${(m + 2) / 3}")))
      .toDF("ship_month", "quarter")
      .write.parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")

    val fact = spark.read.parquet(s"$dir/fact")
    val joined = fact
      .join(dim.filter(col("quarter") === "1996Q1"), Seq("ship_month"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))

    // non-adaptive plans print `dynamicpruningexpression(...)` in the
    // scan's PartitionFilters; under AQE the same mechanism shows as a
    // `SubqueryAdaptiveBroadcast dynamicpruning#N` child of the scan
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan is not runtime-pruned:\n$plan")

    // values: identical to pushing the quarter's months as a static filter
    val got = joined.as[(Long, Double)].head()
    val want = li.filter(col("ship_month").isin("1996-01", "1996-02", "1996-03"))
      .agg(count(lit(1)), sum("l_quantity")).as[(Long, Double)].head()
    assert(got == want, s"pruned join changed values: $got vs $want")
    assert(got._1 > 0, "empty quarter — test data drifted")
  }
}
