package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.MoneyFunctions._

/** Scale-pattern operators: techniques a 100 TB deployment leans on,
  * expressed so their *results* stay oracle-checkable (the technique
  * changes the plan, not the answer).
  */
object ScaleQueries {
  import RelationalQueries.{Q, QFn}

  val all: Seq[Q] = Seq(

    Q("z1_salted_skew_agg",
      (s, dir) => {
        // two-phase salted aggregation for skewed keys: phase 1 aggregates
        // on (key, salt) spreading a hot key over 16 reducers, phase 2
        // merges partials per key. Result ≡ direct groupBy (sums of longs
        // are order-insensitive) — which is exactly what the oracle runs.
        val salted = Tables.lineitem(s, dir)
          .withColumn("salt", pmod(col("l_partkey") + col("l_orderkey"), lit(16)))
        val phase1 = salted
          .groupBy("l_returnflag", "salt")
          .agg(sum("l_quantity").as("partial_qty"), count(lit(1)).as("partial_n"))
        phase1
          .groupBy("l_returnflag")
          .agg(roundAt(sum("partial_qty"), 2).as("sum_qty"), sum("partial_n").as("n"))
          .orderBy("l_returnflag")
      },
      Some(s"""SELECT l_returnflag, ${roundAtSql("sum(l_quantity)", 2)} AS sum_qty,
              |  count(*) AS n
              |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("z2_repartitioned_colocated_agg",
      (s, dir) => {
        // explicit pre-partitioning on the join/agg key — the bucketing
        // stand-in: repartition(col) then aggregate reuses the exchange,
        // the pattern that lets repeated aggregations over the same key
        // share one shuffle at scale.
        Tables.orders(s, dir)
          .repartition(col("o_custkey"))
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"), roundAt(sum("o_totalprice"), 2).as("total"))
          .filter(col("n_orders") >= 10)
          .orderBy("o_custkey")
      },
      Some(s"""SELECT o_custkey, count(*) AS n_orders,
              |  ${roundAtSql("sum(o_totalprice)", 2)} AS total
              |FROM orders GROUP BY 1 HAVING count(*) >= 10 ORDER BY 1""".stripMargin)),

    Q("z4_exact_percentiles",
      (s, dir) => {
        // exact grouped quantiles (linear interpolation — Spark
        // `percentile` ≡ DuckDB `quantile_cont`): the exact twin of the
        // approx path; at 100 TB you reach for approx_percentile, and
        // this pins the semantics it approximates. Array rendered as a
        // joined string for engine-portable hashing.
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").as("q"))
          .select(col("l_returnflag"),
            expr(s"concat_ws('|', transform(q, x -> cast(${roundAtSql("x", 4)} as string)))")
              .as("quartiles"))
          .orderBy("l_returnflag")
      },
      Some(s"""SELECT l_returnflag,
              |  array_to_string(list_transform(quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]),
              |    x -> CAST(${roundAtSql("x", 4)} AS VARCHAR)), '|') AS quartiles
              |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // approximate distinct (HLL): rows-only check — approximation is
    // engine-specific so no value oracle; the exact twin a11 covers the
    // semantics, this covers the scale path (constant memory per group).
    // ScaleBoundSpec bounds the error at ≤5% of the exact count.
    Q("z3_approx_count_distinct",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct("l_partkey").as("approx_parts"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      None),

    // approximate grouped quantiles (KLL-style sketch): rows-only —
    // the sketch is engine-specific; z4 pins the exact semantics this
    // approximates, and ScaleBoundSpec bounds the rank error against
    // it. At 100 TB this is the only affordable percentile: constant
    // sketch memory per group, map-side mergeable, vs z4's full sort.
    Q("z5_approx_percentiles",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(expr(
          "approx_percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D), 10000)")
          .as("q"))
        .select(col("l_returnflag"),
          expr("concat_ws('|', transform(q, x -> cast(x as string)))")
            .as("quartiles"))
        .orderBy("l_returnflag"),
      None),
  )

  val queries: Map[String, QFn] = all.map(q => q.name -> q.fn).toMap
  val oracles: Map[String, String] =
    all.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
