package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.MoneyFunctions._

/** Window-function family and multi-level grouping — engine-completeness
  * surface beyond the reference (which has only W1): rank variants,
  * frame-bounded aggregates, rollup/cube. All single-shuffle plans:
  * windows partition by their key, rollup/cube expand grouping sets in
  * one aggregation.
  */
object WindowGroupingQueries {
  import RelationalQueries.{Q, QFn}

  val all: Seq[Q] = Seq(

    Q("w5_rank_family",
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        Tables.customer(s, dir)
          .filter(col("c_custkey") <= 200)
          .select(col("c_nationkey"), col("c_custkey"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("quartile"),
            roundAt(percent_rank().over(w), 6).as("pct_rank"),
            roundAt(cume_dist().over(w), 6).as("cume"))
          .orderBy("c_nationkey", "rnk", "c_custkey")
      },
      Some(s"""SELECT c_nationkey, c_custkey,
              |  rank() OVER w AS rnk,
              |  dense_rank() OVER w AS drnk,
              |  ntile(4) OVER w AS quartile,
              |  ${roundAtSql("percent_rank() OVER w", 6)} AS pct_rank,
              |  ${roundAtSql("cume_dist() OVER w", 6)} AS cume
              |FROM customer WHERE c_custkey <= 200
              |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
              |ORDER BY c_nationkey, rnk, c_custkey""".stripMargin)),

    Q("w6_frame_first_last",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, dir)
          .filter(col("o_custkey") <= 100)
          .select(col("o_orderkey"), col("o_custkey"),
            first("o_totalprice").over(w).as("first_price"),
            last("o_totalprice").over(w).as("last_price"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  first_value(o_totalprice) OVER w AS first_price,
             |  last_value(o_totalprice) OVER w AS last_price
             |FROM orders WHERE o_custkey <= 100
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_orderkey""".stripMargin)),

    Q("w7_range_frame_trailing_sum",
      (s, dir) => {
        // time-based RANGE frame — the window feature the ROWS family
        // (w2–w6) can't express: each order's trailing-30-day customer
        // revenue, where the frame is defined by VALUE distance (epoch
        // days) and includes all peers at the same day regardless of
        // row order. One shuffle on the customer key, then a sorted
        // range scan per partition — the moving-aggregate plan a 100 TB
        // fact table wants.
        val w = Window.partitionBy("o_custkey").orderBy("epoch_day")
          .rangeBetween(-29, 0)
        Tables.orders(s, dir)
          .filter(col("o_custkey") <= 200)
          .select(col("o_orderkey"), col("o_custkey"),
            datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
              .cast("long").as("epoch_day"),
            col("o_totalprice"))
          .withColumn("trailing_30d",
            roundAt(sum(dec2(col("o_totalprice"))).over(w).cast("double"), 2))
          .select("o_orderkey", "o_custkey", "epoch_day", "trailing_30d")
          .orderBy("o_orderkey")
      },
      Some(s"""SELECT o_orderkey, o_custkey, epoch_day,
              |  ${roundAtSql(s"CAST(sum(${dec2Sql("o_totalprice")}) OVER (PARTITION BY o_custkey ORDER BY epoch_day RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE)", 2)} AS trailing_30d
              |FROM (
              |  SELECT o_orderkey, o_custkey, o_totalprice,
              |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS epoch_day
              |  FROM orders WHERE o_custkey <= 200)
              |ORDER BY o_orderkey""".stripMargin)),

    Q("o4_native_topk_per_group",
      (s, dir) => {
        // the native TopKPerKey operator (graft.plans — custom
        // LogicalPlan + Strategy + SparkPlan, SURVEY §7.3 tier c) on
        // w4's exact task: 5 priciest lineitems per return flag. The
        // window formulation sorts every partition; this operator keeps
        // bounded per-key heaps map-side (≤ k rows per key per input
        // partition cross the exchange) and merges them key-local —
        // O(n log k), no sort. Total order (price desc, orderkey,
        // linenumber) makes the survivors unique, so the oracle's
        // row_number() formulation returns the identical row set.
        graft.plans.TopK.perKey(
          Tables.lineitem(s, dir)
            .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"),
          Seq("l_returnflag"),
          Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc),
          k = 5)
          .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice FROM (
             |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             |    row_number() OVER (PARTITION BY l_returnflag
             |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
             |  FROM lineitem)
             |WHERE rn <= 5 ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin)),

    Q("w9_running_distinct_users",
      (s, dir) => {
        // cumulative distinct users by day — the growth-curve metric.
        // Running COUNT(DISTINCT) isn't frame-able either (w8's note);
        // the scalable identity: a user enters the running distinct on
        // exactly their FIRST-seen day, so cumulative-distinct(d) =
        // Σ_{d' ≤ d} new_users(d'). One user-keyed min-aggregate over
        // the corpus, one day-grain count, one prefix sum over the
        // day-grain frame (hundreds of rows — the only single-partition
        // window, on an already-tiny aggregate).
        val firstSeen = Tables.eventsTs(s, dir)
          .groupBy("user_id")
          .agg(min(to_date(col("ts"))).as("day"))
        val daily = firstSeen.groupBy("day")
          .agg(count(lit(1)).as("new_users"))
        daily
          .withColumn("cum_users", sum("new_users").over(
            Window.orderBy("day")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("day").cast("string").as("day"),
            col("new_users"), col("cum_users"))
          .orderBy("day")
      },
      Some("""WITH f AS (
             |  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1),
             |d AS (SELECT day, count(*) AS new_users FROM f GROUP BY 1)
             |SELECT CAST(day AS VARCHAR) AS day, new_users,
             |  CAST(sum(new_users) OVER (ORDER BY day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
             |FROM d ORDER BY day""".stripMargin)),

    Q("w8_rolling_distinct_users",
      (s, dir) => {
        // trailing 7-day distinct actives per day — the DAU/WAU overlap
        // metric. Distinct-within-a-sliding-frame can't be a window
        // aggregate (count(DISTINCT) isn't frame-able); the scalable
        // formulation CONTRIBUTES each (user, day) observation to the 7
        // daily windows it covers — a bounded ×7 explode — then one
        // (window_day, user)-distinct aggregate. The fan-out factor is
        // the window length, independent of corpus size, and every
        // stage is a map-side-combinable aggregate; at 100 TB the exact
        // distinct swaps for z3's HLL sketch, same frame logic.
        val perDay = Tables.eventsTs(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val counts = perDay
          .withColumn("window_day",
            explode(expr("sequence(day, date_add(day, 6), interval 1 day)")))
          .groupBy("window_day")
          .agg(countDistinct("user_id").as("n"))
        // report every fully-covered day from a bounds-generated grid —
        // a ≥ 7-day activity gap (ingestion outage) must show as
        // active_7d = 0, which contribution rows alone can never emit;
        // the grid also drops the warm-up ramp (trailing window reaching
        // before the data starts) and the explode's past-the-end tail
        // the span guard is a cross-engine contract, not an optimization:
        // Spark's sequence() with an explicit positive step THROWS when
        // start > stop (a corpus spanning < 7 days), while the oracle's
        // generate_series returns empty — filter first so both engines
        // emit zero fully-covered days (r14 review find)
        val grid = perDay.agg(min("day").as("min_day"), max("day").as("max_day"))
          .filter(col("max_day") >= date_add(col("min_day"), 6))
          .select(explode(expr(
            "sequence(date_add(min_day, 6), max_day, interval 1 day)")).as("window_day"))
        grid.join(counts, Seq("window_day"), "left")
          .select(col("window_day").cast("string").as("day"),
            coalesce(col("n"), lit(0L)).as("active_7d"))
          .orderBy("day")
      },
      Some("""WITH per_day AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |b AS (SELECT min(day) AS min_day, max(day) AS max_day FROM per_day),
             |counts AS (
             |  SELECT window_day, count(DISTINCT user_id) AS n FROM (
             |    SELECT user_id,
             |      CAST(unnest(generate_series(day, day + 6, INTERVAL 1 DAY)) AS DATE) AS window_day
             |    FROM per_day)
             |  GROUP BY 1),
             |grid AS (
             |  SELECT CAST(unnest(generate_series(min_day + 6, max_day, INTERVAL 1 DAY)) AS DATE)
             |    AS window_day
             |  FROM b)
             |SELECT CAST(g.window_day AS VARCHAR) AS day,
             |  CAST(coalesce(n, 0) AS BIGINT) AS active_7d
             |FROM grid g LEFT JOIN counts c ON g.window_day = c.window_day
             |ORDER BY 1""".stripMargin)),

    Q("a23_share_of_total",
      (s, dir) => {
        // percent-of-total report: each nation's revenue share. The
        // total is a ONE-ROW aggregate broadcast onto the grouped frame
        // (crossJoin of a scalar) — never a partition-all window (an
        // OVER () total funnels every row through one partition at
        // scale). Share rounded 6 dp, revenue 4 dp.
        val byNation = Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
          .groupBy("c_nationkey")
          .agg(roundAt(sum(dec2(col("o_totalprice"))).cast("double"), 4).as("revenue"))
        val total = byNation.agg(roundAt(sum(col("revenue").cast("decimal(18,4)")).cast("double"), 4).as("total"))
        byNation.crossJoin(broadcast(total))
          .select(col("c_nationkey"), col("revenue"),
            roundAt(col("revenue") / col("total"), 6).as("share"))
          .orderBy("c_nationkey")
      },
      Some(s"""WITH by_nation AS (
              |  SELECT c_nationkey, ${roundAtSql(s"CAST(sum(${dec2Sql("o_totalprice")}) AS DOUBLE)", 4)} AS revenue
              |  FROM customer JOIN orders ON c_custkey = o_custkey
              |  GROUP BY 1),
              |t AS (SELECT ${roundAtSql("CAST(sum(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE)", 4)} AS total FROM by_nation)
              |SELECT c_nationkey, revenue, ${roundAtSql("revenue / total", 6)} AS share
              |FROM by_nation, t ORDER BY 1""".stripMargin)),

    Q("a15_rollup",
      (s, dir) => Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
             |  sum(l_quantity) AS sum_qty, count(*) AS n
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin)),

    Q("a16_cube",
      (s, dir) => Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(roundAt(sum(dec2(col("o_totalprice"))).cast("double"), 2).as("total"), count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      Some(s"""SELECT o_orderstatus, o_orderpriority,
              |  ${roundAtSql(s"CAST(sum(${dec2Sql("o_totalprice")}) AS DOUBLE)", 2)} AS total, count(*) AS n
              |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
              |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin)),

    Q("a19_grouping_sets",
      (s, dir) => {
        // explicit GROUPING SETS — the multi-grain report rollup/cube
        // can't express (an arbitrary set list: per (flag, status), per
        // flag, and the grand total, but NOT per status). grouping_id
        // disambiguates "NULL because aggregated away" from a NULL key
        // value — the standard relational idiom, one pass over the
        // fact (Spark expands sets with a single Expand node, keeping
        // the aggregation partial+final).
        // the Tables loader owns the '$dir/<name>.parquet' layout (and
        // any read options) — register a view instead of re-encoding the
        // path contract in SQL text (r14 review find)
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_a19")
        s.sql(
          s"""SELECT l_returnflag, l_linestatus,
             |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             |  sum(l_quantity) AS sum_qty, count(*) AS n
             |FROM lineitem_a19
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
             |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
             |  sum(l_quantity) AS sum_qty, count(*) AS n
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
             |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),
  )

  val queries: Map[String, QFn] = all.map(q => q.name -> q.fn).toMap
  val oracles: Map[String, String] =
    all.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
