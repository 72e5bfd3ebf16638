package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.functions.MoneyFunctions._

/** SURVEY.md §2 relational operator inventory, one oracle-checked query per
  * operator family, expressed over the driver testdata (TESTDATA.md).
  *
  * Conventions (driver compare = sort columns by name, hash values):
  *  - every query ends in a full deterministic `orderBy` and its oracle in
  *    the matching `ORDER BY`, so row order matches even if the driver
  *    hashes in order;
  *  - computed floats are rounded with the engine-stable
  *    `floor(x·10ⁿ+½)/10ⁿ` idiom at (or finer than) the value grid —
  *    see [[graft.functions.MoneyFunctions]];
  *  - dates are emitted as strings and timestamps as `unix_micros` longs
  *    to dodge dtype normalization differences between engines.
  */
object RelationalQueries {
  type QFn = (SparkSession, String) => DataFrame
  final case class Q(name: String, fn: QFn, oracle: Option[String])

  private def T(name: String)(implicit s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, name)

  /** one scratch dir per (roundtrip query, sf dir), OVERWRITTEN per
    * invocation and deleted on JVM exit ([[graft.core.Scratch]]).
    */
  private def roundtripDir(key: String, dir: String): String =
    s"${graft.core.Scratch.dir(key)}/${graft.core.Scratch.sanitize(dir)}"

  val all: Seq[Q] = Seq(

    // ── §2.1 scans / sources ────────────────────────────────────────────
    Q("s1_csv_scan_schema",
      (s, dir) => {
        // CSV source with explicit schema (never inferSchema) — SURVEY S1:
        // parquet→CSV→schema'd read-back must be lossless for flat types.
        val tmp = roundtripDir("csv", dir)
        Tables.region(s, dir).write.mode("overwrite")
          .option("header", "true").csv(tmp)
        val schema = StructType(Seq(
          StructField("r_regionkey", IntegerType, nullable = false),
          StructField("r_name", StringType, nullable = false)))
        s.read.option("header", "true").schema(schema).csv(tmp)
          .orderBy("r_regionkey")
      },
      Some("SELECT r_regionkey, r_name FROM region ORDER BY 1")),

    Q("s2_parquet_scan",
      (s, dir) => Tables.nation(s, dir).orderBy("n_nationkey"),
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY 1")),

    Q("s8_jsonl_roundtrip",
      (s, dir) => {
        // JSON-lines source/sink roundtrip — the interchange format every
        // crawl/annotation feed arrives in. parquet → JSONL → schema'd
        // read-back (never inferSchema: an inference pass is a second
        // full scan at 100 TB, and type drift between files becomes
        // silent corruption) → aggregate. Timestamps are written as
        // unix_micros longs: JSON has no timestamp type, so the schema
        // pins the encoding instead of trusting a string format.
        val tmp = roundtripDir("jsonl", dir)
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("o_date_us"))
          .write.mode("overwrite").json(tmp)
        val schema = StructType(Seq(
          StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
          StructField("o_orderstatus", StringType),
          StructField("o_totalprice", DoubleType), StructField("o_date_us", LongType)))
        // Money sums go through DECIMAL(18,2): a double sum is
        // accumulation-order-dependent, and Spark's partition tree order
        // never matches a sequential engine's — at sum≈1.25e9 the noise
        // survives 2dp rounding. Decimal is exact and order-independent;
        // cast back to double only after the exact sum.
        s.read.schema(schema).json(tmp)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), sum("o_custkey").as("sum_cust"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("sum_price"),
            min("o_date_us").as("min_date_us"), max("o_date_us").as("max_date_us"))
          .orderBy("o_orderstatus")
      },
      Some(s"""SELECT o_orderstatus, count(*) AS n,
              |  CAST(sum(o_custkey) AS BIGINT) AS sum_cust,
              |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
              |  min(epoch_us(CAST(o_orderdate AS TIMESTAMP))) AS min_date_us,
              |  max(epoch_us(CAST(o_orderdate AS TIMESTAMP))) AS max_date_us
              |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("s9_orc_roundtrip",
      (s, dir) => {
        // ORC source/sink roundtrip — the other columnar format a Spark
        // lakehouse must read natively (Hive estates hand over ORC).
        // parquet → ORC → read-back → aggregate; ORC keeps real types,
        // so no re-encoding games: the roundtrip must be value-lossless
        // for longs/doubles/strings, and the oracle aggregates the
        // original parquet to prove it.
        val tmp = roundtripDir("orc", dir)
        Tables.lineitem(s, dir)
          .filter(col("l_returnflag") === "A")
          .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
          .write.mode("overwrite").orc(tmp)
        // Same decimal-sum discipline as s8: exact, order-independent.
        s.read.orc(tmp)
          .agg(count(lit(1)).as("n"),
            sum(col("l_orderkey")).as("sum_ok"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("sum_qty"),
            sum(col("l_extendedprice").cast("decimal(18,2)"))
              .cast("double").as("sum_price"))
      },
      Some(s"""SELECT count(*) AS n, CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
              |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
              |FROM lineitem WHERE l_returnflag = 'A'""".stripMargin)),

    Q("s12_schema_evolution",
      (s, dir) => {
        // schema-evolution read: one segment written BEFORE a column
        // existed, one after, read as ONE table via mergeSchema (footer
        // union) — the 100 TB reality that a table's files span schema
        // versions and old segments are never rewritten. The missing
        // column reads as null in old rows; the aggregate proves both
        // segments' values and the null-fill survive. Same decimal-sum
        // discipline as s8 (order-independent exact money sums).
        val tmp = roundtripDir("schema_evo", dir)
        val o = Tables.orders(s, dir)
        o.filter(col("o_orderkey") % 2 === 0)
          .select("o_orderkey", "o_totalprice")
          .write.mode("overwrite").parquet(s"$tmp/v1")
        o.filter(col("o_orderkey") % 2 === 1)
          .select("o_orderkey", "o_totalprice", "o_orderpriority")
          .write.mode("overwrite").parquet(s"$tmp/v2")
        s.read.option("mergeSchema", "true").parquet(s"$tmp/v1", s"$tmp/v2")
          // coalesce the evolution gap explicitly: null group ordering
          // differs between engines, a named bucket doesn't
          .groupBy(coalesce(col("o_orderpriority"), lit("<pre-schema>")).as("prio"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("total"))
          .orderBy("prio")
      },
      Some("""WITH u AS (
             |  SELECT o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
             |  FROM orders WHERE o_orderkey % 2 = 0
             |  UNION ALL
             |  SELECT o_totalprice, o_orderpriority
             |  FROM orders WHERE o_orderkey % 2 = 1)
             |SELECT coalesce(o_orderpriority, '<pre-schema>') AS prio, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM u GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ── §2.2 projections / filters ──────────────────────────────────────
    Q("p1_project_prune",
      (s, dir) => Tables.customer(s, dir)
        .select("c_custkey", "c_mktsegment").orderBy("c_custkey"),
      Some("SELECT c_custkey, c_mktsegment FROM customer ORDER BY 1")),

    Q("p2_rename",
      (s, dir) => Tables.supplier(s, dir)
        .select(col("s_suppkey").as("supp_id"), col("s_name").as("supp_name"))
        .orderBy("supp_id"),
      Some("SELECT s_suppkey AS supp_id, s_name AS supp_name FROM supplier ORDER BY 1")),

    Q("p4_month_window_filter",
      (s, dir) => {
        // half-open [month, month+1) window — reference pipeline.py:23–27
        val start = to_timestamp(lit("1995-03-01"))
        val end   = to_timestamp(add_months(to_date(lit("1995-03-01")), 1))
        Tables.orders(s, dir)
          .filter(col("o_orderdate") >= start && col("o_orderdate") < end)
          .select(col("o_orderkey"), col("o_orderdate").cast("string").as("order_date"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, CAST(o_orderdate AS VARCHAR) AS order_date
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1995-03-01'
             |  AND o_orderdate < TIMESTAMP '1995-04-01'
             |ORDER BY 1""".stripMargin)),

    Q("p5_eq_filter",
      (s, dir) => Tables.orders(s, dir)
        .filter(col("o_orderstatus") === lit("P"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'P' ORDER BY 1")),

    Q("p6_derived_month_eq",
      (s, dir) => Tables.orders(s, dir)
        .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
        .filter(col("month") === "1997-06")
        .select("o_orderkey", "month").orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS month
             |FROM orders WHERE strftime(o_orderdate, '%Y-%m') = '1997-06'
             |ORDER BY 1""".stripMargin)),

    Q("p7_isin_domain",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
             |WHERE l_returnflag IN ('A','R') ORDER BY 1, 2""".stripMargin)),

    Q("p8_negated_membership",
      (s, dir) => Tables.part(s, dir)
        .filter(!col("p_brand").isin("Brand#11", "Brand#22", "Brand#33"))
        .select("p_partkey", "p_brand").orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_brand FROM part
             |WHERE p_brand NOT IN ('Brand#11','Brand#22','Brand#33') ORDER BY 1""".stripMargin)),

    Q("p9_ci_string_filter",
      (s, dir) => Tables.part(s, dir)
        .filter(lower(col("p_type")) === "promo")
        .select("p_partkey", "p_type").orderBy("p_partkey"),
      Some("SELECT p_partkey, p_type FROM part WHERE lower(p_type) = 'promo' ORDER BY 1")),

    Q("p10_null_filter",
      (s, dir) => Tables.customer(s, dir)
        .filter(col("c_acctbal").isNotNull && col("c_acctbal") < 0)
        .select("c_custkey", "c_acctbal").orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_acctbal FROM customer
             |WHERE c_acctbal IS NOT NULL AND c_acctbal < 0 ORDER BY 1""".stripMargin)),

    // ── §2.3 joins ──────────────────────────────────────────────────────
    Q("j1_rate_lookup_join",
      (s, dir) => {
        // FX-lookup shape (reference transform.py:19–46): left join a small
        // rate dim, coalesce missing rate to 1.0, derive base amount.
        val rates = Tables.supplier(s, dir)
          .filter(col("s_acctbal") > 5000)
          .select(col("s_suppkey"), roundAt(col("s_acctbal") / 10000d, 4).as("rate"))
        Tables.lineitem(s, dir)
          .join(rates, col("l_suppkey") === col("s_suppkey"), "left")
          .select(col("l_orderkey"), col("l_linenumber"),
            money(col("l_extendedprice") * coalesce(col("rate"), lit(1.0))).as("amount_base"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some(s"""SELECT l_orderkey, l_linenumber,
              |  ${moneySql("l_extendedprice * coalesce(r.rate, 1.0)")} AS amount_base
              |FROM lineitem l LEFT JOIN (
              |  SELECT s_suppkey, ${roundAtSql("s_acctbal / 10000", 4)} AS rate
              |  FROM supplier WHERE s_acctbal > 5000) r
              |ON l.l_suppkey = r.s_suppkey
              |ORDER BY 1, 2""".stripMargin)),

    Q("j2_dim_enrich_agg",
      (s, dir) => Tables.lineitem(s, dir)
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
        .orderBy("p_brand"),
      Some("""SELECT p_brand, sum(l_quantity) AS sum_qty, count(*) AS n
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("j4_backbone_fill_zero",
      (s, dir) => {
        // left join a static backbone to sparse counts, fill 0 — the DQ
        // summary join shape (reference quality.py:230–239).
        val counts = Tables.nation(s, dir)
          .filter(col("n_nationkey") < 10)
          .groupBy("n_regionkey").agg(count(lit(1)).as("cnt"))
        Tables.region(s, dir)
          .join(counts, col("r_regionkey") === col("n_regionkey"), "left")
          .select(col("r_regionkey"), col("r_name"),
            coalesce(col("cnt"), lit(0L)).as("nations"))
          .orderBy("r_regionkey")
      },
      Some("""SELECT r_regionkey, r_name, coalesce(c.cnt, 0) AS nations
             |FROM region LEFT JOIN (
             |  SELECT n_regionkey, count(*) AS cnt FROM nation
             |  WHERE n_nationkey < 10 GROUP BY 1) c
             |ON r_regionkey = c.n_regionkey
             |ORDER BY 1""".stripMargin)),

    Q("j5_surrogate_key_join",
      (s, dir) => {
        // surrogate-key dim build + re-join (reference
        // export_powerbi_star_schema.py:218–236): dense keys via
        // row_number over the sorted dim, never monotonically_increasing_id.
        val brands = Tables.part(s, dir).select("p_brand").distinct()
          .withColumn("brand_key", row_number().over(Window.orderBy("p_brand")))
        Tables.lineitem(s, dir)
          .join(Tables.part(s, dir).select("p_partkey", "p_brand"),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(brands), Seq("p_brand"))
          .groupBy("brand_key", "p_brand")
          .agg(money(sum("l_extendedprice")).as("revenue"))
          .orderBy("brand_key")
      },
      Some(s"""WITH brands AS (
              |  SELECT p_brand, ROW_NUMBER() OVER (ORDER BY p_brand) AS brand_key
              |  FROM (SELECT DISTINCT p_brand FROM part))
              |SELECT b.brand_key, p.p_brand,
              |  ${moneySql("sum(l.l_extendedprice)")} AS revenue
              |FROM lineitem l
              |JOIN part p ON l.l_partkey = p.p_partkey
              |JOIN brands b ON p.p_brand = b.p_brand
              |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    Q("j6_anti_join_ri",
      (s, dir) => {
        // referential-integrity anti join (reference pipeline.py:30–47):
        // rows whose key is NOT in the dim.
        val dim = Tables.part(s, dir).filter(col("p_size") <= 10).select("p_partkey")
        Tables.lineitem(s, dir)
          .join(dim, col("l_partkey") === col("p_partkey"), "left_anti")
          .groupBy("l_returnflag").agg(count(lit(1)).as("n_violations"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n_violations FROM lineitem
             |WHERE NOT EXISTS (SELECT 1 FROM part
             |  WHERE p_partkey = l_partkey AND p_size <= 10)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("j9_full_outer_reconcile",
      (s, dir) => {
        // FULL OUTER dim reconciliation — the SCD / snapshot-diff shape:
        // two independent aggregates of different tables merged on a
        // shared key, with COALESCE filling the one-sided rows. Both
        // inputs aggregate BEFORE the join (nation-sized frames), so the
        // full-outer join is dimension×dimension however large the base
        // tables are — the order that survives a 100 TB pair of fact
        // tables. Nulls from the outer sides are filled to 0 so the diff
        // column is total everywhere.
        val sup = Tables.supplier(s, dir)
          .groupBy(col("s_nationkey").as("nk_s")).agg(count(lit(1)).as("n_sup"))
        val cus = Tables.customer(s, dir)
          .groupBy(col("c_nationkey").as("nk_c")).agg(count(lit(1)).as("n_cus"))
        sup.join(cus, col("nk_s") === col("nk_c"), "full_outer")
          .select(
            coalesce(col("nk_s"), col("nk_c")).as("nationkey"),
            coalesce(col("n_sup"), lit(0L)).as("n_sup"),
            coalesce(col("n_cus"), lit(0L)).as("n_cus"),
            (coalesce(col("n_cus"), lit(0L)) - coalesce(col("n_sup"), lit(0L))).as("gap"))
          .orderBy("nationkey")
      },
      Some("""WITH sup AS (SELECT s_nationkey AS nk, count(*) AS n_sup FROM supplier GROUP BY 1),
             |cus AS (SELECT c_nationkey AS nk, count(*) AS n_cus FROM customer GROUP BY 1)
             |SELECT coalesce(sup.nk, cus.nk) AS nationkey,
             |  coalesce(n_sup, 0) AS n_sup, coalesce(n_cus, 0) AS n_cus,
             |  coalesce(n_cus, 0) - coalesce(n_sup, 0) AS gap
             |FROM sup FULL OUTER JOIN cus ON sup.nk = cus.nk
             |ORDER BY nationkey""".stripMargin)),

    Q("j11_scd2_lookup",
      (s, dir) => {
        // point-in-interval dimension lookup — the read side of e7's
        // SCD-2 build, and the join every warehouse does at query time:
        // each fact row (purchases) retrieves the dimension state that
        // was valid AT ITS TIMESTAMP ([valid_from, valid_to), open
        // current interval, null when the fact precedes the user's
        // first interval). Intervals come from the NON-purchase events
        // (the user's activity states), probes are the purchases. The
        // join is user-keyed equi with the containment as a residual
        // predicate — per-user interval counts are bounded by activity,
        // so this scales as a key join, never a cross; intervals
        // partition each user's timeline by construction, so a probe
        // matches at most one (empty zero-width intervals match none).
        val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        val bySeg = Window.partitionBy("user_id").orderBy("seg")
        val ev = Tables.eventsTs(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("ts_us"))
        val intervals = ev.filter(col("event_type") =!= "purchase")
          .withColumn("chg",
            when(lag("event_type", 1).over(byUser).isNull ||
              col("event_type") =!= lag("event_type", 1).over(byUser), 1).otherwise(0))
          .withColumn("seg", sum("chg").over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
          .groupBy(col("user_id"), col("seg"), col("event_type").as("state"))
          .agg(min("ts_us").as("valid_from_us"))
          .withColumn("valid_to_us", lead("valid_from_us", 1).over(bySeg))
        val probes = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"))
        probes.as("p").join(intervals.as("i"),
            col("p.user_id") === col("i.user_id") &&
              col("i.valid_from_us") <= col("p.ts_us") &&
              (col("i.valid_to_us").isNull || col("p.ts_us") < col("i.valid_to_us")),
            "left")
          .select(col("p.event_id").as("event_id"), col("p.user_id").as("user_id"),
            col("p.ts_us").as("ts_us"), col("i.state").as("state"),
            col("i.seg").as("seg"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
             |  WHERE event_type <> 'purchase'),
             |m AS (
             |  SELECT user_id, event_id, event_type, ts_us,
             |    CASE WHEN lag(event_type) OVER w IS NULL
             |           OR event_type <> lag(event_type) OVER w THEN 1 ELSE 0 END AS chg
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
             |r AS (
             |  SELECT user_id, event_type, ts_us,
             |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS seg
             |  FROM m),
             |runs AS (
             |  SELECT user_id, seg, event_type AS state,
             |    min(ts_us) AS valid_from_us
             |  FROM r GROUP BY 1, 2, 3),
             |iv AS (
             |  SELECT user_id, seg, state, valid_from_us,
             |    lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY seg) AS valid_to_us
             |  FROM runs),
             |p AS (
             |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
             |  FROM events WHERE event_type = 'purchase')
             |SELECT p.event_id, p.user_id, p.ts_us, iv.state, iv.seg
             |FROM p LEFT JOIN iv
             |  ON iv.user_id = p.user_id AND iv.valid_from_us <= p.ts_us
             |  AND (iv.valid_to_us IS NULL OR p.ts_us < iv.valid_to_us)
             |ORDER BY p.event_id""".stripMargin)),

    Q("j10_cdc_merge",
      (s, dir) => {
        // MERGE / SCD-1 upsert — apply a CDC batch (inserts, updates,
        // deletes) to a dimension snapshot, the nightly warehouse
        // operation Delta/Iceberg MERGE INTO performs. Delegates to the
        // generic graft.core.Merge.scd1Upsert (one full-outer join on
        // the key + row-wise CASE — see its scaladoc for the scale
        // argument; StreamingOps.cdcUpsertStream runs the same merge as
        // a continuous apply-loop). The change batch is derived
        // deterministically from the snapshot itself (mod-keyed
        // update/delete/insert sets) so the oracle replays the
        // identical merge.
        val snap = Tables.customer(s, dir)
          .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        val upd = snap
          .filter(col("c_custkey") % 7 === 0 && col("c_custkey") % 11 =!= 0)
          .select(col("c_custkey").as("k"), col("c_name").as("n"),
            lit("MERGED").as("m"), (col("c_acctbal") + 100.0).as("b"), lit("U").as("op"))
        val del = snap.filter(col("c_custkey") % 11 === 0)
          .select(col("c_custkey").as("k"), col("c_name").as("n"),
            col("c_mktsegment").as("m"), col("c_acctbal").as("b"), lit("D").as("op"))
        // insert keys live in a provably disjoint domain: offset by
        // max(key)+1 measured FROM the snapshot (a fixed +100000 would
        // collide with real keys once the table outgrows it)
        val off = snap.agg((max("c_custkey") + 1L).as("off"))
        val ins = snap.filter(col("c_custkey") % 13 === 0)
          .crossJoin(broadcast(off))
          .select((col("c_custkey") + col("off")).as("k"),
            concat(lit("NEW#"), col("c_custkey").cast("string")).as("n"),
            lit("FRESH").as("m"), lit(0.0).as("b"), lit("I").as("op"))
        val changes = upd.unionByName(del).unionByName(ins)
          .toDF("c_custkey", "c_name", "c_mktsegment", "c_acctbal", "op")
        graft.core.Merge.scd1Upsert(snap, changes, "c_custkey")
          .withColumn("c_acctbal", roundAt(col("c_acctbal"), 2))
          .orderBy("c_custkey")
      },
      Some(s"""WITH snap AS (
              |  SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer),
              |changes AS (
              |  SELECT c_custkey AS k, c_name AS n, 'MERGED' AS m,
              |    c_acctbal + 100.0 AS b, 'U' AS op
              |  FROM snap WHERE c_custkey % 7 = 0 AND c_custkey % 11 <> 0
              |  UNION ALL
              |  SELECT c_custkey, c_name, c_mktsegment, c_acctbal, 'D'
              |  FROM snap WHERE c_custkey % 11 = 0
              |  UNION ALL
              |  SELECT c_custkey + (SELECT max(c_custkey) + 1 FROM snap),
              |    'NEW#' || CAST(c_custkey AS VARCHAR), 'FRESH', 0.0, 'I'
              |  FROM snap WHERE c_custkey % 13 = 0)
              |SELECT coalesce(k, c_custkey) AS c_custkey,
              |  coalesce(n, c_name) AS c_name,
              |  coalesce(m, c_mktsegment) AS c_mktsegment,
              |  ${roundAtSql("coalesce(b, c_acctbal)", 2)} AS c_acctbal
              |FROM snap FULL OUTER JOIN changes ON c_custkey = k
              |WHERE coalesce(op, 'keep') <> 'D'
              |ORDER BY 1""".stripMargin)),

    Q("u3_intersect_except",
      (s, dir) => {
        // set operators INTERSECT / EXCEPT (distinct semantics) — cohort
        // overlap: customers ordering in BOTH 1995-H1 and 1995-H2, and
        // those in H1 ONLY. Spark plans both as distinct-aggregated
        // semi/anti joins on the full row — one key shuffle each, no
        // driver sets. Counted per op to keep one deterministic row
        // shape.
        def custs(lo: String, hi: String) = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= to_timestamp(lit(lo)) &&
            col("o_orderdate") < to_timestamp(lit(hi)))
          .select("o_custkey")
        val h1 = custs("1995-01-01", "1995-07-01")
        val h2 = custs("1995-07-01", "1996-01-01")
        h1.intersect(h2).agg(count(lit(1)).as("n")).select(lit("both").as("op"), col("n"))
          .unionByName(
            h1.except(h2).agg(count(lit(1)).as("n")).select(lit("h1_only").as("op"), col("n")))
          .orderBy("op")
      },
      Some("""WITH h1 AS (SELECT o_custkey FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01'),
             |h2 AS (SELECT o_custkey FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1995-07-01' AND o_orderdate < TIMESTAMP '1996-01-01')
             |SELECT 'both' AS op, count(*) AS n FROM (SELECT * FROM h1 INTERSECT SELECT * FROM h2)
             |UNION ALL
             |SELECT 'h1_only', count(*) FROM (SELECT * FROM h1 EXCEPT SELECT * FROM h2)
             |ORDER BY op""".stripMargin)),

    Q("u4_bag_set_ops",
      (s, dir) => {
        // INTERSECT ALL / EXCEPT ALL — BAG semantics (multiplicities
        // matter: intersect keeps min(m_a, m_b) copies, except keeps
        // m_a − m_b). The missing half of u3: reconciliation diffs of
        // transaction streams are bags, and distinct semantics silently
        // eats duplicate rows. Spark plans both by tagging each side
        // with a per-row replica number (hash-agg counts, one key
        // shuffle each) — no sorts, no driver sets. Counted per op for
        // one deterministic row shape.
        def prios(lo: String, hi: String) = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= to_timestamp(lit(lo)) &&
            col("o_orderdate") < to_timestamp(lit(hi)))
          .select("o_custkey", "o_orderpriority")
        val h1 = prios("1995-01-01", "1995-07-01")
        val h2 = prios("1995-07-01", "1996-01-01")
        h1.intersectAll(h2).agg(count(lit(1)).as("n"))
          .select(lit("both_bag").as("op"), col("n"))
          .unionByName(h1.exceptAll(h2).agg(count(lit(1)).as("n"))
            .select(lit("h1_only_bag").as("op"), col("n")))
          .orderBy("op")
      },
      Some("""WITH h1 AS (SELECT o_custkey, o_orderpriority FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01'),
             |h2 AS (SELECT o_custkey, o_orderpriority FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1995-07-01' AND o_orderdate < TIMESTAMP '1996-01-01')
             |SELECT 'both_bag' AS op, count(*) AS n
             |FROM (SELECT * FROM h1 INTERSECT ALL SELECT * FROM h2)
             |UNION ALL
             |SELECT 'h1_only_bag', count(*)
             |FROM (SELECT * FROM h1 EXCEPT ALL SELECT * FROM h2)
             |ORDER BY op""".stripMargin)),

    Q("f21_map_kit",
      (s, dir) => {
        // t1's NULL-text contract (r14 degencheck)
        // MapType surface: build a word→count map per document (the
        // sketch-friendly per-row feature bag), then read it back with
        // element_at / size / sorted-keys rendering. Maps are rendered
        // as canonical strings for the cross-engine hash — engines
        // disagree on native map ordering by design.
        Tables.documents(s, dir)
          .filter(col("text").isNotNull)
          .withColumn("w", split(col("text"), " "))
          .withColumn("m", expr(
            """map_from_entries(transform(array_sort(array_distinct(slice(w, 1, 8))),
              |  x -> struct(x, size(filter(w, y -> y = x)))))""".stripMargin))
          .select(col("doc_id"),
            size(col("m")).cast("long").as("n_keys"),
            coalesce(element_at(col("m"), "the"), lit(0)).cast("long").as("cnt_the"),
            concat_ws(",", map_keys(col("m"))).as("keys_sorted"),
            expr("cast(aggregate(map_values(m), 0, (acc, x) -> acc + x) as bigint)")
              .as("sum_counts"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
             |           WHERE text IS NOT NULL),
             |k AS (SELECT doc_id, w, list_sort(list_distinct(w[1:8])) AS ks FROM d)
             |SELECT doc_id,
             |  CAST(len(ks) AS BIGINT) AS n_keys,
             |  CAST(coalesce(CASE WHEN list_contains(ks, 'the')
             |    THEN len(list_filter(w, y -> y = 'the')) END, 0) AS BIGINT) AS cnt_the,
             |  array_to_string(ks, ',') AS keys_sorted,
             |  CAST(list_reduce(list_transform(ks, x -> len(list_filter(w, y -> y = x))),
             |    (a, b) -> a + b) AS BIGINT) AS sum_counts
             |FROM k ORDER BY doc_id""".stripMargin)),

    Q("f22_regex_extract",
      (s, dir) => {
        // regex extraction family — regexp_extract (first group),
        // regexp_extract_all joined, regexp_count, and a regexp_replace
        // round: the log/URL-parsing scalar kit. Patterns use only
        // RE2/PCRE-common syntax so both engines agree.
        Tables.documents(s, dir)
          .filter(col("text").isNotNull) // t1's NULL-text contract
          .select(col("doc_id"),
            regexp_extract(col("text"), "(\\w+ing)\\b", 1).as("first_ing"),
            concat_ws("|", expr("regexp_extract_all(text, '(ta\\\\w+)', 1)")).as("ta_words"),
            expr("cast(regexp_count(text, 'scan') as bigint)").as("n_scan"),
            length(regexp_replace(col("text"), "[aeiou]", "")).cast("long").as("len_novowel"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  coalesce(regexp_extract(text, '(\w+ing)\b', 1), '') AS first_ing,
             |  coalesce(array_to_string(regexp_extract_all(text, '(ta\w+)', 1), '|'), '') AS ta_words,
             |  CAST(len(regexp_extract_all(text, 'scan')) AS BIGINT) AS n_scan,
             |  CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS len_novowel
             |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin)),

    // ── §2.4 aggregations ───────────────────────────────────────────────
    Q("a1_grouped_sum_pricing",
      (s, dir) => {
        // flagship wide aggregate (TPC-H Q1 shape; reference A1).
        // avg emitted as stable-rounded sum ÷ exact count so both engines
        // perform identical IEEE ops.
        val l = Tables.lineitem(s, dir)
        l.groupBy("l_returnflag", "l_linestatus")
          .agg(
            // r12 float-sum audit: money sums accumulate as exact decimals
            // (order-free at any SF, the 2-dp inputs are exactly imaged);
            // sum_qty's doubles are integer-valued, so its double sum is
            // exact below 2^53 and stays as-is
            sum("l_quantity").as("sum_qty"),
            roundAt(sum(dec2(col("l_extendedprice"))).cast("double"), 2).as("sum_base_price"),
            roundAt(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(3,2)") - rate2(col("l_discount")))).cast("double"), 4).as("sum_disc_price"),
            roundAt(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(3,2)") - rate2(col("l_discount")))
              * (lit(1).cast("decimal(3,2)") + rate2(col("l_tax")))).cast("double"), 6).as("sum_charge"),
            (sum("l_quantity") / count(lit(1))).as("avg_qty"),
            (roundAt(sum(dec2(col("l_extendedprice"))).cast("double"), 2) / count(lit(1))).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  sum(l_quantity) AS sum_qty,
              |  ${roundAtSql(s"CAST(sum(${dec2Sql("l_extendedprice")}) AS DOUBLE)", 2)} AS sum_base_price,
              |  ${roundAtSql(s"CAST(sum(${dec2Sql("l_extendedprice")} * (1 - ${rate2Sql("l_discount")})) AS DOUBLE)", 4)} AS sum_disc_price,
              |  ${roundAtSql(s"CAST(sum(${dec2Sql("l_extendedprice")} * (1 - ${rate2Sql("l_discount")}) * (1 + ${rate2Sql("l_tax")})) AS DOUBLE)", 6)} AS sum_charge,
              |  sum(l_quantity) / count(*) AS avg_qty,
              |  ${roundAtSql(s"CAST(sum(${dec2Sql("l_extendedprice")}) AS DOUBLE)", 2)} / count(*) AS avg_price,
              |  count(*) AS count_order
              |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("a2_pivot_wide",
      (s, dir) => {
        // long→wide pivot with pinned values + fill(0) (reference
        // transform.py:118–124; pinning avoids the distinct-values job).
        Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(roundAt(sum(dec2(col("o_totalprice"))).cast("double"), 2))
          .na.fill(0.0)
          .select(col("o_orderpriority"), col("F").as("status_f"),
            col("O").as("status_o"), col("P").as("status_p"))
          .orderBy("o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority,
              |  coalesce(${roundAtSql(s"CAST(sum(CASE WHEN o_orderstatus = 'F' THEN ${dec2Sql("o_totalprice")} END) AS DOUBLE)", 2)}, 0) AS status_f,
              |  coalesce(${roundAtSql(s"CAST(sum(CASE WHEN o_orderstatus = 'O' THEN ${dec2Sql("o_totalprice")} END) AS DOUBLE)", 2)}, 0) AS status_o,
              |  coalesce(${roundAtSql(s"CAST(sum(CASE WHEN o_orderstatus = 'P' THEN ${dec2Sql("o_totalprice")} END) AS DOUBLE)", 2)}, 0) AS status_p
              |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("a4_kpi_derive",
      (s, dir) => {
        // derived KPI columns over the pivot (reference transform.py:126–127)
        val wide = Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(roundAt(sum(dec2(col("o_totalprice"))).cast("double"), 2))
          .na.fill(0.0)
        wide.select(col("o_orderpriority"),
            money(col("F") + col("O")).as("closed_open_total"),
            money(col("F") + col("O") + col("P")).as("grand_total"))
          .orderBy("o_orderpriority")
      },
      Some(s"""WITH wide AS (
              |  SELECT o_orderpriority,
              |    coalesce(${roundAtSql(s"CAST(sum(CASE WHEN o_orderstatus = 'F' THEN ${dec2Sql("o_totalprice")} END) AS DOUBLE)", 2)}, 0) AS f,
              |    coalesce(${roundAtSql(s"CAST(sum(CASE WHEN o_orderstatus = 'O' THEN ${dec2Sql("o_totalprice")} END) AS DOUBLE)", 2)}, 0) AS o,
              |    coalesce(${roundAtSql(s"CAST(sum(CASE WHEN o_orderstatus = 'P' THEN ${dec2Sql("o_totalprice")} END) AS DOUBLE)", 2)}, 0) AS p
              |  FROM orders GROUP BY 1)
              |SELECT o_orderpriority, ${moneySql("f + o")} AS closed_open_total,
              |  ${moneySql("f + o + p")} AS grand_total
              |FROM wide ORDER BY 1""".stripMargin)),

    Q("a7_dup_key_check",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey, count(*) AS n FROM lineitem
             |GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin)),

    Q("a8_global_scalar_check",
      (s, dir) => Tables.customer(s, dir)
        .agg(max(abs(col("c_acctbal"))).as("max_abs_bal"),
          min(col("c_acctbal")).as("min_bal"),
          count(lit(1)).as("n")),
      Some("""SELECT max(abs(c_acctbal)) AS max_abs_bal, min(c_acctbal) AS min_bal,
             |count(*) AS n FROM customer""".stripMargin)),

    Q("a9_first_per_group",
      (s, dir) => Tables.customer(s, dir)
        .groupBy("c_nationkey")
        .agg(min("c_name").as("first_name"), count(lit(1)).as("n"))
        .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey, min(c_name) AS first_name, count(*) AS n
             |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("a10_min_per_group",
      (s, dir) => Tables.orders(s, dir)
        .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
        .groupBy("month")
        .agg(min(date_format(col("o_orderdate"), "yyyyMMdd").cast("int")).as("month_start_date_key"))
        .orderBy("month"),
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
             |  min(CAST(strftime(o_orderdate, '%Y%m%d') AS INT)) AS month_start_date_key
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("a11_distinct",
      (s, dir) => Tables.customer(s, dir)
        .select("c_mktsegment").distinct().orderBy("c_mktsegment"),
      Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY 1")),

    Q("a12_dedup_by_key",
      (s, dir) => Tables.part(s, dir)
        .groupBy("p_brand").agg(min("p_partkey").as("exemplar_partkey"))
        .orderBy("p_brand"),
      Some("""SELECT p_brand, min(p_partkey) AS exemplar_partkey
             |FROM part GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("a13_existence_check",
      (s, dir) => Tables.lineitem(s, dir)
        .agg((count(when(col("l_discount") > 0.09, 1)) > 0).as("has_violations")),
      Some("SELECT count(CASE WHEN l_discount > 0.09 THEN 1 END) > 0 AS has_violations FROM lineitem")),

    Q("a14_max_month",
      (s, dir) => Tables.orders(s, dir)
        .agg(max(date_format(col("o_orderdate"), "yyyy-MM")).as("latest_month")),
      Some("SELECT max(strftime(o_orderdate, '%Y-%m')) AS latest_month FROM orders")),

    // ── §2.5 windows (W1 + analytics extensions) ────────────────────────
    Q("w1_surrogate_row_number",
      (s, dir) => Tables.region(s, dir)
        .select(row_number().over(Window.orderBy("r_name")).as("region_key"), col("r_name"))
        .orderBy("region_key"),
      Some("""SELECT ROW_NUMBER() OVER (ORDER BY r_name) AS region_key, r_name
             |FROM region ORDER BY 1""".stripMargin)),

    Q("w2_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            lag("o_totalprice", 1).over(w).as("prev_price"),
            lead("o_totalprice", 1).over(w).as("next_price"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  lag(o_totalprice, 1) OVER w AS prev_price,
             |  lead(o_totalprice, 1) OVER w AS next_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY 1""".stripMargin)),

    Q("w3_running_sum",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            roundAt(sum(dec2(col("o_totalprice"))).over(w).cast("double"), 2).as("running_total"))
          .orderBy("o_orderkey")
      },
      Some(s"""SELECT o_orderkey, o_custkey,
              |  ${roundAtSql(s"CAST(sum(${dec2Sql("o_totalprice")}) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)", 2)} AS running_total
              |FROM orders ORDER BY 1""".stripMargin)),

    Q("w4_topn_per_group",
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
        Tables.customer(s, dir)
          .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy("c_nationkey", "rn")
      },
      Some("""SELECT * FROM (
             |  SELECT c_nationkey, c_custkey, c_acctbal,
             |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
             |  FROM customer) t
             |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin)),

    // ── §2.6 sorts / top-k ──────────────────────────────────────────────
    Q("o1_multicol_sort",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 100)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .orderBy(col("l_returnflag").desc, col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
             |FROM lineitem WHERE l_orderkey < 100
             |ORDER BY l_returnflag DESC, l_orderkey, l_linenumber""".stripMargin)),

    Q("o2_topk_by_aggregate",
      (s, dir) => Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(roundAt(sum(dec2(col("o_totalprice"))).cast("double"), 2).as("total_spend"))
        .orderBy(col("total_spend").desc, col("o_custkey"))
        .limit(8),
      Some(s"""SELECT o_custkey, ${roundAtSql(s"CAST(sum(${dec2Sql("o_totalprice")}) AS DOUBLE)", 2)} AS total_spend
              |FROM orders GROUP BY 1
              |ORDER BY 2 DESC, 1 LIMIT 8""".stripMargin)),

    Q("o5_keyset_pagination",
      (s, dir) => {
        // KEYSET (cursor) pagination — the OFFSET-free pattern an API
        // over a 100 TB table must use: OFFSET n scans and discards n
        // rows per page (page 10⁶ costs 10⁶ rows), while a keyset
        // cursor turns "next page" into a pushed-down range predicate +
        // top-k. Page = rows strictly after the cursor tuple in
        // (o_totalprice DESC, o_orderkey ASC) order; the row-value
        // comparison decomposes into the OR-of-ANDs both engines plan
        // as a scan filter. Cursor pinned to a constant (the real
        // caller passes the previous page's last row).
        val (cPrice, cKey) = (500000.0, 0L)
        Tables.orders(s, dir)
          .filter(col("o_totalprice") < cPrice ||
            (col("o_totalprice") === cPrice && col("o_orderkey") > cKey))
          .select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_totalprice < 500000.0
             |   OR (o_totalprice = 500000.0 AND o_orderkey > 0)
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)),

    // ── §2.7 set ops ────────────────────────────────────────────────────
    Q("u1_union_conformed",
      (s, dir) => {
        // conform heterogeneous sources to a common shape then union-all
        // (reference transform.py:57–88); the negation mirrors expenses
        // stored negative (transform.py:66).
        val a = Tables.orders(s, dir).select(
          concat_ws("|", lit("ord"), col("o_orderkey")).as("doc_id"),
          lit("orders").as("source"),
          col("o_totalprice").as("amount"))
        val b = Tables.lineitem(s, dir).select(
          concat_ws("|", lit("li"), col("l_orderkey"), col("l_linenumber")).as("doc_id"),
          lit("lineitem").as("source"),
          negate(col("l_extendedprice")).as("amount"))
        a.unionByName(b).orderBy("doc_id", "source")
      },
      Some("""SELECT * FROM (
             |  SELECT concat_ws('|', 'ord', o_orderkey) AS doc_id, 'orders' AS source,
             |    o_totalprice AS amount FROM orders
             |  UNION ALL
             |  SELECT concat_ws('|', 'li', l_orderkey, l_linenumber), 'lineitem',
             |    -l_extendedprice FROM lineitem) t
             |ORDER BY doc_id, source""".stripMargin)),

    Q("u2_union_missing_cols",
      (s, dir) => {
        val a = Tables.customer(s, dir).select(col("c_custkey").as("id"),
          col("c_name").as("name"), col("c_acctbal").as("bal"))
        val b = Tables.supplier(s, dir).select(col("s_suppkey").as("id"),
          col("s_name").as("name"))
        a.unionByName(b, allowMissingColumns = true).orderBy("id", "name")
      },
      Some("""SELECT * FROM (
             |  SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal FROM customer
             |  UNION ALL
             |  SELECT s_suppkey, s_name, NULL FROM supplier) t
             |ORDER BY id, name""".stripMargin)),

    // ── §2.8 scalar functions ───────────────────────────────────────────
    Q("f1_concat_ids",
      (s, dir) => Tables.nation(s, dir)
        .select(col("n_nationkey"),
          concat_ws("|", col("n_name"), col("n_nationkey")).as("txn_id"))
        .orderBy("n_nationkey"),
      Some("""SELECT n_nationkey, concat_ws('|', n_name, n_nationkey) AS txn_id
             |FROM nation ORDER BY 1""".stripMargin)),

    Q("f3_value_map",
      (s, dir) => {
        // value-map with unmatched→null (reference transform.py:80–82)
        Tables.events(s, dir)
          .withColumn("account_code",
            when(col("event_type") === "purchase", "40000001")
              .when(col("event_type") === "view", "70000001")
              .when(col("event_type") === "click", "70000002")
              .when(col("event_type") === "signup", "70000003"))
          .groupBy("account_code").agg(count(lit(1)).as("n"))
          .orderBy(col("account_code").asc_nulls_first)
      },
      Some("""SELECT CASE event_type WHEN 'purchase' THEN '40000001'
             |  WHEN 'view' THEN '70000001' WHEN 'click' THEN '70000002'
             |  WHEN 'signup' THEN '70000003' END AS account_code, count(*) AS n
             |FROM events GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin)),

    Q("f5_mult_round",
      (s, dir) => Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          roundAt(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("amount"),
          roundAt(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("charge"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some(s"""SELECT l_orderkey, l_linenumber,
              |  ${roundAtSql("l_extendedprice * (1.0 - l_discount)", 4)} AS amount,
              |  ${roundAtSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS charge
              |FROM lineitem ORDER BY 1, 2""".stripMargin)),

    Q("f6_cast_coerce",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          expr("try_cast(get_json_object(props, '$.k') AS double)").as("k_num"),
          expr("try_cast(event_type AS double)").as("bad_cast"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |  TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_num,
             |  TRY_CAST(event_type AS DOUBLE) AS bad_cast
             |FROM events ORDER BY 1""".stripMargin)),

    Q("f7_f12_date_kit",
      (s, dir) => {
        // the star-schema dim_date derivation kit (reference
        // export_powerbi_star_schema.py:126–156 + pipeline.py:23–27)
        val d = to_date(col("o_orderdate"))
        Tables.orders(s, dir).select(d.as("d")).distinct()
          .select(
            col("d").cast("string").as("date_str"),
            year(col("d")).cast("int").as("year"),
            quarter(col("d")).cast("int").as("quarter"),
            month(col("d")).cast("int").as("month_num"),
            weekofyear(col("d")).cast("int").as("iso_week"),
            dayofmonth(col("d")).cast("int").as("day"),
            date_format(col("d"), "yyyyMMdd").cast("int").as("date_key"),
            date_format(col("d"), "yyyyMM").cast("int").as("month_key"),
            date_format(col("d"), "MMM").as("month_name"),
            trunc(col("d"), "MM").cast("string").as("month_start"),
            add_months(trunc(col("d"), "MM"), 1).cast("string").as("next_month_start"),
            last_day(col("d")).cast("string").as("month_end"))
          .orderBy("date_str")
      },
      Some("""SELECT CAST(d AS VARCHAR) AS date_str,
             |  CAST(year(d) AS INT) AS year, CAST(quarter(d) AS INT) AS quarter,
             |  CAST(month(d) AS INT) AS month_num, CAST(weekofyear(d) AS INT) AS iso_week,
             |  CAST(day(d) AS INT) AS day,
             |  CAST(strftime(d, '%Y%m%d') AS INT) AS date_key,
             |  CAST(strftime(d, '%Y%m') AS INT) AS month_key,
             |  strftime(d, '%b') AS month_name,
             |  CAST(date_trunc('month', d) AS VARCHAR) AS month_start,
             |  CAST(CAST(date_trunc('month', d) + INTERVAL 1 MONTH AS DATE) AS VARCHAR) AS next_month_start,
             |  CAST(last_day(d) AS VARCHAR) AS month_end
             |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders) t
             |ORDER BY 1""".stripMargin)),

    Q("f13_f14_abs_coalesce",
      (s, dir) => Tables.customer(s, dir)
        .select(col("c_custkey"),
          abs(col("c_acctbal")).as("bal_abs"),
          coalesce(when(col("c_acctbal") >= 0, col("c_acctbal")), lit(0.0)).as("bal_nonneg"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, abs(c_acctbal) AS bal_abs,
             |  coalesce(CASE WHEN c_acctbal >= 0 THEN c_acctbal END, 0.0) AS bal_nonneg
             |FROM customer ORDER BY 1""".stripMargin)),

    Q("f16_string_kit",
      (s, dir) => Tables.part(s, dir)
        .select(col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_type")).as("lo"),
          trim(col("p_name")).as("trimmed"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
          regexp_replace(col("p_brand"), "[^0-9]", "").as("digits"),
          substring(col("p_type"), 1, 5).as("type5"),
          reverse(col("p_brand")).as("rev"),
          length(col("p_name")).cast("long").as("len"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_name) AS up, lower(p_type) AS lo,
             |  trim(p_name) AS trimmed,
             |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
             |  regexp_replace(p_brand, '[^0-9]', '', 'g') AS digits,
             |  substr(p_type, 1, 5) AS type5,
             |  reverse(p_brand) AS rev,
             |  CAST(length(p_name) AS BIGINT) AS len
             |FROM part ORDER BY 1""".stripMargin)),

    Q("f17_null_semantics",
      (s, dir) => {
        // null-handling kit: coalesce, nullif, null-safe equality (<=>).
        val c = Tables.customer(s, dir)
        c.select(col("c_custkey"),
            coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER")).as("seg_or_other"),
            (col("c_acctbal") <=> lit(0.0)).as("bal_is_zero"),
            when(col("c_acctbal") < 0, col("c_acctbal")).as("neg_only"),
            isnull(when(col("c_acctbal") < 0, col("c_acctbal"))).as("is_nonneg"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             |  coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other,
             |  c_acctbal IS NOT DISTINCT FROM 0.0 AS bal_is_zero,
             |  CASE WHEN c_acctbal < 0 THEN c_acctbal END AS neg_only,
             |  CASE WHEN c_acctbal < 0 THEN c_acctbal END IS NULL AS is_nonneg
             |FROM customer ORDER BY 1""".stripMargin)),

    Q("f18_date_arithmetic",
      (s, dir) => {
        val o = Tables.orders(s, dir).filter(col("o_orderkey") < 1000)
        o.select(col("o_orderkey"),
            datediff(to_date(lit("1998-12-31")), to_date(col("o_orderdate"))).cast("long").as("days_to_eoy"),
            date_add(to_date(col("o_orderdate")), 90).cast("string").as("due_date"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("month_index"),
            dayofweek(to_date(col("o_orderdate"))).cast("long").as("dow_1sun"))
          .orderBy("o_orderkey")
      },
      // DuckDB: DATE + INTERVAL yields TIMESTAMP (cast back); dayofweek
      // is 0=Sunday (Spark: 1=Sunday)
      Some("""SELECT o_orderkey,
             |  datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
             |  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS DATE) AS VARCHAR) AS due_date,
             |  year(o_orderdate) * 12 + month(o_orderdate) AS month_index,
             |  dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow_1sun
             |FROM orders WHERE o_orderkey < 1000 ORDER BY 1""".stripMargin)),

    Q("f19_edit_distance",
      (s, dir) => {
        // Levenshtein distance — the scalar behind fuzzy entity/title
        // matching (both engines implement the same DP definition, so
        // exact integers compare). Distance of each part name to a
        // probe string, bucketed; narrow per-row codegen'd work.
        Tables.part(s, dir).filter(col("p_partkey") <= 500)
          .select(col("p_partkey"),
            levenshtein(col("p_name"), lit("promo brushed steel")).cast("long")
              .as("dist"))
          .withColumn("band",
            when(col("dist") <= 10, "near")
              .when(col("dist") <= 20, "mid").otherwise("far"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
             |  CAST(levenshtein(p_name, 'promo brushed steel') AS BIGINT) AS dist,
             |  CASE WHEN levenshtein(p_name, 'promo brushed steel') <= 10 THEN 'near'
             |       WHEN levenshtein(p_name, 'promo brushed steel') <= 20 THEN 'mid'
             |       ELSE 'far' END AS band
             |FROM part WHERE p_partkey <= 500 ORDER BY 1""".stripMargin)),

    Q("f20_fuzzy_pairs_blocked",
      (s, dir) => {
        // Edit-distance-≤1 SELF-join via deletion neighborhoods (FastSS /
        // SymSpell blocking) — the scale path f19's scalar can't give:
        // a naive fuzzy self-join is n² levenshtein calls, but any two
        // strings at distance ≤ 1 share a member of their delete-1
        // neighborhoods (substitution at i → both drop char i; insert/
        // delete → the longer drops the extra char), so candidates come
        // from ONE equi-join on the variant string — |s|+1 variants per
        // row, candidate volume rides variant-key collisions, never n².
        // The verify stage runs exact levenshtein only on survivors.
        // Blocked ≡ brute-force is pinned in FuzzyJoinSpec; the oracle
        // mirrors the neighborhood algebra in DuckDB (an n² oracle at
        // sf0.1 is 225M levenshtein calls — the spec carries the
        // losslessness proof instead).
        val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
        // dist-0 / dist-1 SPLIT (r17): equal names are distance 0 by
        // EQUALITY — they need no variant machinery at all, yet in the
        // unsplit shape every equal-name pair matched on ~13 distinct
        // shared variants, multiplying the candidate join's fan-out and
        // the pair distinct's per-task state by that factor on exactly
        // the duplicate-heavy keys (measured at the 10× scale fixture:
        // the candidate stage held 4.6 GB memory + 372 MB disk spill
        // from 47 MB of input — m6's output-fan-out-vs-input-bytes
        // mismatch, cured here by not generating the fan-out). Branch
        // (a) emits equal-name pairs from one name-equality self-join;
        // branch (b) keeps the FastSS variant join for different names
        // only (dist exactly 1), whose survivors are sparse by nature.
        // Union ≡ the unsplit output: same name ⟺ dist 0 (branch a,
        // never b — the join requires name inequality); different names
        // at dist 1 share a delete-1 variant (FastSS losslessness,
        // FuzzyJoinSpec) and land in b with banded dist = 1; dist ≥ 2
        // passes neither filter.
        val exactPairs = c.as("a").join(c.as("b"),
            col("a.c_name") === col("b.c_name") &&
              col("a.c_custkey") < col("b.c_custkey"))
          .select(col("a.c_custkey").as("key_a"),
            col("b.c_custkey").as("key_b"), lit(0L).as("dist"))
        // (key, variant) DISTINCT before the join: deleting different
        // chars of a repeated run yields the SAME variant (each zero-run
        // name repeats ~6 of its 19 variants), and duplicate variant
        // rows multiply join fan-out quadratically on exactly the hot
        // keys. Measured 1.46M → 0.98M candidate rows at sf0.1.
        val variants = c.select(col("c_custkey"), col("c_name"), explode(expr(
          """transform(sequence(0, length(c_name)), i ->
            |  CASE WHEN i = 0 THEN c_name
            |  ELSE concat(substring(c_name, 1, i - 1), substring(c_name, i + 1)) END)""".stripMargin))
          .as("variant"))
          .distinct()
        val cand = variants.as("a").join(variants.as("b"),
            col("a.variant") === col("b.variant") &&
              col("a.c_custkey") < col("b.c_custkey") &&
              col("a.c_name") =!= col("b.c_name"))
          .select(col("a.c_custkey").as("key_a"), col("b.c_custkey").as("key_b"),
            col("a.c_name").as("name_a"), col("b.c_name").as("name_b"))
          .distinct()
        val nearPairs = cand
          // threshold overload = BANDED DP (k=1 diagonal band, ~3 cells
          // per row vs the full n×m matrix; returns -1 above the
          // threshold). Full-DP verify measured 3× slower on the same
          // candidates — at 100 TB the verify stage dominates, so the
          // band IS the scale lever. Different names ⇒ dist ≥ 1, so the
          // surviving band value is exactly 1.
          .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 1).cast("long"))
          .filter(col("dist") === 1)
          .select("key_a", "key_b", "dist")
        exactPairs.unionByName(nearPairs)
          .orderBy("key_a", "key_b")
      },
      Some("""WITH v AS (
             |  SELECT c_custkey, c_name,
             |    unnest([CASE WHEN i = 0 THEN c_name ELSE c_name[1:i-1] || c_name[i+1:] END
             |            for i in range(0, len(c_name) + 1)]) AS variant
             |  FROM customer),
             |cand AS (
             |  SELECT DISTINCT a.c_custkey AS key_a, b.c_custkey AS key_b,
             |                  a.c_name AS name_a, b.c_name AS name_b
             |  FROM v a JOIN v b ON a.variant = b.variant AND a.c_custkey < b.c_custkey)
             |SELECT key_a, key_b, CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
             |FROM cand WHERE levenshtein(name_a, name_b) <= 1
             |ORDER BY 1, 2""".stripMargin)),

    Q("f15_contains_dispatch",
      (s, dir) => Tables.part(s, dir)
        .withColumn("tier",
          when(col("p_type").contains("ECONOMY"), "cheap")
            .when(col("p_type").contains("STANDARD"), "mid")
            .otherwise("other"))
        .groupBy("tier").agg(count(lit(1)).as("n"))
        .orderBy("tier"),
      Some("""SELECT CASE WHEN p_type LIKE '%ECONOMY%' THEN 'cheap'
             |  WHEN p_type LIKE '%STANDARD%' THEN 'mid' ELSE 'other' END AS tier,
             |  count(*) AS n
             |FROM part GROUP BY 1 ORDER BY 1""".stripMargin)),
  )

  val queries: Map[String, QFn] = all.map(q => q.name -> q.fn).toMap
  val oracles: Map[String, String] =
    all.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
