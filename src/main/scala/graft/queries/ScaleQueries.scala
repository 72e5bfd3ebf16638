package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.MoneyFunctions._

/** Scale-pattern operators: techniques a 100 TB deployment leans on,
  * expressed so their *results* stay oracle-checkable (the technique
  * changes the plan, not the answer).
  */
object ScaleQueries {
  import RelationalQueries.{Q, QFn}

  /** the K=64 per-source KMV sketch shared by z10 and z11 (one
    * definition so the hash contract, k, and the heap shape can never
    * diverge between the two): corpus-wide (source, h) distinct on the
    * native shingle→base chain, then the TopKPerKey heap. Cached —
    * released by spark.catalog.clearCache().
    */
  private[queries] val KmvK = 64

  /** r13 ADVICE: z3/z5/z8 fold an EXACT verification twin (countDistinct,
    * a full percentile sort, an exact-users join) into the same frame as
    * the approximate operator so the DuckDB oracle can pin a bound
    * verdict — but a bench row timing that frame measures twin + approx,
    * not the production approx path the scaladoc claims ("constant
    * sketch memory per group"). This session-conf gate lets the BENCH
    * run the approx-only production shape while Verify (which never
    * sets it) keeps the self-verifying twin shape the correctness
    * artifact requires. The two shapes share every approx-side
    * expression verbatim, so the gated plan is a strict subtree of the
    * verified one — the flag can only drop verification columns, never
    * change the approximate computation being timed.
    */
  private[queries] def approxOnly(s: SparkSession): Boolean =
    s.conf.getOption("graft.bench.approxOnly").contains("true")
  private def kmvSketch(s: SparkSession, dir: String): DataFrame = {
    val h = Tables.documents(s, dir)
      .select(col("source"),
        explode(graft.functions.MinHashBases(
          graft.functions.Shingles(col("text")))).as("h"))
      .distinct()
    graft.plans.TopK.perKey(h, Seq("source"), Seq(col("h").asc), k = KmvK)
      .cache()
  }

  /** DuckDB twin of [[kmvSketch]] (CTEs d → h → sk), shared by the z10
    * and z11 oracles.
    */
  private val kmvSketchCtesSql: String =
    s"""d AS (
       |  SELECT source,
       |    list_distinct([w[i] || ' ' || w[i + 1] for i in range(1, len(w))]) AS sh
       |  FROM (SELECT source, string_split(text, ' ') AS w FROM documents)),
       |h AS (
       |  SELECT DISTINCT source,
       |    list_reduce([CAST(strpos('0123456789abcdef', substr(md5(t), i, 1)) - 1
       |                      AS BIGINT) for i in range(1, 13)],
       |                (b, c) -> b * 16 + c) % 1000000007 AS h
       |  FROM (SELECT source, unnest(sh) AS t FROM d)),
       |sk AS (
       |  SELECT source, h FROM (
       |    SELECT source, h,
       |      row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |    FROM h) WHERE rn <= $KmvK)""".stripMargin

  /** z6's hash construction, shared with the parameterized measurement
    * below: two positions per key from the two md5 hex halves (digits
    * 1–8 and 9–16), via the native md5_fold kernel — values identical
    * to the interpreted `instr` fold the DuckDB oracle still runs.
    * Expects the raw key string in column `k`.
    */
  private def bloomPositions(df: DataFrame, mBits: Int): DataFrame = df
    // ONE raw 16-digit fold per key (one digest), halves bit-sliced out:
    // digits 1–8 are the unsigned high 32 bits, digits 9–16 the low 32
    .withColumn("f16", graft.functions.Md5Fold(col("k"), 1, 16))
    .withColumn("p1", shiftrightunsigned(col("f16"), 32) % mBits)
    .withColumn("p2", col("f16").bitwiseAND(lit(0xFFFFFFFFL)) % mBits)
    .drop("f16")

  /** z7's count-min sketch over the event stream, returning EVERY key's
    * (user_id, cms_n, exact_n): K=4 rows × W=64 buckets, md5-fold base +
    * the MinHashFamily universal hashes (oracle-reproducible cells).
    * ScaleBoundSpec bounds the full overcount distribution against the
    * e·N/W Markov tail; the z7 query windows this down to the top-10.
    */
  private[queries] def cmsUserCounts(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import graft.functions.MinHashFamily.{P => p}
    val W = 64
    val ev = Tables.events(s, dir).select(col("user_id"))
      // per-EVENT base via the native md5_fold kernel (one fused digest
      // read vs 12 interpreted lambdas per row)
      .withColumn("base",
        graft.functions.Md5Fold(col("user_id").cast("string"), 1, 12) % p)
    val hashed = ev.select(col("user_id"), col("base"),
      posexplode(array((0 until 4).map(k =>
        expr(s"(${graft.functions.MinHashFamily.a(k)} * base + " +
          s"${graft.functions.MinHashFamily.b(k)}) % $p % $W")): _*)))
      .toDF("user_id", "base", "k", "bucket")
    val cells = hashed.groupBy("k", "bucket").agg(count(lit(1)).as("c"))
    val est = hashed.dropDuplicates("user_id", "k")
      .join(broadcast(cells), Seq("k", "bucket"))
      .groupBy("user_id").agg(min("c").as("cms_n"))
    val exact = Tables.events(s, dir)
      .groupBy("user_id").agg(count(lit(1)).as("exact_n"))
    est.join(exact, Seq("user_id"))
  }

  /** Measured false-positive rate of the z6 bloom construction at an
    * arbitrary filter size `mBits` (k = 2 hashes), over the DISTINCT
    * non-member probe keys, plus (inserted key count, probe count) —
    * ScaleBoundSpec checks the rate against the textbook
    * (1 − e^{−kn/m})^k prediction at several m, which is how an
    * operator sizes the filter for a 100 TB key cardinality before
    * running anything.
    */
  /** fold a (p1, p2)-positioned key frame into the 32-bit-word bloom
    * table (w, word) — ONE owner of the word/bit layout ("words stay
    * below the BIGINT sign bit"), shared by z6 and [[bloomFpMeasured]]
    * so the two can never desynchronize (r14 review find).
    */
  private def bloomWords(positioned: DataFrame): DataFrame = positioned
    .select(explode(array(col("p1"), col("p2"))).as("p"))
    .select(expr("p div 32").as("w"),
      expr("shiftleft(cast(1 as bigint), cast(p % 32 as int))").as("m"))
    .groupBy("w").agg(expr("bit_or(m)").as("word"))

  /** probe a positioned key frame against a broadcast bloom word table:
    * adds `bloom_pass` (both bits set; missing word = 0 = reject).
    */
  private def bloomProbe(positioned: DataFrame, bloom: DataFrame): DataFrame =
    positioned
      .withColumn("w1", expr("p1 div 32"))
      .withColumn("m1", expr("shiftleft(cast(1 as bigint), cast(p1 % 32 as int))"))
      .withColumn("w2", expr("p2 div 32"))
      .withColumn("m2", expr("shiftleft(cast(1 as bigint), cast(p2 % 32 as int))"))
      .join(broadcast(bloom.withColumnRenamed("w", "w1")
        .withColumnRenamed("word", "word1")), Seq("w1"), "left")
      .join(broadcast(bloom.withColumnRenamed("w", "w2")
        .withColumnRenamed("word", "word2")), Seq("w2"), "left")
      .withColumn("bloom_pass",
        coalesce(col("word1"), lit(0L)).bitwiseAND(col("m1")) =!= 0 &&
          coalesce(col("word2"), lit(0L)).bitwiseAND(col("m2")) =!= 0)

  private[queries] def bloomFpMeasured(s: org.apache.spark.sql.SparkSession,
      dir: String, mBits: Int): (Long, Long, Double) = {
    val urgentKeys = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = bloomWords(bloomPositions(urgentKeys
        .withColumn("k", col("o_orderkey").cast("string")), mBits))
    val nonMembers = Tables.lineitem(s, dir).select(col("l_orderkey")).distinct()
      .join(urgentKeys, col("l_orderkey") === col("o_orderkey"), "left_anti")
    val probed = bloomProbe(bloomPositions(nonMembers
        .withColumn("k", col("l_orderkey").cast("string")), mBits), bloom)
      .agg(count(lit(1)).as("n_probe"),
        sum(when(col("bloom_pass"), 1L).otherwise(0L)).as("n_fp"))
      .first()
    val n = urgentKeys.count()
    (n, probed.getLong(0), probed.getLong(1).toDouble / probed.getLong(0))
  }

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

    Q("z9_key_skew_report",
      (s, dir) => {
        // the PRE-shuffle skew profiler — the measurement that decides
        // whether a key needs z1's salting / AQE skew-split before you
        // pay for the shuffle: per-key row counts (one map-side-combined
        // agg), summarized to key cardinality, max/avg key weight, and
        // the skew ratio. All counts are exact longs; avg and ratio are
        // single divisions of those integers. On a 100 TB fact this runs
        // on a sample partition or the previous day's stats table — the
        // report shape is the same.
        val counts = Tables.lineitem(s, dir)
          .groupBy("l_suppkey").agg(count(lit(1)).as("n"))
        counts.agg(
            count(lit(1)).as("n_keys"),
            sum("n").as("n_rows"),
            max("n").as("max_key_rows"))
          .withColumn("avg_key_rows",
            col("n_rows").cast("double") / col("n_keys"))
          .withColumn("skew_ratio",
            col("max_key_rows").cast("double") / col("avg_key_rows"))
          .select("n_keys", "n_rows", "max_key_rows", "avg_key_rows", "skew_ratio")
      },
      Some("""WITH c AS (SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1),
             |a AS (SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
             |         max(n) AS max_key_rows FROM c)
             |SELECT n_keys, n_rows, max_key_rows,
             |  CAST(n_rows AS DOUBLE) / n_keys AS avg_key_rows,
             |  CAST(max_key_rows AS DOUBLE) / (CAST(n_rows AS DOUBLE) / n_keys) AS skew_ratio
             |FROM a""".stripMargin)),

    Q("z2_repartitioned_colocated_agg",
      (s, dir) => {
        // explicit pre-partitioning on the join/agg key — the bucketing
        // stand-in: repartition(col) then aggregate reuses the exchange,
        // the pattern that lets repeated aggregations over the same key
        // share one shuffle at scale.
        Tables.orders(s, dir)
          .repartition(col("o_custkey"))
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"), roundAt(sum(dec2(col("o_totalprice"))).cast("double"), 2).as("total"))
          .filter(col("n_orders") >= 10)
          .orderBy("o_custkey")
      },
      Some(s"""SELECT o_custkey, count(*) AS n_orders,
              |  ${roundAtSql(s"CAST(sum(${dec2Sql("o_totalprice")}) AS DOUBLE)", 2)} AS total
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

    // approximate distinct (HLL): the sketch VALUE is engine-internal
    // (Spark HLL++ vs whatever the oracle engine runs), so the
    // cross-engine contract is the ERROR BOUND, not the estimate — and
    // the query verifies that bound itself (r12 verdict: the old
    // rows-only row read as "untested" in the driver artifact). It
    // emits the exact twin columns (deterministic in both engines)
    // plus `within_3rsd` = |approx − exact|/exact ≤ 3·rsd computed
    // against Spark's own exact count; since the exact columns are
    // hash-pinned cross-engine, the verdict IS a DuckDB-exact vs
    // Spark-approx bounded compare, and the driver artifact carries
    // pass/fail. (Production uses the approx path alone — the exact
    // count here is the verification twin, same pattern as z8's
    // exact_users column. ScaleBoundSpec keeps the quantified error
    // log.)
    Q("z3_approx_count_distinct",
      (s, dir) => {
        // the bound verdict's width (r13 ADVICE): approx_count_distinct
        // runs HLL++ at the DEFAULT rsd 0.05 — a 1-SIGMA parameter, so a
        // correctly functioning sketch legitimately exceeds it with
        // ~32% probability per group on an adversarial cardinality. The
        // oracle gate is 3·rsd (≈ 99.7% envelope): deterministic-pass on
        // any healthy fixture, and a breach still means the sketch is
        // actually broken, not unlucky. Derived from the configured rsd
        // so retuning the sketch retunes the gate.
        val rsd = 0.05
        val grouped = Tables.lineitem(s, dir).groupBy("l_returnflag")
        if (approxOnly(s))
          grouped.agg(approx_count_distinct("l_partkey", rsd).as("approx"),
            count(lit(1)).as("n"))
            .orderBy("l_returnflag")
        else grouped
          .agg(approx_count_distinct("l_partkey", rsd).as("approx"),
            countDistinct("l_partkey").as("exact_parts"),
            count(lit(1)).as("n"))
          .select(col("l_returnflag"), col("n"), col("exact_parts"),
            (abs(col("approx") - col("exact_parts")).cast("double")
              / col("exact_parts") <= 3 * rsd).as("within_3rsd"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |  count(DISTINCT l_partkey) AS exact_parts,
             |  true AS within_3rsd
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("z8_hll_sketch_rollup",
      (s, dir) => {
        // MERGEABLE distinct-count sketches — the re-aggregatable-cube
        // pattern that makes 100 TB dashboards workable: one pass over
        // raw events builds a small per-(event_type, day) DataSketches
        // HLL sketch COLUMN (lgK=12 ⇒ ~1.6% RSE, a few KB each);
        // monthly/quarterly/any-coarser distinct-user counts then come
        // from MERGING the stored sketches — never from rescanning raw
        // data, which is what makes pre-aggregated rollups possible for
        // a measure (distinct) that doesn't sum. Output pins the
        // rolled-up estimate next to the single-pass direct estimate
        // and the exact distinct; the rollup == direct equality (union
        // of per-day register states == the whole-stream register
        // state, so the merge loses NOTHING) and the error envelope are
        // verified IN the query as oracled boolean verdicts.
        val ev = Tables.eventsTs(s, dir)
          .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
        val daily = ev.groupBy("event_type", "day")
          .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"),
            count(lit(1)).as("n"))
        val rollup = daily.groupBy("event_type")
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est_rollup"),
            sum("n").as("n_events"), count(lit(1)).as("n_days"))
        // production shape (r13 ADVICE gate): build the per-day sketches
        // and MERGE — the whole point of the rollup is that the direct
        // re-scan and the exact count never run; they exist below only
        // as the oracle's verification twins
        if (approxOnly(s))
          rollup.select("event_type", "n_days", "n_events", "est_rollup")
            .orderBy("event_type")
        else rollup
          .join(ev.groupBy("event_type").agg(
            expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est_direct"),
            countDistinct("user_id").as("exact_users")), Seq("event_type"))
          // self-verifying (r12 verdict): the estimates are
          // engine-internal, so the oracled payload is the exact twin
          // columns plus the two contract verdicts — merge losslessness
          // (rollup == direct EXACTLY) and the lgK=12 error envelope
          // (3σ ≈ 5%) against the exact count. The exact columns are
          // hash-pinned cross-engine, so a DuckDB run agreeing on them
          // certifies the Spark-side bound was taken against the truth;
          // ScaleBoundSpec keeps the quantified estimate log.
          .select(col("event_type"), col("n_days"), col("n_events"),
            col("exact_users"),
            (col("est_rollup") === col("est_direct")).as("rollup_eq_direct"),
            (abs(col("est_direct") - col("exact_users")).cast("double")
              / col("exact_users") <= 0.05).as("within_5pct"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  count(DISTINCT CAST(ts AS DATE)) AS n_days,
             |  count(*) AS n_events,
             |  count(DISTINCT user_id) AS exact_users,
             |  true AS rollup_eq_direct, true AS within_5pct
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("z6_bloom_semi_join",
      (s, dir) => {
        // Bloom-filter semi-join reduction — the runtime-filter pattern
        // made explicit and engine-portable: when the qualifying key
        // set is too big to broadcast raw (at 100 TB it is), build a
        // fixed-size bit set (here 65,536 bits = 2,048 32-bit words in
        // BIGINTs, k=2 md5-derived hashes) with one partial-aggregable
        // pass over the keys, broadcast THAT, and prune the big side
        // before its shuffle. No false negatives by construction; the
        // output pins the exact semi-join count next to the bloom-pass
        // count and the measured false-positive rate — the number that
        // sizes m and k for a target corpus. Words stay below the
        // BIGINT sign bit (shift ≤ 31) so both engines' shifts agree.
        def positions(df: DataFrame): DataFrame = bloomPositions(df, 65536)
        val urgentKeys = Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        val bloom = bloomWords(positions(urgentKeys
            .withColumn("k", col("o_orderkey").cast("string"))))
        val passed = bloomProbe(positions(Tables.lineitem(s, dir)
            .select(col("l_orderkey"))
            .withColumn("k", col("l_orderkey").cast("string"))), bloom)
        val exact = Tables.lineitem(s, dir).select("l_orderkey")
          .join(urgentKeys, col("l_orderkey") === col("o_orderkey"), "left_semi")
        passed.agg(count(lit(1)).as("n_lineitem"),
            sum(when(col("bloom_pass"), 1L).otherwise(0L)).as("n_bloom_pass"))
          .crossJoin(broadcast(exact.agg(count(lit(1)).as("n_exact"))))
          .withColumn("n_false_pos", col("n_bloom_pass") - col("n_exact"))
          .withColumn("fp_rate", roundAt(col("n_false_pos").cast("double") /
            greatest(col("n_lineitem") - col("n_exact"), lit(1L)), 6))
          .select("n_lineitem", "n_exact", "n_bloom_pass", "n_false_pos", "fp_rate")
      },
      Some {
        val foldHexSql = (a: Int, b: Int) =>
          s"""list_reduce([CAST(strpos('0123456789abcdef', substr(hex, i, 1)) - 1 AS BIGINT)
             |  for i in range($a, ${b + 1})], (x, c) -> x * 16 + c)""".stripMargin
        s"""WITH uk AS (
           |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
           |upos AS (
           |  SELECT ${foldHexSql(1, 8)} % 65536 AS p1,
           |    ${foldHexSql(9, 16)} % 65536 AS p2
           |  FROM (SELECT md5(CAST(o_orderkey AS VARCHAR)) AS hex FROM uk)),
           |bloom AS (
           |  SELECT p // 32 AS w, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS word
           |  FROM (SELECT unnest([p1, p2]) AS p FROM upos) GROUP BY 1),
           |lipos AS (
           |  SELECT l_orderkey, ${foldHexSql(1, 8)} % 65536 AS p1,
           |    ${foldHexSql(9, 16)} % 65536 AS p2
           |  FROM (SELECT l_orderkey, md5(CAST(l_orderkey AS VARCHAR)) AS hex FROM lineitem)),
           |probe AS (
           |  SELECT (coalesce(b1.word, 0) & (1::BIGINT << CAST(l.p1 % 32 AS INT))) <> 0
           |     AND (coalesce(b2.word, 0) & (1::BIGINT << CAST(l.p2 % 32 AS INT))) <> 0 AS bloom_pass
           |  FROM lipos l
           |  LEFT JOIN bloom b1 ON b1.w = l.p1 // 32
           |  LEFT JOIN bloom b2 ON b2.w = l.p2 // 32),
           |ex AS (
           |  SELECT count(*) AS n_exact FROM lineitem
           |  WHERE l_orderkey IN (SELECT o_orderkey FROM uk)),
           |ag AS (
           |  SELECT count(*) AS n_lineitem,
           |    CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass
           |  FROM probe)
           |SELECT n_lineitem, n_exact, n_bloom_pass,
           |  n_bloom_pass - n_exact AS n_false_pos,
           |  ${roundAtSql("CAST(n_bloom_pass - n_exact AS DOUBLE) / greatest(n_lineitem - n_exact, 1)", 6)} AS fp_rate
           |FROM ag CROSS JOIN ex""".stripMargin
      }),

    // z7's sketch build + per-key estimates, exposed so ScaleBoundSpec
    // can bound ALL keys' overcounts (the query reports only the top-10)
    Q("z7_cms_heavy_hitters",
      (s, dir) => {
        // count-min-sketch heavy hitters over the event stream — the
        // constant-memory frequency sketch (Cormode & Muthukrishnan
        // 2005) a 100 TB pipeline uses to find hot keys (for salting
        // decisions, abuse detection, cache sizing) without a full
        // per-key aggregation: K=4 rows × W=64 buckets of counts; each
        // event increments one cell per row (narrow hash maps + ONE
        // (row, bucket) map-side-combinable agg → a 256-cell table);
        // estimate(key) = min over rows of its cell — an overestimate,
        // never an under. The same md5-fold base + universal-hash
        // family as the MinHash surface (MinHashFamily), so the DuckDB
        // oracle reproduces every cell exactly. Report: top-10 users by
        // estimate, with the exact count alongside and the collision
        // overcount — the number that tells an operator whether W is
        // sized right (ScaleBoundSpec pins it against the e/W bound).
        // top-10 via distributed TakeOrdered (orderBy.limit), NOT an
        // unpartitioned ranking window — a global Window.orderBy would
        // funnel every distinct user through one partition, the exact
        // shape the plan audits forbid. The rank window that remains
        // runs over the 10 surviving rows only.
        val w10 = org.apache.spark.sql.expressions.Window
          .orderBy(col("cms_n").desc, col("user_id"))
        cmsUserCounts(s, dir)
          .orderBy(col("cms_n").desc, col("user_id"))
          .limit(10)
          .withColumn("rank", row_number().over(w10).cast("long"))
          .withColumn("overcount", col("cms_n") - col("exact_n"))
          .select("rank", "user_id", "exact_n", "cms_n", "overcount")
          .orderBy("rank")
      },
      Some {
        import graft.functions.MinHashFamily.{P => p, aSql => minhashASql, bSql => minhashBSql}
        s"""WITH e AS (
           |  SELECT user_id,
           |    list_reduce([CAST(strpos('0123456789abcdef',
           |        substr(md5(CAST(user_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)
           |      for i in range(1, 13)], (b, c) -> b * 16 + c) % $p AS base
           |  FROM events),
           |hashed AS (
           |  SELECT user_id, t.k AS k,
           |    ($minhashASql[t.k + 1] * base + $minhashBSql[t.k + 1]) % $p % 64 AS bucket
           |  FROM e, unnest(range(0, 4)) t(k)),
           |cells AS (SELECT k, bucket, count(*) AS c FROM hashed GROUP BY 1, 2),
           |est AS (
           |  SELECT q.user_id, min(cells.c) AS cms_n
           |  FROM (SELECT DISTINCT user_id, k, bucket FROM hashed) q
           |  JOIN cells ON cells.k = q.k AND cells.bucket = q.bucket
           |  GROUP BY 1),
           |ex AS (SELECT user_id, count(*) AS exact_n FROM events GROUP BY 1)
           |SELECT rank, user_id, exact_n, cms_n, cms_n - exact_n AS overcount FROM (
           |  SELECT est.user_id, ex.exact_n, est.cms_n,
           |    CAST(ROW_NUMBER() OVER (ORDER BY est.cms_n DESC, est.user_id) AS BIGINT) AS rank
           |  FROM est JOIN ex ON ex.user_id = est.user_id)
           |WHERE rank <= 10 ORDER BY rank""".stripMargin
      }),

    // approximate grouped quantiles (Greenwald-Khanna summary — Spark's
    // approx_percentile, not a KLL sketch): the summary is
    // engine-specific, so the cross-engine contract is GK's RANK error
    // bound, verified IN the query (r12 verdict — the old rows-only row
    // read as untested). approx_percentile returns an actual data
    // value; rank error ≤ 1% means that value lies between the exact
    // q∓0.01 quantiles (accuracy 10000 guarantees 1e-4, so the 1% gate
    // has two orders of margin). The exact quantile sandwich comes from
    // z4's engine-pinned percentile ≡ quantile_cont, so the oracled
    // payload is the exact quartiles (the z4 semantic) plus the
    // per-group verdict. At 100 TB production runs the approx path
    // alone: constant sketch memory per group, map-side mergeable, vs
    // z4's full sort — the exact sandwich here is the verification
    // twin.
    Q("z5_approx_percentiles",
      (s, dir) => {
        val grouped = Tables.lineitem(s, dir).groupBy("l_returnflag")
        // production shape (r13 ADVICE gate): the GK sketch alone —
        // constant memory per group, no full sort; the exact 9-point
        // percentile below is the oracle's verification sandwich only
        if (approxOnly(s))
          grouped.agg(expr(
            "approx_percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D), 10000)")
            .as("a"))
            .select(col("l_returnflag"),
              expr("concat_ws('|', transform(a, x -> cast(x as string)))")
                .as("approx_quartiles"))
            .orderBy("l_returnflag")
        else grouped
          .agg(expr(
            "approx_percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D), 10000)")
            .as("a"),
            expr("percentile(l_extendedprice, array(0.24D, 0.25D, 0.26D, " +
              "0.49D, 0.5D, 0.51D, 0.74D, 0.75D, 0.76D))").as("e"))
          .select(col("l_returnflag"),
            expr(s"concat_ws('|', cast(${roundAtSql("e[1]", 4)} as string), " +
              s"cast(${roundAtSql("e[4]", 4)} as string), " +
              s"cast(${roundAtSql("e[7]", 4)} as string))").as("exact_quartiles"),
            expr("a[0] >= e[0] AND a[0] <= e[2] AND " +
              "a[1] >= e[3] AND a[1] <= e[5] AND " +
              "a[2] >= e[6] AND a[2] <= e[8]").as("within_rank_1pct"))
          .orderBy("l_returnflag")
      },
      Some(s"""WITH q AS (
              |  SELECT l_returnflag,
              |    quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]) AS e
              |  FROM lineitem GROUP BY 1)
              |SELECT l_returnflag,
              |  concat_ws('|', CAST(${roundAtSql("e[1]", 4)} AS VARCHAR),
              |    CAST(${roundAtSql("e[2]", 4)} AS VARCHAR),
              |    CAST(${roundAtSql("e[3]", 4)} AS VARCHAR)) AS exact_quartiles,
              |  true AS within_rank_1pct
              |FROM q ORDER BY 1""".stripMargin)),

    Q("z10_kmv_distinct",
      (s, dir) => {
        // KMV (K-minimum-values) distinct-count sketch (Bar-Yossef et al.
        // 2002; Beyer et al. 2007 "On Synopses for Distinct-Value
        // Estimation") over per-source bigram-shingle vocabularies —
        // the "distinct n-grams per source" diversity profile a corpus
        // report wants. Unlike z3/z5/z8 (HLL/GK internal state → the
        // oracle pins a bound VERDICT, not the estimate), KMV over md5
        // is FULLY deterministic: the sketch IS
        // the k smallest hash values, so the estimate (k−1)/F(h_k) is
        // hash-exact cross-engine — a sketch family with a first-class
        // DuckDB oracle. Mergeability is demonstrated IN the query: the
        // '__all__' row is computed from the per-source sketch rows only
        // (union → distinct → k smallest), never from the raw data —
        // the sketch algebra a 100 TB rollup uses. Plan shape at scale:
        // one distinct on (source, h) with map-side partial agg (shuffle
        // bounded by distinct-type count), then the native TopKPerKey
        // operator (o4's plan — bounded per-key heaps map-side, ≤ k rows
        // per key cross the exchange, no sort) keeps the k minima; the
        // per-source sketch table is #sources × k rows. When a group has
        // fewer than k distinct values the sketch degrades to the exact
        // count by construction (the n_sketch < k branch). Hashing rides
        // the native shingles→minhash_bases codegen chain (one fused JVM
        // pass per row — the r7 natives; interpreted HOF folds cost
        // ~20µs/shingle), so the estimated universe is the distinct
        // per-source bigram-shingle BASES (48-bit md5 fold mod
        // P=1e9+7, the repo-wide cross-engine hash contract; mod-P
        // collisions are ≤ n²/2P ≈ 1e-4 at sf0.1 — inside any hashed
        // sketch's noise floor).
        val K = KmvK
        // the sketch table is #sources × k rows; kmvSketch caches it so
        // the per-source branch and the '__all__' merge branch of the
        // union don't each re-run the corpus-wide distinct+heap pass
        val sk = kmvSketch(s, dir)
        val per = sk.groupBy("source")
          .agg(count(lit(1)).as("n_sketch"), max("h").as("hmax"))
        val allRow = sk.select("h").distinct().orderBy("h").limit(K)
          .agg(count(lit(1)).as("n_sketch"), max("h").as("hmax"))
          .select(lit("__all__").as("source"), col("n_sketch"), col("hmax"))
        per.unionByName(allRow)
          .select(col("source"), col("n_sketch"),
            when(col("n_sketch") < K, col("n_sketch").cast("double"))
              .otherwise(roundAt(lit((K - 1) * 1000000007.0) / col("hmax"), 6))
              .as("est_distinct"))
          .orderBy("source")
      },
      Some(s"""WITH $kmvSketchCtesSql,
              |persrc AS (
              |  SELECT source, count(*) AS n_sketch, max(h) AS hmax FROM sk GROUP BY 1),
              |allsk AS (
              |  SELECT h FROM (SELECT DISTINCT h FROM sk) ORDER BY h LIMIT $KmvK),
              |allrow AS (
              |  SELECT '__all__' AS source, count(*) AS n_sketch, max(h) AS hmax
              |  FROM allsk),
              |u AS (SELECT * FROM persrc UNION ALL SELECT * FROM allrow)
              |SELECT source, CAST(n_sketch AS BIGINT) AS n_sketch,
              |  CASE WHEN n_sketch < $KmvK THEN CAST(n_sketch AS DOUBLE)
              |       ELSE ${roundAtSql(s"($KmvK - 1) * 1000000007.0 / hmax", 6)}
              |  END AS est_distinct
              |FROM u ORDER BY source""".stripMargin)),

    Q("z11_kmv_set_ops",
      (s, dir) => {
        // KMV sketch SET ALGEBRA (Beyer et al. 2007 §5): pairwise
        // union/intersection CARDINALITY estimates between sources,
        // computed from the per-source K-minimum-value sketches alone.
        // x16 answers "how similar are two sources" (MinHash signature
        // agreement ratio); this answers "how MANY shingles do they
        // share / span" — the overlap matrix a corpus report derives
        // from its sketch store without ever joining raw data. KMV is
        // closed under union: the merged pair sketch is the k smallest
        // of the two sketches' union; with ρ = |values present in BOTH
        // sketches among the merged k minima| / k (the unbiased Jaccard
        // estimator), inter_est = ρ · union_est. A merged distinct
        // count < k proves both sketches were complete vocabularies, so
        // every number degrades to EXACT by construction (and ρ's
        // denominator becomes the exact union size). Plan at scale: the
        // ONLY corpus-wide work is the (source, h) distinct (map-side
        // partial agg) + the native TopKPerKey heap (≤ k rows per
        // source cross the exchange, no sort); all pair algebra runs on
        // #sources × k sketch rows — |sources|²·k tiny rows at worst,
        // independent of corpus size. Hashing rides the native
        // shingles→minhash_bases codegen chain (the repo-wide mod-P md5
        // contract), so the whole query is hash-exact cross-engine.
        val K = KmvK
        val sk = kmvSketch(s, dir)
        val srcs = sk.select("source").distinct()
        // sketch-level pair enumeration: |sources|² rows, never corpus
        val pairs = srcs.as("x").join(srcs.as("y"),
            col("x.source") < col("y.source"))
          .select(col("x.source").as("src_a"), col("y.source").as("src_b"))
        val aSide = pairs.join(sk.withColumnRenamed("source", "src_a"), Seq("src_a"))
          .select(col("src_a"), col("src_b"), col("h"),
            lit(1).as("in_a"), lit(0).as("in_b"))
        val bSide = pairs.join(sk.withColumnRenamed("source", "src_b"), Seq("src_b"))
          .select(col("src_a"), col("src_b"), col("h"),
            lit(0).as("in_a"), lit(1).as("in_b"))
        // distinct h per pair with membership flags (a shared shingle
        // hash arrives from both sides and must count once)
        val merged = aSide.unionByName(bSide)
          .groupBy("src_a", "src_b", "h")
          .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
        val ranked = merged.withColumn("rn", row_number().over(
            Window.partitionBy("src_a", "src_b").orderBy("h")))
          .filter(col("rn") <= K)
        ranked.groupBy("src_a", "src_b")
          .agg(count(lit(1)).as("n_merged"), max("h").as("hmax"),
            sum(when(col("in_a") === 1 && col("in_b") === 1, 1L)
              .otherwise(0L)).as("n_common"))
          .withColumn("union_est",
            when(col("n_merged") < K, col("n_merged").cast("double"))
              .otherwise(roundAt(lit((K - 1) * 1000000007.0) / col("hmax"), 6)))
          .withColumn("inter_est",
            when(col("n_merged") < K, col("n_common").cast("double"))
              .otherwise(roundAt(
                col("n_common").cast("double") / col("n_merged") * col("union_est"), 6)))
          .withColumn("jaccard_est",
            roundAt(col("n_common").cast("double") / col("n_merged"), 6))
          .select("src_a", "src_b", "n_common", "union_est", "inter_est",
            "jaccard_est")
          .orderBy("src_a", "src_b")
      },
      Some(s"""WITH $kmvSketchCtesSql,
              |srcs AS (SELECT DISTINCT source FROM sk),
              |pairs AS (
              |  SELECT x.source AS src_a, y.source AS src_b
              |  FROM srcs x JOIN srcs y ON x.source < y.source),
              |m AS (
              |  SELECT src_a, src_b, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
              |    SELECT p.src_a, p.src_b, s.h, 1 AS in_a, 0 AS in_b
              |    FROM pairs p JOIN sk s ON s.source = p.src_a
              |    UNION ALL
              |    SELECT p.src_a, p.src_b, s.h, 0 AS in_a, 1 AS in_b
              |    FROM pairs p JOIN sk s ON s.source = p.src_b)
              |  GROUP BY 1, 2, 3),
              |r AS (
              |  SELECT * FROM (
              |    SELECT m.*, row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
              |    FROM m) WHERE rn <= $KmvK),
              |agg AS (
              |  SELECT src_a, src_b, count(*) AS n_merged, max(h) AS hmax,
              |    CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n_common
              |  FROM r GROUP BY 1, 2),
              |est AS (
              |  SELECT src_a, src_b, n_common, n_merged,
              |    CASE WHEN n_merged < $KmvK THEN CAST(n_merged AS DOUBLE)
              |         ELSE ${roundAtSql(s"($KmvK - 1) * 1000000007.0 / hmax", 6)}
              |    END AS union_est
              |  FROM agg)
              |SELECT src_a, src_b, n_common, union_est,
              |  CASE WHEN n_merged < $KmvK THEN CAST(n_common AS DOUBLE)
              |       ELSE ${roundAtSql("CAST(n_common AS DOUBLE) / n_merged * union_est", 6)}
              |  END AS inter_est,
              |  ${roundAtSql("CAST(n_common AS DOUBLE) / n_merged", 6)} AS jaccard_est
              |FROM est ORDER BY src_a, src_b""".stripMargin)),
  )

  val queries: Map[String, QFn] = all.map(q => q.name -> q.fn).toMap
  val oracles: Map[String, String] =
    all.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
