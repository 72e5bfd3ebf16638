package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The native top-k-per-key operator must return EXACTLY the rows of
  * the window-rank formulation (the oracle-checked w4 shape) — on real
  * data, on ties, on keys with fewer than k rows — and its physical
  * plan must show the partial/final pair with no Sort anywhere.
  */
class TopKSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("native top-k equals the window-rank formulation on lineitem") {
    val li = Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    val order = Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    val native = TopK.perKey(li, Seq("l_returnflag"), order, k = 5)
    val w = Window.partitionBy("l_returnflag").orderBy(order: _*)
    val windowed = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
    assert(canon(native) == canon(windowed))
    assert(native.count() == 15) // 3 flags × 5
  }

  test("keys with fewer than k rows return all their rows") {
    import spark.implicits._
    val tiny = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    val got = TopK.perKey(tiny, Seq("k"), Seq($"v".desc), k = 5)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got == Set(("a", 1), ("a", 2), ("b", 3)))
  }

  test("the plan is partial heap -> exchange -> final heap, with no Sort") {
    val li = Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_orderkey", "l_extendedprice")
    val native = TopK.perKey(li, Seq("l_returnflag"),
      Seq(col("l_extendedprice").desc, col("l_orderkey")), k = 5)
    native.collect()
    val plan = native.queryExecution.executedPlan.toString
    // the exec node prints without its Exec suffix; the final plan
    // section shows the partial (", true") and final (", false") pair
    val finalSection = plan.split("== Initial Plan ==").head
    assert("TopKPerKey \\[".r.findAllIn(finalSection).size == 2, plan)
    assert(finalSection.contains(", 5, true") && finalSection.contains(", 5, false"), plan)
    assert(plan.contains("Exchange hashpartitioning(l_returnflag"), plan)
    assert(!plan.contains("Sort "), plan)
    // and the window formulation it replaces DOES sort
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"))
    val windowed = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
    windowed.collect()
    assert(windowed.queryExecution.executedPlan.toString.contains("Sort "))
  }

  test("null order values and null keys follow SortOrder null ordering") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), Some(3)), (Some("a"), None), (Some("a"), Some(1)),
      (None: Option[String], Some(9)), (None: Option[String], Some(2)))
      .toDF("k", "v")
    // v desc → NULLS LAST: the null-v row must lose to both numbers
    val topA = TopK.perKey(df, Seq("k"), Seq($"v".desc), k = 2)
      .filter($"k" === "a").collect().map(_.getAs[Any]("v")).toSet
    assert(topA == Set(3, 1), topA)
    // a null KEY is its own group, like GROUP BY treats it
    val topNull = TopK.perKey(df, Seq("k"), Seq($"v".desc), k = 1)
      .filter($"k".isNull).collect().map(_.getAs[Any]("v")).toSet
    assert(topNull == Set(9), topNull)
  }

  test("native vs window timing on the record (sf0.1, best of 2)") {
    // not asserted (multi-tenant box) — the numbers go on the record so
    // SURVEY's claim about WHERE the native operator wins stays honest
    val li01 = Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select("l_partkey", "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    def time(body: => Unit): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
    def windowed(key: String): Unit = {
      val w = Window.partitionBy(key)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      li01.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).count()
    }
    def native(key: String): Unit =
      TopK.perKey(li01, Seq(key),
        Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")), 3).count()
    val lowW = time(windowed("l_returnflag")); val lowN = time(native("l_returnflag"))
    val hiW = time(windowed("l_partkey")); val hiN = time(native("l_partkey"))
    info(f"3 keys:   window sort $lowW%.2fs vs native heaps $lowN%.2fs")
    info(f"20k keys: window sort $hiW%.2fs vs native heaps $hiN%.2fs")
    println(f"TOPK TIMING sf0.1: low-card window=$lowW%.2f native=$lowN%.2f; " +
      f"high-card window=$hiW%.2f native=$hiN%.2f")
  }

  test("map-side partial keeps at most k rows per key per partition") {
    import spark.implicits._
    // 4 input partitions × 1 key × 1000 rows: the exchange must carry
    // at most 4 partitions × k rows, not 4000 — MEASURED from the
    // shuffle's own records-written metric, so a regression that turns
    // the partial phase into a passthrough fails here, not just in a
    // benchmark
    val df = spark.range(4000).repartition(4)
      .select(lit("only").as("k"), $"id".as("v"))
    val native = TopK.perKey(df, Seq("k"), Seq($"v".desc), k = 3)
    val rows = native.collect()
    assert(rows.map(_.getLong(1)).sorted.toSeq == Seq(3997L, 3998L, 3999L))
    // under AQE every query stage (result AND shuffle) is a LEAF
    // wrapper holding its subtree in `.plan` — expand them recursively
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    def expand(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case n => n }.flatMap {
        case a: AdaptiveSparkPlanExec => a +: expand(a.executedPlan)
        case q: QueryStageExec => q +: expand(q.plan)
        case n => Seq(n)
      }
    val shuffleWritten = expand(native.queryExecution.executedPlan).collect {
      case s: ShuffleQueryStageExec =>
        s.shuffle.metrics.collectFirst {
          case (name, m) if name.contains("RecordsWritten") ||
              m.name.exists(_.contains("records written")) => m.value
        }.getOrElse(-1L)
    }
    // two exchanges exist (repartition(4) + the top-k hash exchange);
    // the top-k one carries ≤ 4 partitions × 3 rows. The repartition
    // moves all 4000, so assert on the minimum.
    assert(shuffleWritten.nonEmpty, native.queryExecution.executedPlan.toString)
    assert(shuffleWritten.min <= 12,
      s"partial phase leaked rows across the exchange: $shuffleWritten")
  }
}
