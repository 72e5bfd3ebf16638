package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end monthly close ≙ the reference smoke test
  * (tests/test_pipeline_smoke.py) plus value-level properties the
  * reference never asserts (SURVEY §5).
  */
class PipelineSpec extends SparkSpec {

  private def runClean(): (Pipeline.Outputs, String) = {
    val base = tmpDir("graft_e2e")
    SampleData.write(s"$base/raw", "2025-12")
    SampleData.writeChartOfAccounts(s"$base/reference")
    val out = Pipeline.runMonth(spark, Settings(), "2025-12",
      s"$base/raw", s"$base/curated", s"$base/reference")
    (out, base)
  }

  test("monthly close runs end-to-end with a passing gate and writes all outputs") {
    val (out, _) = runClean()
    Seq(out.dqExceptions, out.dqSummary).foreach(p =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p)), p))
    val summary = spark.read.option("header", "true").csv(out.dqSummary)
    assert(summary.filter(col("status") =!= "PASS").isEmpty)

    val fact = spark.read.parquet(out.fact)
    val kpi = spark.read.parquet(out.kpi)
    assert(fact.count() > 0)
    assert(kpi.columns.contains("operating_profit"))
    assert(kpi.count() > 0)

    // fact row count = sum of month-filtered source rows
    assert(fact.count() == 80 + 80 + 30 + 60)

    // FX identity: base-currency rows keep amount_base = bround(amount, 2)
    val usdBad = fact.filter(col("currency") === "USD" &&
      bround(col("amount"), 2) =!= col("amount_base"))
    assert(usdBad.isEmpty)
    assert(fact.filter(col("currency") === "USD" && col("rate") =!= 1.0).isEmpty)

    // KPI identity: operating = bround(gross + Expense)
    val kpiBad = kpi.filter(
      bround(col("gross_profit") + col("Expense"), 2) =!= col("operating_profit"))
    assert(kpiBad.isEmpty)

    // txn grain: txn_id unique
    assert(fact.groupBy("txn_id").count().filter(col("count") > 1).isEmpty)
  }

  test("missing FX rate fails fast listing the offending pairs") {
    val base = tmpDir("graft_fx")
    SampleData.write(s"$base/raw", "2025-12")
    SampleData.writeChartOfAccounts(s"$base/reference")
    // drop all EUR rates → EUR fact rows cannot normalize
    val fxPath = java.nio.file.Paths.get(s"$base/raw/fx_rates.csv")
    val kept = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(fxPath)).asScala.filterNot(_.contains("EUR"))
    java.nio.file.Files.write(fxPath, scala.jdk.CollectionConverters.SeqHasAsJava(kept).asJava)
    val e = intercept[Transform.MissingFxRatesException] {
      Pipeline.runMonth(spark, Settings(), "2025-12",
        s"$base/raw", s"$base/curated", s"$base/reference")
    }
    assert(e.pairs.nonEmpty)
    assert(e.pairs.forall(_._2 == "EUR"))
  }

  test("gate fails on planted ERROR violations but NEVER mode proceeds") {
    val base = tmpDir("graft_gate")
    SampleData.write(s"$base/raw", "2025-12")
    SampleData.writeChartOfAccounts(s"$base/reference")
    // plant an unparseable date (dtype check → ERROR severity); the row
    // then falls outside the month window, so NEVER mode still completes
    // (a bad *currency* would instead fail FX normalization in any mode,
    // exactly like the reference)
    val salesPath = java.nio.file.Paths.get(s"$base/raw/sales.csv")
    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(salesPath)).asScala
    val patched = lines.head +: lines.tail.zipWithIndex.map {
      case (l, 0) => l.replaceFirst("^[0-9-]+,", "not-a-date,")
      case (l, _) => l
    }
    java.nio.file.Files.write(salesPath,
      scala.jdk.CollectionConverters.SeqHasAsJava(patched).asJava)

    intercept[Pipeline.DqGateFailedException] {
      Pipeline.runMonth(spark, Settings(), "2025-12",
        s"$base/raw", s"$base/curated", s"$base/reference")
    }
    // audit trail was written before the failure
    val ex = spark.read.option("header", "true").csv(s"$base/curated/dq_exceptions.csv")
    assert(ex.filter(col("severity") === "ERROR").count() >= 1)

    // NEVER mode: same data completes
    val out = Pipeline.runMonth(spark, Settings(), "2025-12",
      s"$base/raw", s"$base/curated2", s"$base/reference", failOn = FailOn.Never)
    assert(spark.read.parquet(out.fact).count() > 0)
  }

  test("star + flat BI exports run over the curated layer") {
    val (out, base) = runClean()
    val fact = spark.read.parquet(out.fact)
    val dim = spark.read.parquet(out.dimAccounts)
    val kpi = spark.read.parquet(out.kpi)
    StarSchema.export(spark, fact, dim, kpi, "2025-12", s"$base/star")
    BiExport.export(spark, fact, dim, kpi, out.dqExceptions, out.dqSummary,
      "2025-12", s"$base/bi")
    Seq("dim_date", "dim_month", "dim_entity", "dim_account", "fact_gl", "fact_kpi_monthly")
      .foreach { f =>
        assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/star/$f.csv")), f)
      }
    val factGl = spark.read.option("header", "true").csv(s"$base/star/fact_gl.csv")
    assert(factGl.count() == fact.count())
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/bi/kpi_monthly.csv")))
    assert(BiExport.inferMonth(kpi).contains("2025-12"))
  }
}
