package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ETL degenerate populations (r14, r13 verdict item 6): the raw-table
  * corner cases a long-running close inevitably meets — an empty FX
  * table, a month with zero transactions, a feed whose every account
  * code is unknown to the chart of accounts. These live OUTSIDE the
  * degencheck cross-engine gate (the oracled dump covers the sf-table
  * surface; the ETL pipeline runs on reference-shaped raw CSVs), so
  * their contracts are pinned here instead — referenced from
  * tools/degencheck.py's docstring.
  */
class EtlDegenerateSpec extends SparkSpec {

  private val header = Map(
    "sales.csv" -> "date,entity,invoice_id,account_code,currency,amount,description",
    "expenses.csv" -> "date,entity,bill_id,account_code,currency,amount,description",
    "payroll.csv" -> "month,entity,employee_id,currency,gross,deductions,net",
    "inventory_movements.csv" -> "date,entity,sku,movement_type,qty,unit_cost,currency",
    "fx_rates.csv" -> "date,from_currency,to_currency,rate")

  private def writeRaw(raw: String, rows: Map[String, Seq[String]]): Unit = {
    val dir = java.nio.file.Paths.get(raw)
    java.nio.file.Files.createDirectories(dir)
    header.foreach { case (name, h) =>
      java.nio.file.Files.writeString(dir.resolve(name),
        (h +: rows.getOrElse(name, Seq.empty)).mkString("", "\n", "\n"))
    }
  }

  test("empty FX table: an all-base-currency month closes; any foreign row fail-fasts with its pairs") {
    // base-currency-only rows never consult the FX table, so a month
    // with an empty (header-only) fx_rates.csv must close normally —
    // failing it would block every single-currency deployment
    val okBase = tmpDir("etl_degen_fx_ok")
    writeRaw(s"$okBase/raw", Map(
      "sales.csv" -> Seq("2025-12-05,TLM,INV-001,40000001,USD,100.50,usd sale")))
    SampleData.writeChartOfAccounts(s"$okBase/ref")
    val out = Pipeline.runMonth(spark, Settings(), "2025-12",
      s"$okBase/raw", s"$okBase/curated", s"$okBase/ref")
    val fact = spark.read.parquet(out.fact).collect()
    assert(fact.length == 1 && fact(0).getAs[Double]("rate") == 1.0)

    // ...but the FIRST foreign-currency row against the same empty
    // table must fail loudly with the exact missing pair, not coerce
    // to a null rate
    val bad = tmpDir("etl_degen_fx_bad")
    writeRaw(s"$bad/raw", Map(
      "sales.csv" -> Seq("2025-12-06,TLM,INV-002,40000002,EUR,200.00,eur sale")))
    SampleData.writeChartOfAccounts(s"$bad/ref")
    val e = intercept[Transform.MissingFxRatesException] {
      Pipeline.runMonth(spark, Settings(), "2025-12",
        s"$bad/raw", s"$bad/curated", s"$bad/ref")
    }
    assert(e.pairs == Seq(("2025-12-06", "EUR")), s"got ${e.pairs}")
  }

  test("zero-transaction month: the close completes with an empty fact and an entity-less KPI, not a crash") {
    // a brand-new deployment's first month (or an idle shell entity) has
    // every feed empty; the close must produce well-formed empty outputs
    // — the observed-columns-only pivot with ZERO observed rows is the
    // crash-prone spot this pins
    val base = tmpDir("etl_degen_empty")
    writeRaw(s"$base/raw", Map.empty)
    SampleData.writeChartOfAccounts(s"$base/ref")
    val out = Pipeline.runMonth(spark, Settings(), "2025-12",
      s"$base/raw", s"$base/curated", s"$base/ref")
    assert(spark.read.parquet(out.fact).count() == 0, "fact must be empty")
    assert(spark.read.parquet(out.kpi).count() == 0, "kpi must be empty")
    // the DQ summary still carries the five-dataset backbone (zero-fill
    // contract) so the audit trail shows the feeds were SEEN empty, not
    // skipped
    val summary = spark.read.option("header", "true").csv(out.dqSummary)
    assert(summary.select("dataset").distinct().count() == 5,
      "dq summary lost the five-dataset backbone on an empty month")
  }

  test("all-unknown account codes: every row excepted by the RI check and the ERROR gate blocks the close") {
    val base = tmpDir("etl_degen_coa")
    writeRaw(s"$base/raw", Map(
      "sales.csv" -> Seq(
        "2025-12-05,TLM,INV-001,99999991,USD,100.50,unknown acct",
        "2025-12-06,TLM,INV-002,99999992,USD,200.00,unknown acct"),
      "expenses.csv" -> Seq(
        "2025-12-08,TLM,BILL-001,99999993,USD,80.00,unknown acct")))
    SampleData.writeChartOfAccounts(s"$base/ref")
    val e = intercept[Pipeline.DqGateFailedException] {
      Pipeline.runMonth(spark, Settings(), "2025-12",
        s"$base/raw", s"$base/curated", s"$base/ref")
    }
    // the audit CSVs are written BEFORE the gate throws, so the
    // operator sees every offending row
    val ex = spark.read.option("header", "true")
      .csv(e.exceptionsPath)
      .filter(col("check") === "account_in_coa")
    assert(ex.count() == 3,
      s"expected 3 account_in_coa exceptions, got ${ex.count()}")
    spark.catalog.clearCache()
  }
}
