package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Raw→curated end-to-end golden (VERDICT r1 gap #3): hand-written
  * multi-currency raw CSVs through Pipeline.runMonth with HAND-COMPUTED
  * expected fact and KPI values — closing the FX-join gap that
  * GoldenParitySpec skips by starting from the committed fact.
  * Covers transform.py:19–46 (rate lookup, base pinned at 1.0,
  * amount_base = round(amount·rate, 2)) and :49–110 (per-source
  * conformance: expenses negated, payroll at month-end as −net,
  * inventory qty×unit_cost signed by movement), plus the missing-rate
  * fail-fast (:40–42).
  *
  * FX rates are binary-exact (1.25, 0.0004 & friends) so every expected
  * value is a hand-checkable 2-decimal number.
  */
class RawToCuratedGoldenSpec extends SparkSpec {

  private def writeRaw(raw: String, tzsRateRows: Seq[String]): Unit = {
    val dir = java.nio.file.Paths.get(raw)
    java.nio.file.Files.createDirectories(dir)
    def put(name: String, lines: String*): Unit =
      java.nio.file.Files.writeString(dir.resolve(name), lines.mkString("", "\n", "\n"))
    put("sales.csv",
      "date,entity,invoice_id,account_code,currency,amount,description",
      "2025-12-05,TLM,INV-001,40000001,USD,100.50,usd sale",
      "2025-12-06,TLM,INV-002,40000002,EUR,200.00,eur sale",
      "2025-12-07,UPE,INV-003,40000001,TZS,50000,tzs sale")
    put("expenses.csv",
      "date,entity,bill_id,account_code,currency,amount,description",
      "2025-12-08,TLM,BILL-001,62000001,EUR,80.00,eur rent",
      "2025-12-09,UPE,BILL-002,63000001,USD,45.25,usd travel")
    put("payroll.csv",
      "month,entity,employee_id,currency,gross,deductions,net",
      "2025-12,TLM,E-001,USD,1000,100,900",
      "2025-12,UPE,E-002,EUR,500,50,450")
    put("inventory_movements.csv",
      "date,entity,sku,movement_type,qty,unit_cost,currency",
      "2025-12-10,TLM,SKU-1,receipt,3,2.50,USD",
      "2025-12-11,TLM,SKU-2,issue,4,1.25,USD",
      "2025-12-12,UPE,SKU-3,adjustment,2000,3.00,TZS")
    put("fx_rates.csv",
      (Seq("date,from_currency,to_currency,rate",
        "2025-12-06,EUR,USD,1.25",
        "2025-12-08,EUR,USD,1.25",
        "2025-12-31,EUR,USD,1.25") ++ tzsRateRows): _*)
  }

  private val tzsRates = Seq(
    "2025-12-07,TZS,USD,0.0004",
    "2025-12-12,TZS,USD,0.0004")

  test("multi-currency close produces the hand-computed fact and kpi") {
    val base = tmpDir("raw_golden")
    writeRaw(s"$base/raw", tzsRates)
    SampleData.writeChartOfAccounts(s"$base/ref")
    val out = Pipeline.runMonth(spark, Settings(), "2025-12",
      s"$base/raw", s"$base/curated", s"$base/ref")

    val fact = spark.read.parquet(out.fact)
      .orderBy("date", "entity", "source", "document_id")
      .collect()
      .map(r => (r.getAs[String]("txn_id"), r.getAs[java.sql.Date]("date").toString,
        r.getAs[String]("account_code"), r.getAs[String]("currency"),
        r.getAs[Double]("amount"), r.getAs[Double]("rate"), r.getAs[Double]("amount_base")))
      .toSeq

    // (txn_id, date, account, currency, amount, rate, amount_base) —
    // every number computed by hand from the fixture
    val expected = Seq(
      ("TLM|sales|INV-001",            "2025-12-05", "40000001", "USD",    100.50, 1.0,    100.50),
      ("TLM|sales|INV-002",            "2025-12-06", "40000002", "EUR",    200.00, 1.25,   250.00),
      ("UPE|sales|INV-003",            "2025-12-07", "40000001", "TZS",  50000.00, 0.0004,  20.00),
      ("TLM|expenses|BILL-001",        "2025-12-08", "62000001", "EUR",    -80.00, 1.25,  -100.00),
      ("UPE|expenses|BILL-002",        "2025-12-09", "63000001", "USD",    -45.25, 1.0,    -45.25),
      ("TLM|inventory|SKU-1_2025-12-10", "2025-12-10", "10000001", "USD",    7.50, 1.0,      7.50),
      ("TLM|inventory|SKU-2_2025-12-11", "2025-12-11", "50000001", "USD",   -5.00, 1.0,     -5.00),
      ("UPE|inventory|SKU-3_2025-12-12", "2025-12-12", "10000001", "TZS",  6000.00, 0.0004,   2.40),
      ("TLM|payroll|E-001_2025-12",    "2025-12-31", "61000001", "USD",   -900.00, 1.0,   -900.00),
      ("UPE|payroll|E-002_2025-12",    "2025-12-31", "61000001", "EUR",   -450.00, 1.25,  -562.50))
    assert(fact == expected,
      s"fact mismatch:\n got: ${fact.mkString("\n      ")}\nwant: ${expected.mkString("\n      ")}")

    val kpi = spark.read.parquet(out.kpi).orderBy("entity").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Double]("Asset"),
        r.getAs[Double]("COGS"), r.getAs[Double]("Expense"), r.getAs[Double]("Revenue"),
        r.getAs[Double]("gross_profit"), r.getAs[Double]("operating_profit"))).toSeq
    // TLM: Rev 100.50+250.00, COGS −5.00, Exp −100.00−900.00, Asset 7.50
    // UPE: Rev 20.00, COGS 0 (unobserved for UPE, zero-filled), Exp
    //      −45.25−562.50, Asset 2.40
    val expectedKpi = Seq(
      ("TLM", "2025-12", 7.50, -5.00, -1000.00, 350.50, 345.50, -654.50),
      ("UPE", "2025-12", 2.40,  0.00,  -607.75,  20.00,  20.00, -587.75))
    assert(kpi == expectedKpi, s"kpi mismatch:\n got $kpi\nwant $expectedKpi")

    // observed-columns-only contract: no Liability column (COA has the
    // type; the fixture never hits it)
    assert(!spark.read.parquet(out.kpi).columns.contains("Liability"))
  }

  test("missing FX rate fail-fasts listing the exact (date, currency) pairs") {
    val base = tmpDir("raw_golden_missing_fx")
    writeRaw(s"$base/raw", tzsRates.tail) // drop the 2025-12-07 TZS rate
    SampleData.writeChartOfAccounts(s"$base/ref")
    val e = intercept[Transform.MissingFxRatesException] {
      Pipeline.runMonth(spark, Settings(), "2025-12",
        s"$base/raw", s"$base/curated", s"$base/ref")
    }
    assert(e.pairs == Seq(("2025-12-07", "TZS")), s"got ${e.pairs}")
  }
}
