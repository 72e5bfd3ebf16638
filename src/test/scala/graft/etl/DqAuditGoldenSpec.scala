package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DQ audit-trail parity (VERDICT r1 gap #2):
  *
  *  1. clean inputs → `dq_summary.csv` and `dq_exceptions.csv` byte-equal
  *     to the committed reference goldens (/root/reference/data/bi/2025-12,
  *     shapes from pipeline.py:149–160 / quality.py:205–249);
  *  2. a hand-crafted dirty fixture exercising EVERY severity rule
  *     (quality.py:150–181) — key-column ERROR, fx-dataset ERROR,
  *     dtype ERROR, account_in_coa ERROR, and WARN for non-critical
  *     violations — with hand-computed expected rows, including the
  *     documented `index` remapping (rank in natural-key order,
  *     SURVEY §7.4.2) in place of pandas file positions.
  */
class DqAuditGoldenSpec extends SparkSpec {
  private val goldenBi = "/root/reference/data/bi/2025-12"

  private def bytes(p: String): String =
    java.nio.file.Files.readString(java.nio.file.Paths.get(p))

  test("clean close writes dq_summary.csv and dq_exceptions.csv byte-equal to the goldens") {
    val base = tmpDir("dq_golden_clean")
    SampleData.write(s"$base/raw", "2025-12")
    SampleData.writeChartOfAccounts(s"$base/ref")
    Pipeline.runMonth(spark, Settings(), "2025-12", s"$base/raw", s"$base/curated", s"$base/ref")
    assert(bytes(s"$base/curated/dq_summary.csv") == bytes(s"$goldenBi/dq_summary.csv"))
    assert(bytes(s"$base/curated/dq_exceptions.csv") == bytes(s"$goldenBi/dq_exceptions.csv"))
  }

  private def writeDirtyFixture(raw: String, gbpRate: Boolean = false): Unit = {
    val dir = java.nio.file.Paths.get(raw)
    java.nio.file.Files.createDirectories(dir)
    def put(name: String, lines: String*): Unit =
      java.nio.file.Files.writeString(dir.resolve(name), lines.mkString("", "\n", "\n"))
    // natural-key order (entity, invoice_id) puts the null-entity row at
    // index 0 (nulls first), then INV-001..INV-005; the dup INV-005 pair
    // tiebreaks on date
    put("sales.csv",
      "date,entity,invoice_id,account_code,currency,amount,description",
      "2025-12-01,TLM,INV-001,40000001,USD,100.50,clean",
      "2025-12-02,TLM,INV-002,40000001,GBP,50,bad currency",
      "2025-12-03,TLM,INV-003,40000001,USD,-5,non-positive amount",
      "2025-12-04,TLM,INV-004,99999999,USD,10,unknown account",
      "2025-12-05,TLM,INV-005,40000001,USD,5,dup a",
      "2025-12-07,TLM,INV-005,40000001,USD,6,dup b",
      "2025-12-06,,INV-006,40000001,USD,7,null entity")
    put("expenses.csv",
      "date,entity,bill_id,account_code,currency,amount,description",
      "not-a-date,UPE,BILL-001,62000001,USD,5,unparseable date",
      "2025-12-01,UPE,BILL-002,62000001,USD,8,clean")
    put("payroll.csv",
      "month,entity,employee_id,currency,gross,deductions,net",
      "2025-12,TLM,E-001,USD,1000,100,850", // identity off by 50
      "2025-12,TLM,E-002,USD,1000,100,900")
    put("inventory_movements.csv",
      "date,entity,sku,movement_type,qty,unit_cost,currency",
      "2025-12-01,TLM,SKU-1,transfer,5,2.5,USD",
      "2025-12-02,TLM,SKU-2,issue,0,2.5,USD",
      "2025-12-03,TLM,SKU-3,receipt,3,1.0,USD")
    put("fx_rates.csv",
      Seq("date,from_currency,to_currency,rate",
        "2025-12-01,EUR,USD,-0.5",
        "2025-12-02,TZS,USD,0.0004",
        "2025-12-02,TZS,USD,0.0004") ++
        // fail_on=NEVER lets the GBP sales row reach the FX join, which
        // fail-fasts on a missing rate (transform.py:40–42) — give NEVER
        // runs a rate (itself an isin ERROR, GBP not allowed; harmless to
        // the all-PASS-status assertion)
        (if (gbpRate) Seq("2025-12-02,GBP,USD,1.27") else Nil): _*)
  }

  test("dirty fixture: every severity rule fires; exceptions and summary rows match hand-computed expectations") {
    val base = tmpDir("dq_golden_dirty")
    writeDirtyFixture(s"$base/raw")
    SampleData.writeChartOfAccounts(s"$base/ref")

    // ERROR mode: audit files are written BEFORE the gate throws
    // (pipeline.py:141–147 ordering), so the trail survives the failure
    val thrown = intercept[Pipeline.DqGateFailedException] {
      Pipeline.runMonth(spark, Settings(), "2025-12", s"$base/raw", s"$base/curated", s"$base/ref")
    }
    assert(thrown.getMessage.contains("dq_exceptions.csv"))

    val ex = spark.read.option("header", "true")
      .csv(s"$base/curated/dq_exceptions.csv")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)).orNull, Option(r.getString(2)).orNull,
        r.getString(3), Option(r.getString(4)).orNull, r.getString(5), r.getString(7)))
      .toSet

    // (dataset, index, column, check, failure_case, schema_context, severity)
    val expected = Set(
      ("sales", "4", "account_code", "account_in_coa", "99999999", "Column", "ERROR"),
      ("sales", "3", "amount", "greater_than(0.0)", "-5.0", "Column", "WARN"),
      ("sales", "2", "currency", "isin(USD, TZS, EUR)", "GBP", "Column", "ERROR"),
      ("sales", null, null, "no_duplicates(entity, invoice_id)", "TLM|INV-005", "DataFrameSchema", "WARN"),
      ("sales", "0", "entity", "not_nullable", null, "Column", "WARN"),
      ("expenses", "0", "date", "dtype('date')", "not-a-date", "Column", "ERROR"),
      ("payroll", null, null, "payroll_identity", "50.0", "DataFrameSchema", "WARN"),
      ("inventory_movements", "0", "movement_type", "isin(receipt, issue, adjustment)", "transfer", "Column", "WARN"),
      ("inventory_movements", "1", "qty", "not_equal_to(0.0)", "0.0", "Column", "WARN"),
      ("fx_rates", "0", "rate", "greater_than(0.0)", "-0.5", "Column", "ERROR"),
      ("fx_rates", null, null, "no_duplicates(date, from_currency, to_currency)",
        "2025-12-02|TZS|USD", "DataFrameSchema", "ERROR"))
    assert(ex == expected,
      s"missing: ${(expected -- ex).mkString("; ")}\nunexpected: ${(ex -- expected).mkString("; ")}")

    // per-dataset summary in ERROR mode: FAIL iff error_count > 0
    val sum = spark.read.option("header", "true")
      .csv(s"$base/curated/dq_summary.csv")
      .collect().map(r => r.toSeq.map(_.asInstanceOf[String]))
    assert(sum.toSeq == Seq(
      Seq("sales", "2", "3", "5", "FAIL"),
      Seq("expenses", "1", "0", "1", "FAIL"),
      Seq("payroll", "0", "1", "1", "PASS"),
      Seq("inventory_movements", "0", "2", "2", "PASS"),
      Seq("fx_rates", "2", "0", "2", "FAIL")))
  }

  test("dirty fixture under fail_on=NEVER completes with all-PASS statuses") {
    val base = tmpDir("dq_golden_never")
    writeDirtyFixture(s"$base/raw", gbpRate = true)
    SampleData.writeChartOfAccounts(s"$base/ref")
    Pipeline.runMonth(spark, Settings(), "2025-12", s"$base/raw", s"$base/curated", s"$base/ref",
      failOn = FailOn.Never)
    val sum = spark.read.option("header", "true").csv(s"$base/curated/dq_summary.csv")
    assert(sum.filter(col("status") =!= "PASS").isEmpty) // quality.py:240–241
    // the close still produced the curated outputs from the usable rows
    assert(spark.read.parquet(s"$base/curated/fact_transactions.parquet").count() > 0)
  }
}
