package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DQ engine behavior ≙ reference quality.py semantics: lazy collection
  * of all violations, severity rules, summary counts, gate modes.
  */
class DqEngineSpec extends SparkSpec {
  import spark.implicits._

  private val settings = Settings()

  private def salesRaw(rows: Seq[(String, String, String, String, String, String, String)]) =
    rows.toDF("date", "entity", "invoice_id", "account_code", "currency", "amount", "description")

  test("clean sales produce zero exceptions") {
    val raw = salesRaw(Seq(
      ("2025-12-01", "TLM", "INV-1", "40000001", "USD", "100.5", "ok"),
      ("2025-12-02", "TLM", "INV-2", "40000001", "EUR", "10", "ok")))
    val ex = Validator.exceptions(spark, raw, Dq.salesSchema(settings))
    assert(ex.isEmpty)
  }

  test("violations are all collected with the right checks and severities") {
    val raw = salesRaw(Seq(
      ("2025-12-01", "TLM", "INV-1", "40000001", "GBP", "100.5", "bad currency"), // isin → ERROR (currency col)
      ("not-a-date", "TLM", "INV-2", "40000001", "USD", "50", "bad date"),        // dtype → ERROR
      ("2025-12-03", "TLM", "INV-3", "40000001", "USD", "-7", "negative"),        // gt(0) → WARN (amount col)
      ("2025-12-04", "TLM", "INV-4", "40000001", "USD", "oops", "bad amount"),    // dtype → ERROR
      ("2025-12-05", "TLM", "INV-5", "40000001", "USD", "5", "dup"),
      ("2025-12-06", "TLM", "INV-5", "40000001", "USD", "6", "dup")))             // dup keys → WARN
    val ex = Dq.addSeverity(
      Validator.exceptions(spark, raw, Dq.salesSchema(settings))).cache()

    val byCheck = ex.groupBy("check").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCheck("isin(USD, TZS, EUR)") == 1)
    assert(byCheck("dtype('date')") == 1)
    assert(byCheck("greater_than(0.0)") == 1)
    assert(byCheck("dtype('double')") == 1)
    assert(byCheck.exists { case (k, v) => k.startsWith("no_duplicates") && v == 1 })

    val sev = ex.select("check", "severity").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sev("isin(USD, TZS, EUR)") == "ERROR")   // currency is a key column
    assert(sev("dtype('date')") == "ERROR")
    assert(sev("greater_than(0.0)") == "WARN")
    assert(sev("dtype('double')") == "ERROR")        // dtype rule
    assert(sev.exists { case (k, v) => k.startsWith("no_duplicates") && v == "WARN" })
  }

  test("payroll identity violation is a single aggregate exception") {
    val raw = Seq(
      ("2025-12", "TLM", "E1", "USD", "1000", "100", "900"),
      ("2025-12", "TLM", "E2", "USD", "1000", "100", "850"))
      .toDF("month", "entity", "employee_id", "currency", "gross", "deductions", "net")
    val ex = Validator.exceptions(spark, raw, Dq.payrollSchema(settings))
    assert(ex.filter(col("check") === "payroll_identity").count() == 1)
  }

  test("fx dataset violations are always ERROR") {
    val raw = Seq(("2025-12-01", "TZS", "USD", "-1"))
      .toDF("date", "from_currency", "to_currency", "rate")
    val ex = Dq.addSeverity(Validator.exceptions(spark, raw, Dq.fxSchema(settings)))
    assert(ex.count() == 1)
    assert(ex.select("severity").head().getString(0) == "ERROR")
  }

  test("strict header enforcement reports unexpected and missing columns") {
    val raw = salesRaw(Seq(("2025-12-01", "TLM", "INV-1", "40000001", "USD", "1", "x")))
    val ex = Validator.exceptions(spark, raw, Dq.salesSchema(settings),
      actualColumns = Some(Seq("date", "entity", "invoice_id", "account_code",
        "currency", "amount", "description", "rogue_extra")))
    val checks = ex.select("check").collect().map(_.getString(0))
    assert(checks.contains("column_in_schema"))
  }

  test("account_in_coa RI check finds unknown codes") {
    val df = salesRaw(Seq(
      ("2025-12-01", "TLM", "INV-1", "40000001", "USD", "1", "ok"),
      ("2025-12-02", "TLM", "INV-2", "99999999", "USD", "1", "bad")))
    val coa = Seq("40000001").toDF("account_code")
    val ex = Validator.accountInCoa(df, "sales", coa, Seq("entity", "invoice_id"))
    val rows = ex.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("failure_case") == "99999999")
    assert(Dq.addSeverity(ex).head().getAs[String]("severity") == "ERROR")
  }

  test("accountInCoaIndexed over the coerced frame equals accountInCoa (r17 RI index reuse)") {
    // the pipeline shape: RI rides the coerce-time __idx (natural keys
    // lead indexOrder, so the ranks coincide) instead of re-deriving a
    // global index — this pins the outputs identical, duplicate natural
    // keys included (both bad rows share a key; both must report)
    val df = salesRaw(Seq(
      ("2025-12-01", "TLM", "INV-1", "40000001", "USD", "1", "ok"),
      ("2025-12-02", "TLM", "INV-2", "99999999", "USD", "1", "bad"),
      ("2025-12-03", "ARK", "INV-9", "55555555", "USD", "2", "bad2")))
    val coa = Seq("40000001").toDF("account_code")
    val viaOwnIndex = Validator
      .accountInCoa(df, "sales", coa, Seq("entity", "invoice_id"))
      .orderBy("index").collect().toSeq
    val viaCoerceIndex = Validator
      .accountInCoaIndexed(Validator.coerce(df, Dq.salesSchema(settings)),
        "sales", coa)
      .orderBy("index").collect().toSeq
    assert(viaCoerceIndex == viaOwnIndex)
    assert(viaCoerceIndex.length == 2)
  }

  test("summary has the five-dataset backbone with zero-fill and gate status") {
    val ex = Dq.addSeverity(
      Seq(("sales", 0L, "amount", "greater_than(0.0)", "-1", "Column", null: Integer))
        .toDF("dataset", "index", "column", "check", "failure_case", "schema_context", "check_number")
        .withColumn("check_number", col("check_number").cast("int")))
    val sum = Dq.summaryTable(spark, ex, FailOn.Error).collect()
    assert(sum.map(_.getString(0)).toSeq ==
      Seq("sales", "expenses", "payroll", "inventory_movements", "fx_rates"))
    val sales = sum.head
    assert(sales.getAs[Long]("warn_count") == 1)
    assert(sales.getAs[Long]("error_count") == 0)
    assert(sales.getAs[String]("status") == "PASS") // ERROR mode ignores warns
    assert(Dq.overallStatus(ex, FailOn.Error) == "PASS")
    assert(Dq.overallStatus(ex, FailOn.Warn) == "FAIL")
    assert(Dq.overallStatus(ex, FailOn.Never) == "PASS")
  }
}
