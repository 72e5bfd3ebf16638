package graft.etl

import java.nio.file.{Files, Paths}

import scala.util.Random

/** Deterministic synthetic raw-data generator ≙ reference
  * sample_data.py:9–96 — same table shapes, entities, account pools and
  * row counts; seeded Scala RNG (exact numpy stream parity is not
  * required, SURVEY §2.1 S7). Driver-side by design: it writes the tiny
  * raw CSVs the pipeline ingests.
  */
object SampleData {
  private val entities = Seq("TLM", "UPE")
  private val currencies = Seq("USD", "TZS", "EUR")
  private val revenueAccounts = Seq("40000001", "40000002")
  private val expenseAccounts = Seq("61000002", "62000001", "63000001", "64000001")

  private def daysInMonth(month: String): Int = {
    val Array(y, m) = month.split("-").map(_.toInt)
    java.time.YearMonth.of(y, m).lengthOfMonth()
  }

  /** `scale` multiplies per-entity row counts (scale=1 ≙ the reference's
    * generator volume; bench uses larger scales for throughput runs).
    */
  def write(rawDir: String, month: String, seed: Long = 42L, scale: Int = 1): Unit = {
    val rnd = new Random(seed)
    Files.createDirectories(Paths.get(rawDir))
    val nDays = daysInMonth(month)
    def day(): String = f"$month-${1 + rnd.nextInt(nDays)}%02d"

    val sales = Seq("date,entity,invoice_id,account_code,currency,amount,description") ++
      entities.flatMap { e =>
        (0 until 40 * scale).map { i =>
          val amt = 50 + rnd.nextDouble() * 4950
          s"${day()},$e,INV-$e-${f"$i%04d"},${revenueAccounts(rnd.nextInt(revenueAccounts.size))}," +
            s"${currencies(rnd.nextInt(currencies.size))},$amt,Synthetic sale"
        }
      }
    val expenses = Seq("date,entity,bill_id,account_code,currency,amount,description") ++
      entities.flatMap { e =>
        (0 until 40 * scale).map { i =>
          val amt = 20 + rnd.nextDouble() * 2980
          s"${day()},$e,BILL-$e-${f"$i%04d"},${expenseAccounts(rnd.nextInt(expenseAccounts.size))}," +
            s"${currencies(rnd.nextInt(currencies.size))},$amt,Synthetic expense"
        }
      }
    val payroll = Seq("month,entity,employee_id,currency,gross,deductions,net") ++
      entities.flatMap { e =>
        (0 until 15 * scale).map { i =>
          val gross = 800 + rnd.nextDouble() * 4200
          val ded = gross * (0.1 + rnd.nextDouble() * 0.2)
          s"$month,$e,EMP-$e-${f"$i%03d"},TZS,$gross,$ded,${gross - ded}"
        }
      }
    val inventory = Seq("date,entity,sku,movement_type,qty,unit_cost,currency") ++
      entities.flatMap { e =>
        (0 until 30 * scale).map { _ =>
          val mt = Seq("receipt", "issue", "adjustment")(rnd.nextInt(3))
          val qty = 1 + rnd.nextInt(100)
          val cost = 1 + rnd.nextDouble() * 99
          s"${day()},$e,SKU-${f"${rnd.nextInt(20 * scale)}%03d"},$mt,$qty,$cost,TZS"
        }
      }
    val fx = Seq("date,from_currency,to_currency,rate") ++
      (1 to nDays).flatMap { d =>
        val date = f"$month-$d%02d"
        Seq(
          s"$date,USD,USD,1.0",
          s"$date,TZS,USD,${0.00040 + rnd.nextDouble() * 0.00008}",
          s"$date,EUR,USD,${1.05 + rnd.nextDouble() * 0.06}")
      }

    def dump(name: String, lines: Seq[String]): Unit =
      Files.writeString(Paths.get(s"$rawDir/$name"), lines.mkString("\n") + "\n")
    dump("sales.csv", sales)
    dump("expenses.csv", expenses)
    dump("payroll.csv", payroll)
    dump("inventory_movements.csv", inventory)
    dump("fx_rates.csv", fx)
  }

  /** COA contents ≙ /root/reference/data/reference/chart_of_accounts.csv
    * (public reference data shipped with the pipeline).
    */
  def writeChartOfAccounts(referenceDir: String): Unit = {
    Files.createDirectories(Paths.get(referenceDir))
    val coa = Seq(
      "account_code,account_name,account_type",
      "40000001,Sales - Export,Revenue",
      "40000002,Sales - Local,Revenue",
      "50000001,COGS - Inventory,COGS",
      "61000001,Salaries & Wages,Expense",
      "61000002,Payroll Taxes,Expense",
      "62000001,Rent,Expense",
      "63000001,Travel & Subsistence,Expense",
      "64000001,Bank Charges,Expense",
      "10000001,Cash at Bank,Asset",
      "11000001,Accounts Receivable,Asset",
      "20000001,Accounts Payable,Liability",
      "21000001,VAT Payable,Liability")
    Files.writeString(Paths.get(s"$referenceDir/chart_of_accounts.csv"),
      coa.mkString("\n") + "\n")
  }
}
