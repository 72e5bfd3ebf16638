package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpec

/** Chart-DATA parity against the reference's committed dashboard
  * (/root/reference/reports/2025-12/dashboard.html, built by
  * build_dashboard.py:98–174): decode the Plotly trace payloads (names,
  * x, y — float series are base64 little-endian f8 "bdata") and the
  * rendered KPI / DQ tables, and assert OUR Dashboard queries produce the
  * same values from the committed curated inputs. MultimodalSpec checks
  * our HTML's structure; this spec pins the numbers a BI user would see.
  */
class DashboardParitySpec extends SparkSpec {
  private val goldenBi = "/root/reference/data/bi/2025-12"
  private val goldenHtml = java.nio.file.Files.readString(
    java.nio.file.Paths.get("/root/reference/reports/2025-12/dashboard.html"))

  private lazy val factSchema = StructType(Schemas.factTransactions.fields :+
    StructField("month", StringType, nullable = true))
  private lazy val fact = spark.read.option("header", "true")
    .schema(factSchema).csv(s"$goldenBi/fact_transactions.csv").drop("month").cache()
  private lazy val dimAccounts = spark.read.option("header", "true")
    .schema(Schemas.chartOfAccounts).csv(s"$goldenBi/dim_accounts.csv").cache()
  private lazy val kpi = Transform.kpiMonthly(fact, dimAccounts).cache()

  // ---- golden-HTML extraction ----------------------------------------

  private def decodeF8(b64: String): Seq[Double] = {
    val bytes = java.util.Base64.getDecoder.decode(b64)
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until bytes.length / 8).map(_ => buf.getDouble)
  }

  /** a Plotly axis payload: plain JSON array OR {dtype:"f8", bdata:…}. */
  private def axis(v: JValue): Either[Seq[String], Seq[Double]] = v match {
    case JArray(xs) if xs.forall(_.isInstanceOf[JString]) =>
      Left(xs.collect { case JString(s) => s })
    case JArray(xs) =>
      Right(xs.collect { case JDouble(d) => d; case JInt(i) => i.toDouble })
    case o: JObject =>
      Right(decodeF8((o \ "bdata").asInstanceOf[JString].s))
    case other => fail(s"unexpected axis payload: $other")
  }

  private case class Trace(name: String, x: Either[Seq[String], Seq[Double]],
                           y: Either[Seq[String], Seq[Double]])

  /** the three Plotly data arrays, in document order: revenue trend,
    * operating-profit trend, expense bars.
    */
  private lazy val charts: Seq[Seq[Trace]] = {
    val re = """(?s)Plotly\.newPlot\(\s*"[^"]+",\s*(\[.*?\]),\s*\{""".r
    re.findAllMatchIn(goldenHtml).map { m =>
      JsonMethods.parse(m.group(1)).asInstanceOf[JArray].arr.map { t =>
        val name = t \ "name" match { case JString(s) => s; case _ => "" }
        Trace(name, axis(t \ "x"), axis(t \ "y"))
      }
    }.toSeq
  }

  /** rows of the first <table> after the given <h2> heading. */
  private def goldenTable(heading: String): Seq[Seq[String]] = {
    val start = goldenHtml.indexOf(s"<h2>$heading</h2>")
    assert(start >= 0, s"heading '$heading' not in golden dashboard")
    val section = goldenHtml.substring(start)
    val table = section.substring(0, section.indexOf("</table>"))
    """<tr[^>]*>((?s).*?)</tr>""".r.findAllMatchIn(table).map { row =>
      """<t[dh][^>]*>((?s).*?)</t[dh]>""".r.findAllMatchIn(row.group(1))
        .map(_.group(1).trim.replace("&amp;", "&")).toSeq
    }.toSeq.filter(_.nonEmpty)
  }

  private def usFmt(v: Double): String =
    String.format(java.util.Locale.US, "%,.2f", Double.box(v))

  // ---- the assertions -------------------------------------------------

  test("golden dashboard has the three expected charts") {
    assert(charts.size == 3, s"found ${charts.size} Plotly charts")
  }

  test("revenue-trend chart: top entities and series match our Dashboard queries") {
    val trend = charts.head
    val ourTop = Dashboard.topEntitiesByRevenue(kpi).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toSeq
    // the golden chart carries one trace per top entity (build_dashboard
    // .py:100 head(8)); trace order is dataframe order, ours is
    // revenue-desc — compare as sets + per-entity series
    assert(trend.map(_.name).toSet == ourTop.map(_._1).toSet,
      s"top entities: golden ${trend.map(_.name)}, ours ${ourTop.map(_._1)}")
    trend.foreach { t =>
      val months = t.x.swap.getOrElse(fail(s"trace ${t.name}: non-string months"))
      val revs = t.y.getOrElse(fail(s"trace ${t.name}: non-numeric revenue"))
      val ours = Dashboard.kpiTrend(kpi, Seq(t.name)).collect()
        .map(r => (r.getString(1), r.getDouble(2)))
      assert(ours.map(_._1).toSeq == months, s"months for ${t.name}")
      ours.map(_._2).zip(revs).foreach { case (a, e) =>
        assert(math.abs(a - e) <= 1e-6 * math.max(1.0, math.abs(e)),
          s"Revenue for ${t.name}: got $a want $e")
      }
    }
  }

  test("operating-profit trend chart matches") {
    val trend = charts(1)
    trend.foreach { t =>
      val ops = t.y.getOrElse(fail(s"trace ${t.name}: non-numeric op-profit"))
      val ours = Dashboard.kpiTrend(kpi, Seq(t.name)).collect()
        .map(_.getDouble(4))
      assert(ours.length == ops.length, s"row count for ${t.name}")
      ours.zip(ops).foreach { case (a, e) =>
        assert(math.abs(a - e) <= 1e-6 * math.max(1.0, math.abs(e)),
          s"operating_profit for ${t.name}: got $a want $e")
      }
    }
  }

  test("expense bar chart: labels, order, and values match topExpenseAccounts") {
    val bars = charts(2).head
    val labels = bars.y.swap.getOrElse(fail("expense labels not strings"))
    val values = bars.x.getOrElse(fail("expense values not numeric"))
    val ours = Dashboard.topExpenseAccounts(fact, dimAccounts).collect()
      .map(r => (s"${r.getString(0)} - ${r.getString(1)}", r.getDouble(2)))
    assert(ours.map(_._1).toSeq == labels,
      s"expense labels/order: ours ${ours.map(_._1).mkString("; ")} vs golden ${labels.mkString("; ")}")
    // golden stores the unrounded Σ|amount|; ours brounds to cents
    ours.map(_._2).zip(values).foreach { case (a, e) =>
      assert(math.abs(a - e) <= 0.006, s"expense value: got $a want $e")
    }
  }

  test("KPI month table matches cell-for-cell (pandas , .2f formatting)") {
    val rows = goldenTable("KPIs (Selected Month)")
    val header = rows.head
    val ours = BiExport.kpiForMonth(kpi, "2025-12")
    assert(ours.columns.toSeq == header, s"kpi table columns: ${ours.columns.toSeq} vs $header")
    val got = ours.collect().map(_.toSeq.map {
      case s: String => s
      case d: java.lang.Double => usFmt(d)
      case other => other.toString
    })
    assert(got.length == rows.tail.length)
    got.zip(rows.tail).foreach { case (g, w) =>
      assert(g == w, s"kpi table row: got $g want $w")
    }
  }

  test("DQ summary table in the dashboard equals the committed dq_summary.csv") {
    val rows = goldenTable("Data Quality Summary")
    val csv = scala.io.Source.fromFile(s"$goldenBi/dq_summary.csv").getLines()
      .map(_.split(",", -1).toSeq).toSeq
    assert(rows == csv, s"dq summary: html $rows vs csv $csv")
  }
}
