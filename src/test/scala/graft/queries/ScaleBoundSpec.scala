package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Bounds the approximation in z3: `approx_count_distinct` (HLL++, default
  * rsd 5%) must land within 5% of the exact distinct count per group —
  * turning the driver's rows-only check into a quantified error bound.
  */
class ScaleBoundSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("z5: approx_percentile within 1% relative error of the exact quartiles") {
    val rows = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D), 10000)")
          .as("approx"),
        expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").as("exact"))
      .collect()
    assert(rows.nonEmpty)
    val errs = rows.flatMap { r =>
      val flag = r.getString(0)
      val approx = r.getSeq[Double](1)
      val exact = r.getSeq[Double](2)
      approx.zip(exact).map { case (a, e) =>
        val rel = math.abs(a - e) / math.abs(e)
        info(f"$flag: approx=$a%.2f exact=$e%.2f rel_err=$rel%.5f")
        rel
      }
    }
    assert(errs.forall(_ <= 0.01),
      f"approx_percentile error exceeded 1%%: max ${errs.max}%.5f")
  }

  test("z3: approx_count_distinct within 5% of exact per l_returnflag group") {
    val rows = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct("l_partkey").as("approx"),
        countDistinct("l_partkey").as("exact"))
      .collect()
    assert(rows.nonEmpty)
    val errs = rows.map { r =>
      val (flag, approx, exact) = (r.getString(0), r.getLong(1), r.getLong(2))
      val rel = math.abs(approx - exact).toDouble / exact
      info(f"$flag: approx=$approx exact=$exact rel_err=$rel%.4f")
      rel
    }
    assert(errs.forall(_ <= 0.05),
      f"HLL relative error exceeded 5%%: max ${errs.max}%.4f")
  }
}
