package graft.tools

import graft.core.Sessions

/** Dev probe — kept out of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("probe", "4")
    val dir = "/root/testdata/sf0.001"
    Seq("x15_ann_pq_adc", "y5_contamination_check").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      println(s"===== $q =====")
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // headline shape only: exchanges + joins + scans
      p.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("Scan") ||
          l.contains("WholeStageCodegen")).take(40).foreach(println)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
