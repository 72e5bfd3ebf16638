package graft
/** Driver-run benchmark: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR plus the end-to-end ETL close, printing ONE JSON
  * line on stdout. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("graft-bench",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    // warm the session (codegen, shuffle service, FS footers) so the
    // first measured query doesn't absorb ~4s of one-time init
    graft.core.Tables.names.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
      catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      // queries may cache intermediate frames; drop them so later
      // queries aren't measured under accumulated memory pressure
      spark.catalog.clearCache()
      name -> (System.nanoTime() - t0) / 1e9
    } :+ {
      // end-to-end monthly close (scan→validate→gate→fact→kpi→sinks) at
      // 100× the reference generator's volume — the pipeline-throughput
      // headline (the reference's own close is single-threaded pandas)
      val base = java.nio.file.Files.createTempDirectory("bench_etl").toString
      graft.etl.SampleData.write(s"$base/raw", "2025-12", scale = 100)
      graft.etl.SampleData.writeChartOfAccounts(s"$base/ref")
      val t0 = System.nanoTime()
      try graft.etl.Pipeline.runMonth(spark, graft.etl.Settings(), "2025-12",
        s"$base/raw", s"$base/curated", s"$base/ref")
      catch { case _: Throwable => () }
      "etl_close_scale100" -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
