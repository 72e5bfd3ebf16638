package graft
/** Driver-run benchmark: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR plus the end-to-end ETL close at 100× and 1000×
  * the reference generator's volume.
  *
  * Emission contract: ONE JSON line on stdout, printed LAST (after
  * spark.stop(), so no log interleaving), with timings rounded to ms so
  * the line stays well inside the driver's output-tail buffer; the same
  * JSON is also written to BENCH_LOCAL.json in the working directory.
  * Failed queries are recorded as -1 in `queries` AND listed in `errors`
  * — a crashing query must never masquerade as a fast passing one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("graft-bench",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", graft.core.Sessions.cpus))
    // warm the session (codegen, shuffle service, FS footers) so the
    // first measured query doesn't absorb ~4s of one-time init
    graft.core.Tables.names.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
      catch { case _: Throwable => () }
    }
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case _: Throwable => errors += name; false }
      // queries may cache intermediate frames; drop them so later
      // queries aren't measured under accumulated memory pressure
      spark.catalog.clearCache()
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    } ++ Seq(100, 1000).map { scale =>
      // end-to-end monthly close (scan→validate→gate→fact→kpi→sinks) at
      // 100× / 1000× the reference generator's volume — the
      // pipeline-throughput headline (the reference's own close is
      // single-threaded pandas at 1×). Generation is outside the timer.
      val name = s"etl_close_scale$scale"
      val base = java.nio.file.Files.createTempDirectory(s"bench_etl_$scale").toString
      graft.etl.SampleData.write(s"$base/raw", "2025-12", scale = scale)
      graft.etl.SampleData.writeChartOfAccounts(s"$base/ref")
      val t0 = System.nanoTime()
      val ok = try {
        graft.etl.Pipeline.runMonth(spark, graft.etl.Settings(), "2025-12",
          s"$base/raw", s"$base/curated", s"$base/ref")
        true
      } catch { case _: Throwable => errors += name; false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    def ms(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val errJson = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // numeric sf parsed from the dir name (…/sf0.1 → 0.1); falls back to
    // the raw string if the dir is not sf-suffixed
    val sfNum = "sf([0-9.]+)$".r.findFirstMatchIn(sfDir).map(_.group(1))
      .getOrElse("\"" + sfDir + "\"")
    val json = s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"errors":$errJson,"sf":$sfNum}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LOCAL.json"), json + "\n")
    spark.stop()
    // LAST line on stdout, nothing after it
    System.out.println(json)
    System.out.flush()
  }
}
