package graft.tools

import graft.core.Sessions

/** Dev probe — kept out of the library surface. Currently: job-level
  * attribution of the ETL close (where do the ~111 jobs come from and
  * what does each cost).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", graft.core.Sessions.cpus))
    val scale = args.headOption.map(_.toInt).getOrElse(100)
    val base = graft.core.Scratch.dir(s"probe_etl_$scale")
    graft.etl.SampleData.write(s"$base/raw", "2025-12", scale = scale)
    graft.etl.SampleData.writeChartOfAccounts(s"$base/ref")

    final case class J(id: Int, desc: String, t0: Long, var ms: Long = -1,
        var stages: Int = 0, var tasks: Int = 0)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, J]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        // prefer the thread-local job description (Pipeline's phase
        // labels, guide §1.5) — AQE-future jobs inherit it, so phases
        // attribute cleanly; fall back to the last stage's callsite
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(e.stageInfos.sortBy(_.stageId).lastOption
            .map(_.name.takeWhile(_ != '\n')).getOrElse("?"))
        jobs.synchronized {
          jobs(e.jobId) = J(e.jobId, desc, e.time, stages = e.stageInfos.size,
            tasks = e.stageInfos.map(_.numTasks).sum)
        }
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(j => j.ms = e.time - j.t0) }
    }
    spark.sparkContext.addSparkListener(listener)

    // warm pass (codegen/JIT), then the measured pass
    graft.etl.Pipeline.runMonth(spark, graft.etl.Settings(), "2025-12",
      s"$base/raw", s"$base/curated", s"$base/ref")
    jobs.synchronized(jobs.clear())
    val t0 = System.nanoTime()
    graft.etl.Pipeline.runMonth(spark, graft.etl.Settings(), "2025-12",
      s"$base/raw", s"$base/curated2", s"$base/ref")
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)

    val js = jobs.synchronized(jobs.values.toSeq)
    println(f"\nCLOSE scale=$scale wall=${wall}%.2f s  jobs=${js.size}  " +
      f"sum-job-ms=${js.map(_.ms.max(0)).sum}  tasks=${js.map(_.tasks).sum}")
    val byDesc = js.groupBy(_.desc).toSeq
      .map { case (d, g) => (d, g.size, g.map(_.ms.max(0)).sum, g.map(_.tasks).sum) }
      .sortBy(-_._3)
    println("\nby description (n, total ms, tasks):")
    byDesc.foreach { case (d, n, ms, tk) =>
      println(f"  $ms%6d ms  n=$n%-3d tasks=$tk%-5d $d") }
    println("\nslowest 25 jobs (start = offset from first job, for overlap reading):")
    val base0 = js.map(_.t0).min
    js.sortBy(-_.ms).take(25).foreach(j =>
      println(f"  job ${j.id}%3d start=${j.t0 - base0}%6d ms ${j.ms}%6d ms stages=${j.stages} tasks=${j.tasks}%4d  ${j.desc.take(100)}"))
    spark.stop()
  }
}
