package graft.tools

import graft.core.Sessions

/** Dev probe: per-job wall-time attribution of a single SparkEntry
  * query (warm pass first, then the measured pass) — the query-level
  * twin of [[Probe]]'s ETL-close attribution, for finding WHICH stage
  * of a multi-exchange plan carries a fixed-overhead regression.
  * Usage: runMain graft.tools.JobProfile <queryName> [sfDir]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("job-profile",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", graft.core.Sessions.cpus))
    final case class J(id: Int, desc: String, t0: Long, var ms: Long = -1,
        var stages: Int = 0, var tasks: Int = 0)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, J]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = e.stageInfos.sortBy(_.stageId).lastOption
          .map(_.name.takeWhile(_ != '\n')).getOrElse("?")
        jobs.synchronized {
          jobs(e.jobId) = J(e.jobId, desc, e.time, stages = e.stageInfos.size,
            tasks = e.stageInfos.map(_.numTasks).sum)
        }
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(j => j.ms = e.time - j.t0) }
    }
    graft.core.Tables.names.foreach { t =>
      try spark.read.parquet(s"$dir/$t.parquet").limit(1).count()
      catch { case _: Throwable => () }
    }
    val fn = graft.SparkEntry.queries(name)
    fn(spark, dir).count() // warm: codegen, JIT, footers
    spark.catalog.clearCache()
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val rows = fn(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    val js = jobs.synchronized(jobs.values.toSeq)
    println(f"\nQUERY $name wall=$wall%.3f s rows=$rows jobs=${js.size} " +
      s"sum-job-ms=${js.map(_.ms.max(0)).sum} tasks=${js.map(_.tasks).sum}")
    js.sortBy(-_.ms).foreach { j =>
      println(f"  job ${j.id}%3d ${j.ms}%6d ms stages=${j.stages}%2d " +
        f"tasks=${j.tasks}%4d  ${j.desc.take(90)}")
    }
    spark.stop()
  }
}
