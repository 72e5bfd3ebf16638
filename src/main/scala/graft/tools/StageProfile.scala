package graft.tools

import graft.core.Sessions

/** Dev probe: per-STAGE shuffle/spill attribution of a single
  * SparkEntry query — the tool the r14 verdict's open question needs
  * ([[ShuffleProfile]] proves THAT a query spills at a scale;
  * this shows WHICH exchange/sort carries it). One pass, cold cache,
  * `toRdd.count()` semantics (the full-result plan, same rationale as
  * ShuffleProfile). Per completed stage it prints the aggregated task
  * metrics plus the stage's RDD operation scopes (the physical-operator
  * names Spark tags the stage's RDDs with — Exchange / Sort /
  * WholeStageCodegen spans), which is what ties a spill number back to
  * a plan node.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.StageProfile <query>
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("stage-profile",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", Sessions.cpus))
    def mb(l: Long): Double = math.round(l / 1048.576) / 1000.0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        if (m != null) {
          val scopes = si.rddInfos.flatMap(_.scope).map(_.name).distinct
            .mkString("|")
          println(s"""{"stage":${si.stageId},"tasks":${si.numTasks},""" +
            s""""sec":${si.completionTime.flatMap(c =>
              si.submissionTime.map(s => (c - s) / 1000.0)).getOrElse(-1.0)},""" +
            s""""input_mb":${mb(m.inputMetrics.bytesRead)},""" +
            s""""shuffle_write_mb":${mb(m.shuffleWriteMetrics.bytesWritten)},""" +
            s""""shuffle_read_mb":${mb(m.shuffleReadMetrics.totalBytesRead)},""" +
            s""""mem_spill_mb":${mb(m.memoryBytesSpilled)},""" +
            s""""disk_spill_mb":${mb(m.diskBytesSpilled)},""" +
            s""""scopes":"$scopes"}""")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val rows = graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.toRdd.count()
    org.apache.spark.sql.graftbridge.ListenerBridge
      .waitUntilEmpty(spark.sparkContext)
    println(s"""{"stageprofile":"$name","sf_dir":"$dir","rows":$rows,""" +
      s""""sec":${math.round((System.nanoTime() - t0) / 1e7) / 100.0}}""")
    spark.stop()
  }
}
