package graft.tools

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev tool: time the end-to-end monthly close at an arbitrary generator
  * scale with JOB-LEVEL attribution — the decomposition that shows where
  * a decade of data growth lands (orchestration constants vs data-term
  * jobs). The bench measures 100×/1000× per round; this measures the
  * next decade (default 10000× ≈ 2.5M raw rows) as a one-off record for
  * BASELINE.md. Usage:
  *
  * {{{ runMain graft.tools.CloseScale [scale] [reps] }}}
  */
object CloseScale {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(10000)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.core.Sessions.local("close-scale",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", graft.core.Sessions.cpus))
    val base = graft.core.Scratch.dir(s"close_scale_$scale")
    val t0 = System.nanoTime()
    graft.etl.SampleData.write(s"$base/raw", "2025-12", scale = scale)
    graft.etl.SampleData.writeChartOfAccounts(s"$base/ref")
    val genSec = (System.nanoTime() - t0) / 1e9

    // job-level attribution: (description, ms) per Spark job, keyed by
    // the action call site Spark stamps on the job
    val jobs = ArrayBuffer.empty[(Int, String, Long)]
    val starts = TrieMap.empty[Int, (Long, String)]
    // AQE launches most jobs from futures whose stage names lose the
    // call site, so attribution keys on the enclosing SQL EXECUTION:
    // every job carries spark.sql.execution.id, and the execution-start
    // event carries the action call site as its description
    val execDesc = TrieMap.empty[String, String]
    val listener = new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execDesc(s.executionId.toString) = s.description
          case _ => ()
        }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = (System.nanoTime(),
          Option(js.properties.getProperty("spark.sql.execution.id")).getOrElse("?"))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (s, d) =>
          jobs.synchronized { jobs += ((je.jobId, d, (System.nanoTime() - s) / 1000000L)) }
        }
    }

    val times = (1 to reps).map { r =>
      val record = r == reps // attribute the warm rep
      if (record) spark.sparkContext.addSparkListener(listener)
      val s0 = System.nanoTime()
      graft.etl.Pipeline.runMonth(spark, graft.etl.Settings(), "2025-12",
        s"$base/raw", s"$base/curated_$r", s"$base/ref")
      val sec = (System.nanoTime() - s0) / 1e9
      if (record) {
        // listener bus is async; DRAIN it (a fixed sleep silently drops
        // late job-end events on a loaded box → undercounted attribution)
        org.apache.spark.sql.graftbridge.ListenerBridge
          .waitUntilEmpty(spark.sparkContext)
        spark.sparkContext.removeSparkListener(listener)
      }
      sec
    }

    val byDesc = jobs.synchronized(jobs.toList)
      .groupBy(j => execDesc.getOrElse(j._2, j._2)).map {
      case (d, js) => (d, js.size, js.map(_._3).sum)
    }.toSeq.sortBy(-_._3)
    val top = byDesc.take(12).map { case (d, n, ms) =>
      s"""{"job":"${d.replace("\"", "'").take(80)}","n":$n,"ms":$ms}"""
    }
    println(s"""{"close_scale":$scale,"gen_sec":${f"$genSec%.1f"},""" +
      s""""reps":[${times.map(t => f"$t%.2f").mkString(",")}],""" +
      s""""n_jobs":${jobs.size},"jobs_ms_total":${jobs.map(_._3).sum},""" +
      s""""top_jobs":[${top.mkString(",")}]}""")
    spark.stop()
  }
}
