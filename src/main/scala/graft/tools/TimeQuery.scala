package graft.tools

import graft.SparkEntry
import graft.core.Sessions

/** Dev tool: time one query N times (first run warm-up discarded).
  * Usage: runMain graft.tools.TimeQuery <query> [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("time-query")
    val fn = SparkEntry.queries(name)
    (0 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name rep=$i rows=$n t=$dt%.2f s${if (i == 0) " (warmup)" else ""}")
    }
    spark.stop()
  }
}
